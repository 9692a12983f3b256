"""Training entry point (reference scripts/train_avatar.py).

Usage:
    python -m sings_tpu.cli.train -c configs/human_complex.yaml \
        [dataset.name=f_2 train.num_steps=1000 ...]
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg_file", type=str, default=None)
    parser.add_argument("opts", nargs="*", help="dotlist overrides")
    args = parser.parse_args(argv)

    import jax

    from ._platform import apply_platform_env

    apply_platform_env()
    cache_dir = os.environ.get("SINGS_JAX_CACHE", "/root/jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from ..config.core import load_config, save_config
    from ..config.defaults import DEFAULTS
    from ..train.trainer import Trainer

    cfg = load_config(DEFAULTS, args.cfg_file, args.opts)

    trainer = Trainer(cfg, mode="train")
    save_config(cfg, os.path.join(trainer.logdir, "config_train.yaml"))
    result = trainer.train()
    trainer.visualize("final")
    trainer.save_splat_file()  # reference train_avatar.py:66 save_splat
    if trainer.anim_dataset is not None:
        trainer.animate_chunk(iter_s="final")
    # the reference renders both canonical poses at the end
    # (train_avatar.py:76-77)
    for pose_type in ("a_pose", "da_pose"):
        trainer.render_canonical("final", nframes=cfg.human.canon_nframes,
                                 pose_type=pose_type)
    print("final:", result)
    return result


if __name__ == "__main__":
    main()
