"""Animation entry point (reference scripts/anim_avatar.py).

Reloads config_train.yaml from a finished run directory, finds the
latest checkpoint, and renders the configured motion.

Usage:
    python -m sings_tpu.cli.animate -o output/exp/f_2 [--chunk 16]
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output_dir", required=True)
    parser.add_argument("--chunk", type=int, default=16)
    parser.add_argument("opts", nargs="*")
    args = parser.parse_args(argv)

    import jax

    from ._platform import apply_platform_env

    apply_platform_env()
    cache_dir = os.environ.get("SINGS_JAX_CACHE", "/root/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    from ..config.core import load_config
    from ..config.defaults import DEFAULTS
    from ..train.trainer import Trainer

    cfg_path = os.path.join(args.output_dir, "config_train.yaml")
    cfg = load_config(DEFAULTS, cfg_path, list(args.opts) + ["eval=True"])
    cfg.logdir = args.output_dir
    cfg.logdir_ckpt = os.path.join(args.output_dir, "ckpt")

    trainer = Trainer(cfg, mode="anim")
    fps = trainer.animate_chunk(chunk_size=args.chunk, iter_s="anim")
    print(f"animation fps: {fps:.2f}")
    return fps


if __name__ == "__main__":
    main()
