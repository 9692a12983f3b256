"""Ablation profile of the training step on TPU.

Each variant zeroes one loss family; make_train_step drops zero-weight
terms at trace time (a python gate — `0.0 * x` is NOT foldable by XLA
since 0*inf=nan), so the time delta attributes the family's true cost.
~8 min compile per variant through the remote-compile tunnel; results
print as they come. Run AFTER any training process has finished
(single TPU).
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.config.core import load_config
from sings_tpu.config.defaults import DEFAULTS
from sings_tpu.losses.photometric import PhotometricWeights
from sings_tpu.ops.timing import device_time
from sings_tpu.train.trainer import Trainer
from sings_tpu.train.step import StepConfig, make_train_step


def main():
    cfg = load_config(DEFAULTS, "configs/human_complex.yaml", [
        "output_path=/tmp/profile_run", "exp_name=prof",
        "train.init_steps=1", "tpu.auto_fit_synthetic=False",
    ])
    tr = Trainer(cfg)
    frame = tr.kit.train_split[0]
    batch = {
        "rgb": tr.images[frame], "mask": tr.masks[frame],
        "idx": jnp.asarray(frame), "smpl_scale": jnp.ones(1),
    }
    base_w = tr.train_step_body  # noqa: F841 (keep trainer alive)

    def variant(name, **zeroed):
        w0 = tr.cfg  # base weights already in trainer's step cfg
        from sings_tpu.train.step import LossWeights
        from sings_tpu.losses.regularizers import L2NormConfig

        weights = LossWeights(
            photometric=PhotometricWeights(
                l1=0.0 if zeroed.get("photo") else 0.8,
                ssim=0.0 if (zeroed.get("photo") or zeroed.get("ssim"))
                else 0.2,
                lpips=0.0 if (zeroed.get("photo") or zeroed.get("lpips"))
                else 1.0,
                patch_size=128),
            l2=L2NormConfig(),
            mesh_edge=0.0 if zeroed.get("reg") else 1e4,
            gaussian_connect=0.0 if (zeroed.get("reg")
                                     or zeroed.get("knn")) else 5e3,
            lap_position_strength=0.0 if (zeroed.get("reg")
                                          or zeroed.get("lap")) else 1000.0,
            lap_color_strength=0.0 if (zeroed.get("reg")
                                       or zeroed.get("lap")) else 5.0,
            hand_lap_weight=0.0 if (zeroed.get("reg")
                                    or zeroed.get("lap")) else 1e-5,
        )
        sc = StepConfig(weights=weights, opt_geo_from=0, opt_app_from=0,
                        opacity_norm_from=10**9)
        body = make_train_step(
            tr.avatar_cfg, sc, tr.template, tr.camera, tr.tx,
            tr.lpips_params if weights.photometric.lpips > 0 else None,
            tr.raster_kw)

        def fn(rgb):
            b = dict(batch, rgb=rgb)
            p, bu, o, m, _ = body(
                tr.params, tr.buffers, tr.opt_state, tr.cache, b,
                jax.random.PRNGKey(0), jnp.asarray(100),
                jnp.asarray(0), tr.region_lap, tr.region_lap,
                tr.lap_pos_w, tr.lap_color_w)
            return m["loss"], p.xyz

        t = device_time(fn, (batch["rgb"],), k1=1, k2=4, repeats=2)
        print(f"{name}: {t*1e3:.1f} ms/step", flush=True)
        return t

    full = variant("full step")
    variant("no knn-connect", knn=True)
    variant("no regularizers (knn+laps+edge)", reg=True)
    variant("photometric off", photo=True)
    print("done; full =", full)


if __name__ == "__main__":
    main()
