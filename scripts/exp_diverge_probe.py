"""On-TPU instrumented probe of the quality divergence.

Runs the REAL trainer step (no scan) on the human_complex config and
prints every loss term + decoded color statistics every N steps, to
localize which term drives colors dark / scales to the ceiling.
"""
import os

os.makedirs("/root/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import shutil

import numpy as np
import jax.numpy as jnp

from sings_tpu.config.core import load_config
from sings_tpu.config.defaults import DEFAULTS

shutil.rmtree("/tmp/diverge_probe", ignore_errors=True)
cfg = load_config(DEFAULTS, "configs/human_complex.yaml", [
    "dataset.root_dir=/root/repo/work/kits",
    "output_path=/tmp/diverge_probe",
    "human.body_template=smplh",
    "train.num_steps=1",          # we drive steps manually
    "tpu.inner_steps=1",
])
from sings_tpu.train.trainer import Trainer

tr = Trainer(cfg, mode="train")

from sings_tpu.model.avatar import get_gs_attrs
from sings_tpu.ops.sh import sh2rgb

rng = jax.random.PRNGKey(0)


def dc_stats():
    a = get_gs_attrs(tr.params, tr.buffers, tr.avatar_cfg)
    alive = np.asarray(tr.buffers.alive) > 0.5
    rgb = np.asarray(sh2rgb(jnp.asarray(np.asarray(a["shs"])[alive][:, 0])))
    op = float(np.asarray(a["opacity"])[alive].mean())
    sc = float(np.asarray(a["scales"])[alive].mean())
    return rgb.mean(0), op, sc


import random

order = list(tr.kit.train_split)
steps = int(os.environ.get("PROBE_STEPS", "600"))
for t in range(steps):
    frame = order[t % len(order)]
    batch = {
        "rgb": tr.images[frame],
        "mask": tr.masks[frame],
        "idx": jnp.asarray(frame),
        "smpl_scale": jnp.ones(1),
    }
    key, rng = jax.random.split(rng)
    (tr.params, tr.buffers, tr.opt_state, metrics, _render) = tr.train_step(
        tr.params, tr.buffers, tr.opt_state, tr.cache, batch, key,
        jnp.asarray(t), jnp.asarray(tr.active_sh_degree),
        tr.region_lap, tr.region_lap, tr.lap_pos_w, tr.lap_color_w,
    )
    if t % 50 == 0 or t == steps - 1:
        m = {k: float(v) for k, v in metrics.items()
             if np.asarray(v).ndim == 0}
        rgbm, op, sc = dc_stats()
        terms = " ".join(f"{k}={m[k]:.4f}" for k in sorted(m))
        print(f"[{t}] {terms}", flush=True)
        print(f"[{t}] dc_rgb_mean={np.round(rgbm,3)} opac={op:.3f} "
              f"scale={sc:.4f}", flush=True)

