"""Animation throughput: device-only render fps vs end-to-end fps.

VERDICT r1 item 8: split the device render time from host JPEG/tunnel
overhead for the AMASS rollout (reference gs_trainer.py:663-728 logs
only wall time; BASELINE config 4 asks for interactive rate).

Usage: python scripts/profile_anim.py <train_output_dir> [max_frames]
"""
import os
import sys

os.makedirs("/root/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

outdir = sys.argv[1]
max_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 300

# reload the run's config like cli.animate does
from sings_tpu.config.core import load_config
from sings_tpu.config.defaults import DEFAULTS

cfg_path = os.path.join(outdir, "config_train.yaml")
cfg = load_config(DEFAULTS, cfg_path, ["eval=True"])
cfg.logdir = outdir
cfg.logdir_ckpt = os.path.join(outdir, "ckpt")
from sings_tpu.train.trainer import Trainer

tr = Trainer(cfg, mode="anim")
ds = tr.anim_dataset
assert ds is not None, "no anim dataset configured"
print(f"anim: {ds.num_frames} frames, camera {ds.camera.height}x"
      f"{ds.camera.width}", flush=True)

# ---- end-to-end fps (includes tunnel readback + JPEG)
fps_e2e = tr.animate_chunk(chunk_size=16, iter_s="profile",
                           save_video=False, max_frames=max_frames)

# ---- device-only: time the jitted per-chunk render with device_time
from sings_tpu.ops.timing import device_time
from sings_tpu.model.avatar import get_gs_attrs

gs_attrs = get_gs_attrs(tr.params, tr.buffers, tr.avatar_cfg)
chunk = jax.tree.map(jnp.asarray, ds.get_chunk(0, 16))
deg = jnp.asarray(tr.active_sh_degree)


def render(params, buffers, gs_attrs, chunk, deg):
    return tr._anim_render_j(params, buffers, gs_attrs, chunk, deg)


dt = device_time(render, (tr.params, tr.buffers, gs_attrs, chunk, deg),
                 k1=2, k2=10)
fps_dev = 16.0 / max(dt, 1e-9)
print(f"[anim profile] device render: {dt*1e3:.1f} ms/chunk(16) = "
      f"{fps_dev:.1f} fps device-only; {fps_e2e:.1f} fps end-to-end "
      f"(tunnel readback + JPEG encode included)", flush=True)
