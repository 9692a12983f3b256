"""Probe: do the relayout Pallas kernels lower on real TPU?

Captures the actual Mosaic error (api.py's guard cites a lane-split
shape cast) and, if they lower, times them against the XLA transposes.
Run on the chip: python scripts/try_relayout_compile.py
"""
import os

os.makedirs("/root/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.rasterizer.relayout import (
    retile_image, retile_image_xla, untile_image, untile_image_xla)
from sings_tpu.ops.timing import device_time

tile, ntx, nty = 16, 32, 32  # 512x512
t_in = jnp.asarray(
    np.random.RandomState(0).rand(nty * ntx, 8, tile * tile)
    .astype(np.float32))
img = jnp.asarray(
    np.random.RandomState(1).rand(4, nty * tile, ntx * tile)
    .astype(np.float32))

for name, fn, arg in (
        ("untile_pallas", lambda x: untile_image(
            x, tile=tile, ntx=ntx, nty=nty).sum(), t_in),
        ("retile_pallas", lambda x: retile_image(
            x, tile=tile, ntx=ntx, nty=nty).sum(), img),
        ("untile_xla", lambda x: untile_image_xla(
            x, tile=tile, ntx=ntx, nty=nty).sum(), t_in),
        ("retile_xla", lambda x: retile_image_xla(
            x, tile=tile, ntx=ntx, nty=nty).sum(), img),
):
    try:
        ms = device_time(jax.jit(fn), (arg,), k1=2, k2=20) * 1e3
        print(f"{name}: {ms:.3f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:500]}",
              flush=True)
