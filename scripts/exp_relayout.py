"""Measure tile<->image relayout: XLA transpose vs Pallas kernel.

Bench scene shape: (1024, 8, 256) <-> (8, 512, 512).
"""
import os

os.makedirs("/root/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.rasterizer.relayout import (
    retile_image, retile_image_xla, untile_image, untile_image_xla)
from sings_tpu.ops.timing import device_time

tile, ntx, nty = 16, 32, 32
npx = tile * tile
rng = np.random.RandomState(0)
tiled = jnp.asarray(rng.randn(nty * ntx, 8, npx).astype(np.float32))
img = jnp.asarray(rng.randn(4, nty * tile, ntx * tile).astype(np.float32))

interp = jax.default_backend() != "tpu"


def untile_k(x):
    return untile_image(x, tile=tile, ntx=ntx, nty=nty, interpret=interp)


def untile_x(x):
    return untile_image_xla(x, tile=tile, ntx=ntx, nty=nty)


def retile_k(x):
    return retile_image(x, tile=tile, ntx=ntx, nty=nty, interpret=interp)


def retile_x(x):
    return retile_image_xla(x, tile=tile, ntx=ntx, nty=nty)


for name, fn, arg in [("untile XLA", untile_x, tiled),
                      ("retile XLA", retile_x, img),
                      ("untile Pallas", untile_k, tiled),
                      ("retile Pallas", retile_k, img)]:
    try:
        ref = (untile_x if "untile" in name else retile_x)(arg)
        np.testing.assert_allclose(np.asarray(jax.jit(fn)(arg)),
                                   np.asarray(ref), rtol=0, atol=0)
        dt = device_time(jax.jit(fn), (arg,), k1=3, k2=30)
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)
    except Exception as e:  # Mosaic lowering limits — report, keep going
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
