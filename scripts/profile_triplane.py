"""Old-vs-new grid_sample: triplane decode fwd/fwd+bwd device timings.

Minimal (no Trainer) probe of the corner-stacked single-gather
redesign of ops/sampling.py vs the naive four-tap formulation.
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.fields.triplane import (
    TriplaneConfig, init_triplane, triplane_features,
)
from sings_tpu.ops.timing import device_time

N = 51200
cfg = TriplaneConfig()
params = init_triplane(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
pts = jnp.asarray(rng.rand(N, 3).astype(np.float32) * 1.6 - 0.8)


def t(name, fn, *args):
    ms = device_time(fn, args, k1=1, k2=4, repeats=2) * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)


def old_grid_sample(grid, coords):
    c, h, w = grid.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (h - 1)
    x = x.clip(0.0, w - 1)
    y = y.clip(0.0, h - 1)
    x0 = jnp.floor(x).clip(0, w - 2)
    y0 = jnp.floor(y).clip(0, h - 2)
    tx, ty = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    flat = grid.reshape(c, h * w)
    idx00 = y0i * w + x0i
    g00, g01 = flat[:, idx00], flat[:, idx00 + 1]
    g10, g11 = flat[:, idx00 + w], flat[:, idx00 + w + 1]
    top = g00 * (1 - tx) + g01 * tx
    bot = g10 * (1 - tx) + g11 * tx
    return (top * (1 - ty) + bot * ty).T


def feats_old(p, q):
    import itertools
    outs = []
    qq = (q - cfg.bounds) * (2.0 / (-2.0 * cfg.bounds)) - 1.0
    for planes in p["grids"]:
        interp = 1.0
        for plane, (a, b) in zip(planes,
                                 itertools.combinations(range(3), 2)):
            interp = interp * old_grid_sample(plane, qq[:, (a, b)])
        outs.append(interp)
    return jnp.concatenate(outs, axis=-1)


t("triplane fwd (old)", lambda p: feats_old(p, pts).sum(), params)
t("triplane fwd+bwd (old)",
  jax.grad(lambda p, q: feats_old(p, q).sum(), argnums=(0, 1)), params, pts)
t("triplane fwd (new)",
  lambda p: triplane_features(p, pts, cfg).sum(), params)
t("triplane fwd+bwd (new, unfused)",
  jax.grad(lambda p, q: triplane_features(p, q, cfg, fused=False).sum(),
           argnums=(0, 1)), params, pts)
t("triplane fwd+bwd (new, fused)",
  jax.grad(lambda p, q: triplane_features(p, q, cfg, fused=True).sum(),
           argnums=(0, 1)), params, pts)
