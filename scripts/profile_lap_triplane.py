"""On-chip A/B: gather vs banded laplacian, generic vs nested triplane
at the recipe shape (128k points). Attribution for the r4 deltas.
"""
import os

os.makedirs("/root/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.fields.triplane import (
    TriplaneConfig, init_triplane, triplane_features,
)
from sings_tpu.losses.regularizers import (
    build_region_laplacian, build_region_laplacian_banded,
)
from sings_tpu.ops.timing import device_time

C = 127744

# ---- laplacian A/B on the latest quality-run mesh topology
import glob
import sys

ckpt = (sys.argv[1] if len(sys.argv) > 1 else
        sorted(glob.glob("work/run_r*/v_release/f_2/ckpt/human_final.npz"))[-1])
print(f"topology from {ckpt}", flush=True)
d = np.load(ckpt, allow_pickle=True)
alive = d["buffers__0"]
labels = np.where(alive > 0.5, d["buffers__4"], -1).astype(np.int64)
edges = d["buffers__8"].astype(np.int64)[d["buffers__9"] > 0.5]
w15 = np.ones(15, np.float32)

lap_g = build_region_laplacian(edges, labels, w15)
lap_b = build_region_laplacian_banded(edges, labels, w15)
print(f"gather D={lap_g.neighbors.shape[1]} "
      f"banded W={lap_b.band.shape[1]}", flush=True)

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(C, 3).astype(np.float32) * 0.01)
y = jnp.asarray(rng.randn(C, 3).astype(np.float32) * 0.01)
ws = jnp.asarray(w15)


def mk(lap):
    def f(x, y):
        o = lap.loss_fused([(x, ws, None),
                            (x, jnp.ones(15), [6, 7]),
                            (y, ws, None)])
        return o[0] + o[1] + o[2]

    return jax.grad(f, argnums=(0, 1))


for tag, lap in (("gather", lap_g), ("banded", lap_b)):
    dt = device_time(mk(lap), (x, y), k1=2, k2=8, repeats=2) * 1e3
    print(f"laplacian {tag}: fwd+bwd {dt:.2f} ms", flush=True)

# ---- triplane A/B
pts = jnp.asarray(rng.uniform(-0.9, 0.9, (C, 3)).astype(np.float32))
for tag, nested in (("generic", False), ("nested", True)):
    cfg = TriplaneConfig(nested=nested)
    params = init_triplane(jax.random.PRNGKey(0), cfg)

    def loss(params, pts, cfg=cfg):
        return jnp.sum(triplane_features(params, pts, cfg) ** 2)

    gfn = jax.grad(loss, argnums=(0, 1))
    dt_f = device_time(
        lambda p, q, cfg=cfg: triplane_features(p, q, cfg),
        (params, pts), k1=2, k2=8, repeats=2) * 1e3
    dt = device_time(gfn, (params, pts), k1=2, k2=8, repeats=2) * 1e3
    print(f"triplane {tag}: fwd {dt_f:.2f} ms, fwd+bwd {dt:.2f} ms",
          flush=True)
