"""A/B the panel composite layout at the driver bench scene.

Times rasterizer fwd and fwd+bwd for layout=tiled vs layout=panel at
exactly bench.py's scene (50k gaussians, 512^2, SH deg 3, max_span=3,
max_pairs=262144). The roofline (docs/PERF.md) attributes ~1.8 ms to
the tile-major<->image XLA relayout and most of the kernels' 40-50%
gap-to-bound to per-tile chunk-0 DMA stalls — the two things the panel
layout removes structurally.

Run: timeout 1800 python scripts/measure_panel.py
"""
import os

os.makedirs("/root/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.graphics import make_camera
from sings_tpu.ops.rasterizer.api import rasterize
from sings_tpu.ops.sh import rgb2sh
from sings_tpu.ops.timing import device_time

n, hw = 50_000, 512
rng = np.random.RandomState(0)
cam = make_camera(np.eye(4), height=hw, width=hw, fovx=0.9, fovy=0.9)
means = jnp.asarray(np.stack([
    rng.uniform(-0.8, 0.8, n), rng.uniform(-0.8, 0.8, n),
    rng.uniform(2.0, 6.0, n)], -1).astype(np.float32))
scales = jnp.asarray(rng.uniform(0.004, 0.02, (n, 3)).astype(np.float32))
quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
opac = jnp.asarray(rng.uniform(0.2, 1.0, n).astype(np.float32))
shs = jnp.zeros((n, 16, 3)).at[:, 0, :].set(
    rgb2sh(jnp.asarray(rng.rand(n, 3).astype(np.float32))))
bg = jnp.zeros(3)


def run(tag, **kw):
    kws = dict(tile=16, chunk=128, max_span=3, max_pairs=262144)
    kws.update(kw)

    def loss(means, scales, opac, shs):
        out = rasterize(means, scales, quats, opac, shs, cam, sh_degree=3,
                        bg=bg, backend="pallas", **kws)
        return jnp.sum(out["render"] ** 2)

    def fwd_only(means, scales, opac, shs):
        return loss(means, scales, opac, shs)

    try:
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
            means, scales, opac, shs)
        assert all(bool(jnp.isfinite(x).all()) for x in g)
        dt_f = device_time(fwd_only, (means, scales, opac, shs),
                           k1=2, k2=18) * 1e3
        dt = device_time(jax.grad(loss, argnums=(0, 1, 2, 3)),
                         (means, scales, opac, shs), k1=2, k2=18) * 1e3
        mpix = hw * hw / dt * 1e3 / 1e6
        print(f"{tag}: fwd {dt_f:.2f} ms, fwd+bwd {dt:.2f} ms "
              f"({mpix:.1f} Mpix/s)", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)


# value check first: panel must match tiled on chip too
img_t = rasterize(means, scales, quats, opac, shs, cam, sh_degree=3, bg=bg,
                  backend="pallas", tile=16, chunk=128, max_span=3,
                  max_pairs=262144)["render"]
img_p = rasterize(means, scales, quats, opac, shs, cam, sh_degree=3, bg=bg,
                  backend="pallas", tile=16, chunk=128, max_span=3,
                  max_pairs=262144, layout="panel")["render"]
err = float(jnp.abs(img_p - img_t).max())
print(f"on-chip panel vs tiled image max abs diff: {err:.2e}", flush=True)

run("tiled")
run("panel", layout="panel")
# narrow glue on top of panel: bench splats span up to 9 tiles, so mw4
# needs a real tail; N//4 rows cover well past the span>4 population
run("panel mw4", layout="panel", main_width=4,
    tail_capacity=-(-n // 4 // 128) * 128)
