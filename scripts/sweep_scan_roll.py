"""On-chip A/B: triangular-matmul vs pltpu.roll chunk cumsum in the
composite kernels (docs/PERF.md roofline: the matmul is 256 MXU flops
per pair-pixel — the largest single kernel term).

Times the full differentiable raster at the bench scene for both
settings. Run: python scripts/sweep_scan_roll.py
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

for scan_roll in (False, True):
    def loss(means, scales, opac, shs, sr=scan_roll):
        out = rasterize(means, scales, quats, opac, shs, cam, sh_degree=3,
                        bg=bg, backend="pallas", tile=16, chunk=128,
                        max_span=3, max_pairs=262144, scan_roll=sr)
        return jnp.sum(out["render"] ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))
    # numeric sanity: grads finite and images agree across settings
    img = jax.jit(lambda m, s, o, f, sr=scan_roll: rasterize(
        m, s, quats, o, f, cam, sh_degree=3, bg=bg, backend="pallas",
        tile=16, chunk=128, max_span=3, max_pairs=262144,
        scan_roll=sr)["render"])(means, scales, opac, shs)
    dt = device_time(g, (means, scales, opac, shs), k1=2, k2=10,
                     repeats=2) * 1e3
    mpix = hw * hw / (dt / 1e3) / 1e6
    print(f"scan_roll={scan_roll}: fwd+bwd {dt:.2f} ms "
          f"({mpix:.1f} Mpix/s) img_sum={float(img.sum()):.4f}",
          flush=True)
