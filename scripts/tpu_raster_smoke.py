"""Compile + time the Pallas rasterizer on the real TPU chip.

Usage: python scripts/tpu_raster_smoke.py [n_gaussians] [image_size]
Prints fwd / fwd+bwd wall times and Mpix/s.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.graphics import make_camera
from sings_tpu.ops.rasterizer.api import rasterize
from sings_tpu.ops.sh import rgb2sh


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print("devices:", jax.devices())

    rng = np.random.RandomState(0)
    cam = make_camera(np.eye(4), height=hw, width=hw, fovx=0.9, fovy=0.9)
    means = jnp.asarray(np.stack([
        rng.uniform(-0.8, 0.8, n), rng.uniform(-0.8, 0.8, n),
        rng.uniform(2.0, 6.0, n)], axis=-1).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.004, 0.02, (n, 3)).astype(np.float32))
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opac = jnp.asarray(rng.uniform(0.2, 1.0, n).astype(np.float32))
    shs = jnp.zeros((n, 16, 3)).at[:, 0, :].set(
        rgb2sh(jnp.asarray(rng.rand(n, 3).astype(np.float32))))
    bg = jnp.zeros(3)

    def fwd(means, scales, opac, shs):
        out = rasterize(means, scales, quats, opac, shs, cam, sh_degree=3,
                        bg=bg, backend="pallas")
        return out["render"]

    def loss(means, scales, opac, shs):
        return jnp.sum(fwd(means, scales, opac, shs) ** 2)

    fwd_j = jax.jit(fwd)
    grad_j = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

    t0 = time.time()
    img = jax.block_until_ready(fwd_j(means, scales, opac, shs))
    print(f"fwd compile+run: {time.time()-t0:.1f}s, img mean {img.mean():.4f}")

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        img = fwd_j(means, scales, opac, shs)
    jax.block_until_ready(img)
    dt_fwd = (time.time() - t0) / iters
    print(f"fwd: {dt_fwd*1e3:.2f} ms  ({hw*hw/dt_fwd/1e6:.1f} Mpix/s)")

    t0 = time.time()
    g = jax.block_until_ready(grad_j(means, scales, opac, shs))
    print(f"bwd compile+run: {time.time()-t0:.1f}s, |g_means|={jnp.abs(g[0]).sum():.4f}")

    t0 = time.time()
    for _ in range(iters):
        g = grad_j(means, scales, opac, shs)
    jax.block_until_ready(g)
    dt = (time.time() - t0) / iters
    print(f"fwd+bwd: {dt*1e3:.2f} ms  ({hw*hw/dt/1e6:.1f} Mpix/s)")


if __name__ == "__main__":
    main()
