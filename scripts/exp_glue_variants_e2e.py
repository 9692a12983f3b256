"""Full fused rasterize grad at bench scene vs glue-table shape.

HEAD regressed 20 -> 10 Mpix/s end-to-end while stage timings improved;
this isolates whether the tail path, the narrow main table, or the
prefix enumeration itself is responsible in the fused program.
"""
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


def run(name, **kw):
    def loss(means, scales, opac, shs):
        out = rasterize(means, scales, quats, opac, shs, cam, sh_degree=3,
                        bg=bg, tile=16, chunk=128, max_span=3,
                        max_pairs=262144, **kw)
        return jnp.sum(out["render"] ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))
    dt = device_time(g, (means, scales, opac, shs), k1=2, k2=10, repeats=2)
    print(f"{name}: {dt*1e3:.2f} ms  ({hw*hw/dt/1e6:.1f} Mpix/s)",
          flush=True)


run("A mw=9 dense prefix, no tail", main_width=9)
run("B mw=4 tc=12544 (default)   ", main_width=4)
run("B2 mw=4 tc=12544 gathermerge", main_width=4, tail_capacity=12545)
run("C mw=4 tc=128 (tiny tail)   ", main_width=4, tail_capacity=128)
run("D mw=6 tc=2048              ", main_width=6, tail_capacity=2048)
