"""Why is rasterize fwd+bwd 33 ms at train shape but 12.5 ms at bench?

Isolates: image size, max_pairs capacity, capacity padding + alive mask.
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


def scene(n, seed=0):
    rng = np.random.RandomState(seed)
    means = jnp.asarray(np.stack([
        rng.uniform(-0.8, 0.8, n), rng.uniform(-0.8, 0.8, n),
        rng.uniform(2.0, 6.0, n)], -1).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.004, 0.02, (n, 3)).astype(np.float32))
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opac = jnp.asarray(rng.uniform(0.2, 1.0, n).astype(np.float32))
    shs = jnp.zeros((n, 16, 3)).at[:, 0, :].set(
        rgb2sh(jnp.asarray(rng.rand(n, 3).astype(np.float32))))
    return means, scales, quats, opac, shs


def case(name, n, h, w, max_pairs, alive_frac=1.0, probe=False):
    means, scales, quats, opac, shs = scene(n)
    cam = make_camera(np.eye(4), height=h, width=w, fovx=0.9, fovy=0.9)
    alive = None
    if alive_frac < 1.0:
        alive = jnp.arange(n) < int(n * alive_frac)
    kw = dict(tile=16, chunk=128, max_span=3, max_pairs=max_pairs)

    def loss(means, scales, opac, shs):
        out = rasterize(means, scales, quats, opac, shs, cam, sh_degree=3,
                        bg=jnp.zeros(3), alive=alive,
                        screen_probe=(jnp.zeros((n, 2))
                                      if probe else None), **kw)
        return jnp.sum(out["render"] ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))
    dt = device_time(g, (means, scales, opac, shs), k1=1, k2=6, repeats=2)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


case("a) 512x512 50k mp=262144      ", 50_000, 512, 512, 262144)
case("b) 512x896 50k mp=262144      ", 50_000, 512, 896, 262144)
case("c) 512x896 50k mp=None        ", 50_000, 512, 896, None)
case("d) 512x896 51.2k cap, 50% live", 51_200, 512, 896, None, 0.5)
case("e) d + screen_probe           ", 51_200, 512, 896, None, 0.5, True)
