"""Per-rank strip cost for the gs axis (docs/SCALING.md evidence).

Times the full differentiable raster pipeline at the per-rank strip
shapes of gs = 1/2/4/8 on the single chip: strip h = H/gs with ALL N
gaussians (what each gs rank does in dist/train_sharded.py), plus the
all_gather'd byte volume, and prints the projected gs-axis efficiency

    eff(gs) = t_full / (gs * t_strip + t_coll_est)

with t_coll_est from the ICI budget in docs/SCALING.md.
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
means = jnp.asarray(np.stack([
    rng.uniform(-0.8, 0.8, n), rng.uniform(-0.8, 0.8, n),
    rng.uniform(2.0, 6.0, n)], -1).astype(np.float32))
scales = jnp.asarray(rng.uniform(0.004, 0.02, (n, 3)).astype(np.float32))
quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
opac = jnp.asarray(rng.uniform(0.2, 1.0, n).astype(np.float32))
shs = jnp.zeros((n, 16, 3)).at[:, 0, :].set(
    rgb2sh(jnp.asarray(rng.rand(n, 3).astype(np.float32))))
bg = jnp.zeros(3)

GATHER_F32_PER_GAUSS = 68  # dist/train_sharded._GATHER_KEYS payload
ICI_GBPS = 100.0           # conservative single-direction budget


def time_strip(gs):
    h = hw // gs
    # per-rank pair budget scales with the strip's tile count
    mp = max(32768, 262144 // gs)
    cam = make_camera(np.eye(4), height=h, width=hw, fovx=0.9, fovy=0.9)

    def loss(means, scales, opac, shs):
        out = rasterize(means, scales, quats, opac, shs, cam, sh_degree=3,
                        bg=bg, backend="pallas", tile=16, chunk=128,
                        max_span=3, max_pairs=mp)
        return jnp.sum(out["render"] ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))
    return device_time(g, (means, scales, opac, shs), k1=2, k2=10) * 1e3


t_full = time_strip(1)
print(f"gs=1 full {hw}x{hw}: {t_full:.2f} ms", flush=True)
for gs in (2, 4, 8):
    t_strip = time_strip(gs)
    coll_bytes = (n * GATHER_F32_PER_GAUSS * 4 * (gs - 1) / gs  # gather
                  * 2                                           # + transpose
                  + 2 * 3 * hw * hw * 4 / gs                    # lpips gthr
                  + 8.4e6 * 2)                                  # grad psum
    t_coll = coll_bytes / (ICI_GBPS * 1e9) * 1e3
    eff = t_full / (gs * (t_strip + t_coll))
    print(f"gs={gs}: strip {hw//gs}x{hw} {t_strip:.2f} ms | est coll "
          f"{t_coll:.2f} ms | projected gs-axis eff {eff*100:.0f}%",
          flush=True)
