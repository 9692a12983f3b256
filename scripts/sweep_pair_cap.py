"""Trimmed on-chip sweep: pair_cap at the bench scene (3 configs).

pair_cap row-compacts each gaussian's surviving pairs (tiles.py),
shrinking BOTH global pair sorts. Bit-exact when overflow does not grow
over the uncapped run (printed). Picks go to bench.py defaults.
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.graphics import make_camera
from sings_tpu.ops.rasterizer.api import rasterize
from sings_tpu.ops.rasterizer.common import preprocess
from sings_tpu.ops.rasterizer.tiles import bin_gaussians
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

# overflow accounting first (exactness: pair_cap adds zero overflow)
g2d = jax.jit(lambda m, s, o, f: preprocess(
    m, s, quats, o, f, cam, sh_degree=3))(means, scales, opac, shs)
for pc in (None, 6, 5, 4):
    b = bin_gaussians(g2d, tile=16, n_tiles_x=32, n_tiles_y=32,
                      max_span=3, align=128, max_pairs=262144,
                      pair_cap=pc)
    print(f"pair_cap={pc}: pairs={int(b.num_pairs)} "
          f"overflow={int(b.overflow)}", flush=True)

# tail overflow accounting for the main_width sweep (gradient-exactness:
# overflow must stay 0 vs the mw=6 default)
for mw, tc in ((2, 8192), (3, 8192), (4, 4096), (6, None)):
    b = bin_gaussians(g2d, tile=16, n_tiles_x=32, n_tiles_y=32,
                      max_span=3, align=128, max_pairs=262144,
                      main_width=mw, tail_capacity=tc)
    print(f"mw={mw} tc={tc}: overflow={int(b.overflow)}", flush=True)


def run(tag, **kw):
    def loss(means, scales, opac, shs):
        out = rasterize(means, scales, quats, opac, shs, cam, sh_degree=3,
                        bg=bg, backend="pallas", **kw)
        return jnp.sum(out["render"] ** 2)

    grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3))
    tb = device_time(grad_fn, (means, scales, opac, shs), k1=2, k2=12) * 1e3
    print(f"{tag}: fwd+bwd {tb:.2f} ms ({hw*hw/tb*1e3/1e6:.1f} Mpix/s)",
          flush=True)


run("base", tile=16, chunk=128, max_span=3, max_pairs=262144)
run("pc5 mw4", tile=16, chunk=128, max_span=3, max_pairs=262144,
    main_width=4, pair_cap=5)
run("pc4 mw4", tile=16, chunk=128, max_span=3, max_pairs=196608,
    main_width=4, pair_cap=4)
# glue-gather row sweep: the bwd un-sort gathers (N, main_width) prefix
# rows + (tail_capacity, cap - mw) tail rows; after the exact cull most
# gaussians span 1-2 tiles, so a narrow prefix + larger tail should cut
# gather rows ~2x (rows ~7-10 ns each)
run("mw2 tc8k", tile=16, chunk=128, max_span=3, max_pairs=262144,
    main_width=2, tail_capacity=8192)
run("mw3 tc8k", tile=16, chunk=128, max_span=3, max_pairs=262144,
    main_width=3, tail_capacity=8192)
run("pc4 mw2 tc8k", tile=16, chunk=128, max_span=3, max_pairs=196608,
    pair_cap=4, main_width=2, tail_capacity=8192)
# chunk sweep: smaller chunks waste less tail work per tile segment,
# larger amortize the while-loop/anchor overhead
run("chunk64", tile=16, chunk=64, max_span=3, max_pairs=262144)
run("chunk256", tile=16, chunk=256, max_span=3, max_pairs=262144)
