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


from sings_tpu.dist.shard import camera_strip  # noqa: E402

cam_full = make_camera(np.eye(4), height=hw, width=hw, fovx=0.9, fovy=0.9)


def strip_loss(cam, mp):
    def loss(means, scales, opac, shs, proj):
        c = cam._replace(proj=proj)
        out = rasterize(means, scales, quats, opac, shs, c, sh_degree=3,
                        bg=bg, backend="pallas", tile=16, chunk=128,
                        max_span=3, max_pairs=mp)
        return jnp.sum(out["render"] ** 2)

    return loss


def time_gs(gs):
    """Time ALL gs strips of the REAL image split in one program
    (lax.map over strip projections — one compile per gs); returns
    (mean strip ms, max-strip estimate from per-strip pair counts).

    The lockstep critical path is the MAX rank; pairs ~ walk time, so
    max_est = mean * max_pairs / mean_pairs."""
    h = hw // gs
    mp = max(32768, 262144 // gs)
    strips = [camera_strip(cam_full, i * h, h) for i in range(gs)]
    projs = jnp.stack([s.proj for s in strips])
    loss = strip_loss(strips[0], mp)

    def all_strips(means, scales, opac, shs):
        def one(proj):
            return jax.grad(loss, argnums=(0, 1, 2, 3))(
                means, scales, opac, shs, proj)

        return jax.lax.map(one, projs)

    t_all = device_time(all_strips, (means, scales, opac, shs),
                        k1=1, k2=5) * 1e3
    # per-strip pair counts for the max-rank estimate
    from sings_tpu.ops.rasterizer.common import preprocess
    from sings_tpu.ops.rasterizer.tiles import bin_gaussians

    counts = []
    for s in strips:
        g2d = jax.jit(lambda m, sc, o, f, c=s: preprocess(
            m, sc, quats, o, f, c, sh_degree=3))(means, scales, opac, shs)
        b = bin_gaussians(g2d, tile=16, n_tiles_x=hw // 16,
                          n_tiles_y=h // 16, max_span=3, align=128,
                          max_pairs=mp)
        counts.append(int(b.num_pairs))
    mean_t = t_all / gs
    max_est = mean_t * max(counts) / max(np.mean(counts), 1.0)
    print(f"    strip pair counts: {counts}", flush=True)
    return mean_t, max_est


def strip_loss_limited(cam, mp):
    def loss(means, scales, opac, shs, proj, valid_rows):
        c = cam._replace(proj=proj)
        out = rasterize(means, scales, quats, opac, shs, c, sh_degree=3,
                        bg=bg, backend="pallas", tile=16, chunk=128,
                        max_span=3, max_pairs=mp, valid_rows=valid_rows)
        return jnp.sum(out["render"] ** 2)

    return loss


def time_gs_balanced(gs):
    """Mitigation 2 (docs/SCALING.md): strip boundaries chosen from the
    per-tile-row pair histogram so every rank walks ~equal pairs; all
    ranks rasterize a STATIC h_max window (compiled shape uniform),
    with the owned region a traced valid_rows sub-range — padding
    tiles bin zero pairs, so their walks exit immediately.
    Returns (mean strip ms over the h_max programs, max-rank est)."""
    from sings_tpu.ops.rasterizer.common import preprocess
    from sings_tpu.ops.rasterizer.tiles import bin_gaussians

    tile = 16
    nty = hw // tile
    # per-tile-row pair counts from one full-image binning
    g2d = jax.jit(lambda m, sc, o, f: preprocess(
        m, sc, quats, o, f, cam_full, sh_degree=3))(means, scales, opac, shs)
    b = bin_gaussians(g2d, tile=tile, n_tiles_x=hw // tile, n_tiles_y=nty,
                      max_span=3, align=128, max_pairs=262144)
    offs = np.asarray(b.tile_offsets)
    per_row = offs[np.arange(1, nty + 1) * (hw // tile)] - \
        offs[np.arange(nty) * (hw // tile)]
    # greedy balanced boundaries: cut when the running sum passes k/gs
    total = per_row.sum()
    cuts, acc, k = [0], 0, 1
    for r in range(nty):
        acc += per_row[r]
        if acc >= total * k / gs and len(cuts) < gs:
            cuts.append(r + 1)
            k += 1
    cuts.append(nty)
    heights = np.diff(cuts) * tile
    h_max = int(-(-heights.max() // tile) * tile)
    mp = max(32768, 262144 // gs)
    strips = [camera_strip(cam_full, int(c) * tile, h_max)
              for c in cuts[:-1]]
    projs = jnp.stack([s.proj for s in strips])
    vrows = jnp.asarray(heights.astype(np.float32))
    loss = strip_loss_limited(strips[0], mp)

    def all_strips(means, scales, opac, shs):
        def one(pv):
            proj, vr = pv
            return jax.grad(loss, argnums=(0, 1, 2, 3))(
                means, scales, opac, shs, proj, vr)

        return jax.lax.map(one, (projs, vrows))

    t_all = device_time(all_strips, (means, scales, opac, shs),
                        k1=1, k2=5) * 1e3
    counts = []
    for s, hgt in zip(strips, heights):
        g2s = jax.jit(lambda m, sc, o, f, c=s: preprocess(
            m, sc, quats, o, f, c, sh_degree=3))(means, scales, opac, shs)
        bs = bin_gaussians(g2s, tile=tile, n_tiles_x=hw // tile,
                           n_tiles_y=h_max // tile, max_span=3, align=128,
                           max_pairs=mp,
                           valid_tiles_y=jnp.asarray(int(hgt) // tile))
        counts.append(int(bs.num_pairs))
    mean_t = t_all / gs
    max_est = mean_t * max(counts) / max(np.mean(counts), 1.0)
    print(f"    balanced heights {list(heights)} h_max {h_max} "
          f"pair counts {counts}", flush=True)
    return mean_t, max_est


def loss_full(means, scales, opac, shs):
    out = rasterize(means, scales, quats, opac, shs, cam_full, sh_degree=3,
                    bg=bg, backend="pallas", tile=16, chunk=128,
                    max_span=3, max_pairs=262144)
    return jnp.sum(out["render"] ** 2)


t_full = device_time(jax.grad(loss_full, argnums=(0, 1, 2, 3)),
                     (means, scales, opac, shs), k1=2, k2=10) * 1e3
print(f"gs=1 full {hw}x{hw}: {t_full:.2f} ms", flush=True)
import sys  # noqa: E402

variant = sys.argv[1] if len(sys.argv) > 1 else "equal"
timer = {"equal": time_gs, "balanced": time_gs_balanced}[variant]
for gs in (2, 4, 8):
    t_mean, t_max = timer(gs)
    coll_bytes = (n * GATHER_F32_PER_GAUSS * 4 * (gs - 1) / gs  # gather
                  * 2                                           # + transpose
                  + 2 * 3 * hw * hw * 4 / gs                    # lpips gthr
                  + 8.4e6 * 2)                                  # grad psum
    t_coll = coll_bytes / (ICI_GBPS * 1e9) * 1e3
    eff_mean = t_full / (gs * (t_mean + t_coll))
    eff_max = t_full / (gs * (t_max + t_coll))
    print(f"gs={gs} [{variant}]: strip mean {t_mean:.2f} ms / max est "
          f"{t_max:.2f} ms | est coll {t_coll:.2f} ms | projected "
          f"gs-axis eff {eff_mean*100:.0f}% (balanced) / "
          f"{eff_max*100:.0f}% (max-rank)", flush=True)
