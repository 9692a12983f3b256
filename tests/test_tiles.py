import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.graphics import make_camera
from sings_tpu.ops.rasterizer.common import preprocess, tile_rect
from sings_tpu.ops.rasterizer.tiles import bin_gaussians


def make_scene(n=40, seed=0, hw=64):
    rng = np.random.RandomState(seed)
    cam = make_camera(np.eye(4), height=hw, width=hw, fovx=0.9, fovy=0.9)
    means = jnp.asarray(
        np.stack(
            [rng.uniform(-0.6, 0.6, n), rng.uniform(-0.6, 0.6, n),
             rng.uniform(2.0, 6.0, n)], axis=-1
        ).astype(np.float32)
    )
    scales = jnp.asarray(rng.uniform(0.01, 0.12, (n, 3)).astype(np.float32))
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opac = jnp.asarray(rng.uniform(0.3, 1.0, n).astype(np.float32))
    rgb = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    return cam, means, scales, quats, opac, rgb


def test_binning_matches_bruteforce():
    tile = 16
    ntx = nty = 4
    cam, means, scales, quats, opac, rgb = make_scene(hw=64)
    g = preprocess(means, scales, quats, opac, rgb, cam)
    b = bin_gaussians(g, tile=tile, n_tiles_x=ntx, n_tiles_y=nty, max_span=8,
                      align=8)

    x0, y0, x1, y1 = (np.asarray(v) for v in tile_rect(g, tile, ntx, nty))
    mask = np.asarray(g.mask)
    depths = np.asarray(g.depths)
    means2d = np.asarray(g.means2d)
    conics = np.asarray(g.conics)
    opacs = np.asarray(g.opacities)

    def peak_alpha(i, tx, ty):
        # discrete max alpha of gaussian i over tile (tx, ty)'s pixels
        px, py = np.meshgrid(np.arange(tile) + tx * tile,
                             np.arange(tile) + ty * tile)
        dx = means2d[i, 0] - px
        dy = means2d[i, 1] - py
        a, bb, c = conics[i]
        power = -0.5 * (a * dx * dx + c * dy * dy) - bb * dx * dy
        alpha = np.minimum(0.99, opacs[i] * np.exp(power))
        return np.where(power > 0, 0.0, alpha).max()

    offs = np.asarray(b.tile_offsets)
    sg = np.asarray(b.sorted_gauss)
    for t in range(ntx * nty):
        ty, tx = divmod(t, ntx)
        rect = [
            i for i in range(len(mask))
            if mask[i] and x0[i] <= tx < x1[i] and y0[i] <= ty < y1[i]
        ]
        # pairs the composite kernel would give nonzero alpha MUST be
        # kept (culling is conservative); sub-1/255 rect pairs MAY be
        # culled (they are exact zeros in the kernel either way)
        must = [i for i in rect if peak_alpha(i, tx, ty) >= 1.0 / 255.0]
        got = [int(v) for v in sg[offs[t]:offs[t + 1]]]
        assert set(must) <= set(got) <= set(rect), (t, got, must, rect)
        want_order = sorted(got, key=lambda i: depths[i])
        assert got == want_order, (t, got, want_order)

    assert int(b.overflow) == 0


def test_binning_span_cap_crops():
    tile = 16
    cam, means, scales, quats, opac, rgb = make_scene(hw=64)
    scales = scales.at[0].set(2.0)
    g = preprocess(means, scales, quats, opac, rgb, cam)
    b = bin_gaussians(g, tile=tile, n_tiles_x=4, n_tiles_y=4, max_span=2,
                      align=8)
    assert int(b.overflow) > 0
    count0 = int((np.asarray(b.sorted_gauss) == 0).sum())
    assert count0 <= 4


def test_binning_max_pairs_truncates():
    cam, means, scales, quats, opac, rgb = make_scene(hw=64)
    g = preprocess(means, scales, quats, opac, rgb, cam)
    full = bin_gaussians(g, tile=16, n_tiles_x=4, n_tiles_y=4, max_span=8,
                         align=8)
    npairs = int(full.num_pairs)
    capped = bin_gaussians(g, tile=16, n_tiles_x=4, n_tiles_y=4, max_span=8,
                           align=8, max_pairs=npairs // 2)
    # pk rounds UP to the alignment (unaligned pair capacities fault the
    # TPU DMA windows — tiles.py); overflow counts pairs beyond it
    pk = -(-(npairs // 2) // 8) * 8
    assert capped.sorted_gauss.shape[0] == pk
    assert int(capped.overflow) >= npairs - pk


def test_glue_slot_tables_grad_layout():
    """main_slot + tail_slot must map each valid pair to the grad-buffer
    slot the backward kernel writes: grad_offsets[t] + (i - floor)."""
    align = 8
    cam, means, scales, quats, opac, rgb = make_scene(hw=64)
    n = means.shape[0]
    g = preprocess(means, scales, quats, opac, rgb, cam)
    b = bin_gaussians(g, tile=16, n_tiles_x=4, n_tiles_y=4, max_span=8,
                      align=align, main_width=4, tail_capacity=n)
    offs = np.asarray(b.tile_offsets)
    goffs = np.asarray(b.grad_offsets)
    sg = np.asarray(b.sorted_gauss)
    main = np.asarray(b.main_slot)
    tail = np.asarray(b.tail_slot)
    tof = np.asarray(b.tail_of_gauss)
    tc = tail.shape[0]
    spare = b.pair_slot_capacity - 1

    # per-gaussian multiset of non-spare slots across both tables
    slots_of = {gid: [] for gid in range(n)}
    for gid in range(n):
        slots_of[gid] += [s for s in main[gid] if s != spare]
        if tof[gid] < tc:
            slots_of[gid] += [s for s in tail[tof[gid]] if s != spare]

    seen = set()
    total = 0
    for t in range(16):
        base = (offs[t] // align) * align
        for i in range(offs[t], offs[t + 1]):
            slot = goffs[t] + (i - base)
            gid = int(sg[i])
            assert gid >= 0
            assert slots_of[gid].count(slot) == 1, (t, gid, slot)
            assert slot not in seen
            seen.add(slot)
            total += 1
    # no extra non-spare entries beyond the valid pairs
    assert sum(len(v) for v in slots_of.values()) == total == int(b.num_pairs)
    assert int(b.overflow) == 0


def test_glue_tail_overflow_counted():
    cam, means, scales, quats, opac, rgb = make_scene(hw=64)
    g = preprocess(means, scales, quats, opac, rgb, cam)
    full = bin_gaussians(g, tile=16, n_tiles_x=4, n_tiles_y=4, max_span=8,
                         align=8, main_width=2, tail_capacity=64)
    assert int(full.overflow) == 0
    tight = bin_gaussians(g, tile=16, n_tiles_x=4, n_tiles_y=4, max_span=8,
                          align=8, main_width=2, tail_capacity=8)
    nbig = int((np.asarray(full.tail_of_gauss)
                < full.tail_slot.shape[0]).sum())
    if nbig > 8:
        assert int(tight.overflow) > 0
