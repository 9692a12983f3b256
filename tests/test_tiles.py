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

    # brute force: per tile, gaussians overlapping it, sorted by depth
    offs = np.asarray(b.tile_offsets)
    padded = np.asarray(b.padded_gauss)
    for t in range(ntx * nty):
        ty, tx = divmod(t, ntx)
        want = [
            i for i in range(len(mask))
            if mask[i] and x0[i] <= tx < x1[i] and y0[i] <= ty < y1[i]
        ]
        want.sort(key=lambda i: depths[i])
        got = [int(v) for v in padded[offs[t]:offs[t + 1]] if v >= 0]
        assert got == want, (t, got, want)

    assert int(b.overflow) == 0
    # alignment
    assert np.all(offs % 8 == 0)


def test_binning_span_cap_crops():
    tile = 16
    cam, means, scales, quats, opac, rgb = make_scene(hw=64)
    # one huge gaussian spanning everything
    scales = scales.at[0].set(2.0)
    g = preprocess(means, scales, quats, opac, rgb, cam)
    b = bin_gaussians(g, tile=tile, n_tiles_x=4, n_tiles_y=4, max_span=2,
                      align=8)
    assert int(b.overflow) > 0
    # gaussian 0 appears in at most 4 tiles
    count0 = int((np.asarray(b.padded_gauss) == 0).sum())
    assert count0 <= 4


def test_pair_slot_roundtrip():
    cam, means, scales, quats, opac, rgb = make_scene(hw=64)
    g = preprocess(means, scales, quats, opac, rgb, cam)
    b = bin_gaussians(g, tile=16, n_tiles_x=4, n_tiles_y=4, max_span=8,
                      align=8)
    padded = np.asarray(b.padded_gauss)
    slots = np.asarray(b.pair_slot).reshape(len(np.asarray(g.mask)), -1)
    spare = len(padded) - 1
    for gi in range(slots.shape[0]):
        for s in slots[gi]:
            if s != spare:
                assert padded[s] == gi
