"""Pallas tile rasterizer vs the dense reference compositor.

Runs the kernels in interpreter mode on CPU (same code path the TPU
compiles). Values and gradients must agree to float32 tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sings_tpu.ops.graphics import make_camera
from sings_tpu.ops.rasterizer.api import rasterize
from sings_tpu.ops.sh import rgb2sh


def make_scene(n=60, seed=0, hw=48, sh=False):
    rng = np.random.RandomState(seed)
    cam = make_camera(np.eye(4), height=hw, width=hw, fovx=0.9, fovy=0.9)
    means = jnp.asarray(np.stack([
        rng.uniform(-0.6, 0.6, n), rng.uniform(-0.6, 0.6, n),
        rng.uniform(2.0, 6.0, n)], axis=-1).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.02, 0.15, (n, 3)).astype(np.float32))
    aa = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.5)
    from sings_tpu.ops.rotations import axis_angle_to_quaternion
    quats = axis_angle_to_quaternion(aa)
    opac = jnp.asarray(rng.uniform(0.2, 1.0, n).astype(np.float32))
    rgb = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    if sh:
        shs = jnp.zeros((n, 16, 3))
        shs = shs.at[:, 0, :].set(rgb2sh(rgb))
        shs = shs.at[:, 1:, :].set(
            jnp.asarray(rng.randn(n, 15, 3).astype(np.float32)) * 0.1)
        feats = shs
    else:
        feats = rgb
    bg = jnp.asarray(rng.rand(3).astype(np.float32))
    return cam, means, scales, quats, opac, feats, bg


KW = dict(tile=16, chunk=8, max_span=8, interpret=True)


@pytest.mark.parametrize("sh", [False, True])
def test_pallas_matches_reference_forward(sh):
    cam, means, scales, quats, opac, feats, bg = make_scene(sh=sh)
    deg = 3 if sh else 0
    ref = rasterize(means, scales, quats, opac, feats, cam, sh_degree=deg,
                    bg=bg, backend="reference")
    pal = rasterize(means, scales, quats, opac, feats, cam, sh_degree=deg,
                    bg=bg, backend="pallas", **KW)
    np.testing.assert_allclose(
        np.asarray(pal["render"]), np.asarray(ref["render"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(pal["transmittance"]), np.asarray(ref["transmittance"]),
        atol=2e-5,
    )


def test_pallas_matches_reference_gradients():
    cam, means, scales, quats, opac, feats, bg = make_scene(n=40)
    target = jnp.zeros((3, 48, 48))

    def loss(backend, means, scales, opac, feats):
        out = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                        backend=backend, **(KW if backend == "pallas" else {}))
        return jnp.sum((out["render"] - target) ** 2)

    g_ref = jax.grad(lambda *a: loss("reference", *a), argnums=(0, 1, 2, 3))(
        means, scales, opac, feats)
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3))(
        means, scales, opac, feats)
    for a, b, name in zip(g_pal, g_ref, ["means", "scales", "opac", "feats"]):
        scale = max(1e-3, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4 * scale, rtol=2e-3,
            err_msg=name,
        )


def test_pallas_nonsquare_and_crop():
    cam, means, scales, quats, opac, feats, bg = make_scene(hw=48)
    cam = make_camera(np.eye(4), height=40, width=56, fovx=0.9, fovy=0.7)
    ref = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                    backend="reference")
    pal = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                    backend="pallas", **KW)
    np.testing.assert_allclose(
        np.asarray(pal["render"]), np.asarray(ref["render"]), atol=2e-5
    )


def test_screen_probe_grad_matches_reference():
    cam, means, scales, quats, opac, feats, bg = make_scene(n=30)
    probe = jnp.zeros((30, 2))

    def loss(backend, probe):
        out = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                        screen_probe=probe, backend=backend,
                        **(KW if backend == "pallas" else {}))
        return jnp.sum(out["render"] ** 2)

    g_ref = jax.grad(lambda p: loss("reference", p))(probe)
    g_pal = jax.grad(lambda p: loss("pallas", p))(probe)
    scale = max(1e-3, float(jnp.abs(g_ref).max()))
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=2e-4 * scale, rtol=2e-3)


def test_saturated_pixels_terminate_consistently():
    # many opaque gaussians stacked on one spot: early termination path
    n = 64
    cam = make_camera(np.eye(4), height=32, width=32, fovx=0.9, fovy=0.9)
    means = jnp.tile(jnp.array([[0.0, 0.0, 3.0]]), (n, 1))
    means = means + jnp.linspace(0, 0.5, n)[:, None] * jnp.array([[0, 0, 1.0]])
    scales = jnp.full((n, 3), 0.2)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opac = jnp.full((n,), 0.95)
    rgb = jnp.asarray(np.random.RandomState(0).rand(n, 3).astype(np.float32))
    bg = jnp.ones(3)
    ref = rasterize(means, scales, quats, opac, rgb, cam, bg=bg,
                    backend="reference")
    pal = rasterize(means, scales, quats, opac, rgb, cam, bg=bg,
                    backend="pallas", **KW)
    # log-space vs direct products differ by float noise in saturated px
    np.testing.assert_allclose(np.asarray(pal["render"]),
                               np.asarray(ref["render"]), atol=1e-4)
    assert float(pal["transmittance"].min()) < 1e-3


def test_rasterize_multi_matches_manual_concat():
    """Two avatars through rasterize_multi == one rasterize over the
    manually concatenated gaussians (reference gs_renderer_multiple
    contract: correct global depth order across avatars)."""
    from sings_tpu.ops.rasterizer.multi import rasterize_multi

    cam, m1, s1, q1, o1, f1, bg = make_scene(n=30, seed=1)
    _, m2, s2, q2, o2, f2, _ = make_scene(n=25, seed=2)
    t2 = jnp.array([0.3, -0.1, 0.5])
    outs = [
        {"xyz": m1, "scales": s1, "rotq": q1, "opacity": o1, "shs": f1},
        {"xyz": m2, "scales": s2, "rotq": q2, "opacity": o2, "shs": f2},
    ]
    multi = rasterize_multi(outs, cam, translations=[jnp.zeros(3), t2],
                            bg=bg, sh_degree=0, **KW)
    single = rasterize(
        jnp.concatenate([m1, m2 + t2]), jnp.concatenate([s1, s2]),
        jnp.concatenate([q1, q2]), jnp.concatenate([o1, o2]),
        jnp.concatenate([f1, f2]), cam, sh_degree=0, bg=bg,
        backend="pallas", **KW)
    np.testing.assert_allclose(np.asarray(multi["render"]),
                               np.asarray(single["render"]), atol=1e-6)
    # and the reference compositor agrees (global depth order holds)
    ref = rasterize(
        jnp.concatenate([m1, m2 + t2]), jnp.concatenate([s1, s2]),
        jnp.concatenate([q1, q2]), jnp.concatenate([o1, o2]),
        jnp.concatenate([f1, f2]), cam, sh_degree=0, bg=bg,
        backend="reference")
    np.testing.assert_allclose(np.asarray(multi["render"]),
                               np.asarray(ref["render"]), atol=2e-5)


def test_finite_difference_gradients():
    """Central finite differences vs the custom-VJP gradients on a tiny
    scene (SURVEY section 4 / BASELINE config 1).

    The pipeline is f32; the scalar loss is accumulated on host in f64
    to avoid sum quantization. The compositing function has genuine
    discontinuities (the CUDA-parity alpha < 1/255 cutoff ring, tile
    rects), so individual probes can straddle a jump — require a large
    majority of probes to match instead of all.
    """
    cam, means, scales, quats, opac, feats, bg = make_scene(n=6, hw=24)

    def render(means):
        out = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                        backend="pallas", **KW)
        return out["render"]

    def loss_host(means):
        return float(np.sum(np.asarray(render(means), np.float64) ** 2))

    g = np.asarray(jax.grad(lambda m: jnp.sum(render(m) ** 2))(means))
    eps = 1e-4
    rng = np.random.RandomState(0)
    ok, total = 0, 0
    for _ in range(10):
        i = rng.randint(0, means.shape[0])
        d = rng.randint(0, 2)
        base = np.asarray(means)
        up = base.copy(); up[i, d] += eps
        dn = base.copy(); dn[i, d] -= eps
        fd = (loss_host(jnp.asarray(up)) - loss_host(jnp.asarray(dn))) / (
            2 * eps)
        if abs(fd) < 1e-3 and abs(g[i, d]) < 1e-3:
            continue
        total += 1
        if abs(g[i, d] - fd) <= 0.05 * max(abs(fd), abs(g[i, d]), 0.1):
            ok += 1
    assert total >= 4
    assert ok >= int(0.7 * total), (ok, total, g)


@pytest.mark.parametrize("tile", [8, 32])
def test_nondefault_tile_matches_reference(tile):
    """The tile size must thread through preprocess + binning + kernels.

    The dense reference applies the CUDA 3-sigma rect cull at the SAME
    tile granularity; with mismatched granularities the images differ
    legitimately (pixels at ~3.26 sigma where alpha >= 1/255 fall
    outside the finer rect — exactly like real CUDA at that tile size).
    Regression for the round-2 advisor finding: rasterize() used to
    preprocess at tile=16 regardless of the tile argument.
    """
    cam, means, scales, quats, opac, feats, bg = make_scene()
    from sings_tpu.ops.rasterizer.common import preprocess
    from sings_tpu.ops.rasterizer.reference import composite_dense

    g2d = preprocess(means, scales, quats, opac, feats, cam, tile=tile)
    img, _ = composite_dense(g2d, cam.height, cam.width, bg, tile=tile)
    pal = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                    tile=tile, chunk=8, max_span=8, interpret=True)
    assert jnp.abs(pal["render"] - img).max() < 2e-4


def test_pair_cap_compaction_exact():
    """pair_cap compaction must be bit-exact (image AND grads) when no
    gaussian has more surviving pairs than the cap, and conservative
    (finite, overflow-counted) when some do."""
    cam, means, scales, quats, opac, feats, bg = make_scene(n=50, seed=3)
    kw_full = dict(KW, max_span=3)
    kw_cap = dict(KW, max_span=3, pair_cap=6)

    def loss(kw, means, scales, opac, feats):
        out = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                        backend="pallas", **kw)
        return jnp.sum(out["render"] ** 2), out["render"]

    (l_full, img_full), g_full = jax.value_and_grad(
        lambda *a: loss(kw_full, *a), argnums=(0, 1, 2, 3),
        has_aux=True)(means, scales, opac, feats)
    (l_cap, img_cap), g_cap = jax.value_and_grad(
        lambda *a: loss(kw_cap, *a), argnums=(0, 1, 2, 3),
        has_aux=True)(means, scales, opac, feats)

    # this scene overflows the per-gaussian cap for some gaussians —
    # confirm via binning diagnostics, then only check finiteness
    from sings_tpu.ops.rasterizer.common import preprocess
    from sings_tpu.ops.rasterizer.tiles import bin_gaussians
    g2d = preprocess(means, scales, quats, opac, feats, cam, sh_degree=0)
    b6 = bin_gaussians(g2d, tile=16, n_tiles_x=3, n_tiles_y=3, max_span=3,
                       align=8, pair_cap=6)
    b9 = bin_gaussians(g2d, tile=16, n_tiles_x=3, n_tiles_y=3, max_span=3,
                       align=8)
    if int(b6.overflow) == int(b9.overflow):
        # no extra drops: compaction must be exact
        np.testing.assert_array_equal(np.asarray(img_cap),
                                      np.asarray(img_full))
        for a, b, name in zip(g_cap, g_full,
                              ["means", "scales", "opac", "feats"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=name)
    assert all(bool(jnp.isfinite(x).all()) for x in g_cap)

    # tiny-splat scene: every gaussian survives <= a few tiles ->
    # pair_cap=4 is exact
    cam2, means2, scales2, quats2, opac2, feats2, bg2 = make_scene(
        n=80, seed=4)
    scales2 = scales2 * 0.15
    r_full = rasterize(means2, scales2, quats2, opac2, feats2, cam2, bg=bg2,
                       backend="pallas", **dict(KW, max_span=3))
    r_cap = rasterize(means2, scales2, quats2, opac2, feats2, cam2, bg=bg2,
                      backend="pallas", **dict(KW, max_span=3, pair_cap=4))
    np.testing.assert_array_equal(np.asarray(r_cap["render"]),
                                  np.asarray(r_full["render"]))


def test_scan_roll_matches_matmul_cumsum():
    """The MXU-free chunk cumsum (scan_roll=True, log2(chunk) masked
    pltpu.rolls) must reproduce the triangular-matmul path's values AND
    gradients (same sums, f32 reassociated)."""
    cam, means, scales, quats, opac, feats, bg = make_scene(sh=True)

    def run(scan_roll):
        def loss(means, scales, opac, feats):
            out = rasterize(means, scales, quats, opac, feats, cam,
                            sh_degree=3, bg=bg, backend="pallas",
                            scan_roll=scan_roll, **KW)
            return jnp.sum(out["render"] ** 2), out["render"]

        (v, img), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True)(
                means, scales, opac, feats)
        return img, g

    img_m, g_m = run(False)
    img_r, g_r = run(True)
    np.testing.assert_allclose(np.asarray(img_r), np.asarray(img_m),
                               atol=2e-5)
    for a, b in zip(g_r, g_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=2e-4)


@pytest.mark.parametrize("sh", [False, True])
def test_panel_layout_matches_reference_forward(sh):
    """layout='panel' (image-layout kernels, pallas_kernels panel
    section) must match the dense reference like the tiled layout."""
    cam, means, scales, quats, opac, feats, bg = make_scene(sh=sh)
    deg = 3 if sh else 0
    ref = rasterize(means, scales, quats, opac, feats, cam, sh_degree=deg,
                    bg=bg, backend="reference")
    pal = rasterize(means, scales, quats, opac, feats, cam, sh_degree=deg,
                    bg=bg, backend="pallas", layout="panel", **KW)
    np.testing.assert_allclose(
        np.asarray(pal["render"]), np.asarray(ref["render"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pal["transmittance"]), np.asarray(ref["transmittance"]),
        atol=2e-5)


def test_panel_layout_matches_tiled_bitwise():
    """Panel and tiled layouts walk pairs in the same order with the
    same chunk math — the forward image must agree BITWISE (the
    selection-matmul relayout routes, never accumulates). Backward
    gradients agree to ~1 ulp only: the compiler contracts the tiled
    kernel's channel reduction into FMA chains the panel formulation
    doesn't reproduce, and XLA fuses the preprocess backward
    differently under the two downstream graphs."""
    from sings_tpu.ops.rasterizer.api import (
        RasterConfig, _composite_bwd, _composite_fwd,
    )
    from sings_tpu.ops.rasterizer.common import preprocess

    cam, means, scales, quats, opac, feats, bg = make_scene(n=50, seed=5)
    g2d = preprocess(means, scales, quats, opac, feats, cam, sh_degree=0,
                     tile=16)
    results = {}
    for lay in ("tiled", "panel"):
        cfg = RasterConfig(height=cam.height, width=cam.width, tile=16,
                           chunk=8, max_span=8, layout=lay, interpret=True)
        (color, t_f), res = _composite_fwd(
            cfg, g2d.means2d, g2d.conics, g2d.colors, g2d.opacities,
            g2d.depths, g2d.radii.astype(jnp.float32),
            g2d.mask.astype(jnp.float32),
            jnp.asarray(float(cam.height)))
        gc = 2.0 * color  # d/dcolor sum(color^2), deterministic cotangent
        gt = 0.25 * jnp.ones_like(t_f)
        grads = _composite_bwd(cfg, res, (gc, gt))
        results[lay] = (color, t_f, grads)

    c_t, tf_t, g_t = results["tiled"]
    c_p, tf_p, g_p = results["panel"]
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_t))
    np.testing.assert_array_equal(np.asarray(tf_p), np.asarray(tf_t))
    for a, b in zip(g_p, g_t):
        scale = max(1e-6, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5 * scale, rtol=1e-4)

    def run(layout):
        def loss(means, scales, opac, feats):
            out = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                            backend="pallas", layout=layout, **KW)
            return jnp.sum(out["render"] ** 2)

        return jax.grad(loss, argnums=(0, 1, 2, 3))(
            means, scales, opac, feats)

    for a, b, name in zip(run("panel"), run("tiled"),
                          ["means", "scales", "opac", "feats"]):
        scale = max(1e-3, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5 * scale, rtol=1e-4,
                                   err_msg=name)


def test_panel_layout_nonsquare_and_padding_columns():
    """ntx=4 tiles < panel width 8: the guard path for panel padding
    columns must keep empty sub-tiles at bg color and zero grads."""
    cam, means, scales, quats, opac, feats, bg = make_scene(hw=48)
    cam = make_camera(np.eye(4), height=40, width=56, fovx=0.9, fovy=0.7)
    ref = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                    backend="reference")
    pal = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                    backend="pallas", layout="panel", **KW)
    np.testing.assert_allclose(
        np.asarray(pal["render"]), np.asarray(ref["render"]), atol=2e-5)

    def loss(backend, layout, means, scales, opac, feats):
        out = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                        backend=backend, layout=layout,
                        **(KW if backend == "pallas" else {}))
        return jnp.sum((out["render"] - 0.25) ** 2)

    g_ref = jax.grad(lambda *a: loss("reference", "tiled", *a),
                     argnums=(0, 1, 2, 3))(means, scales, opac, feats)
    g_pan = jax.grad(lambda *a: loss("pallas", "panel", *a),
                     argnums=(0, 1, 2, 3))(means, scales, opac, feats)
    for a, b, name in zip(g_pan, g_ref, ["means", "scales", "opac", "feats"]):
        scale = max(1e-3, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4 * scale, rtol=2e-3,
            err_msg=name)


@pytest.mark.parametrize("tile", [8, 32])
def test_panel_layout_nondefault_tile(tile):
    """pw = 128//tile (16 for tile=8, 4 for tile=32) must thread through
    the panel grid/guards."""
    cam, means, scales, quats, opac, feats, bg = make_scene()
    from sings_tpu.ops.rasterizer.common import preprocess
    from sings_tpu.ops.rasterizer.reference import composite_dense

    g2d = preprocess(means, scales, quats, opac, feats, cam, tile=tile)
    img, _ = composite_dense(g2d, cam.height, cam.width, bg, tile=tile)
    pal = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                    tile=tile, chunk=8, max_span=8, layout="panel",
                    interpret=True)
    assert jnp.abs(pal["render"] - img).max() < 2e-4


def test_panel_layout_early_termination():
    """Saturated-pixel early exit drains the panel prefetch correctly."""
    n = 64
    cam = make_camera(np.eye(4), height=32, width=32, fovx=0.9, fovy=0.9)
    means = jnp.tile(jnp.array([[0.0, 0.0, 3.0]]), (n, 1))
    means = means + jnp.linspace(0, 0.5, n)[:, None] * jnp.array([[0, 0, 1.0]])
    scales = jnp.full((n, 3), 0.2)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opac = jnp.full((n,), 0.95)
    rgb = jnp.asarray(np.random.RandomState(0).rand(n, 3).astype(np.float32))
    bg = jnp.ones(3)
    ref = rasterize(means, scales, quats, opac, rgb, cam, bg=bg,
                    backend="reference")
    pal = rasterize(means, scales, quats, opac, rgb, cam, bg=bg,
                    backend="pallas", layout="panel", **KW)
    np.testing.assert_allclose(np.asarray(pal["render"]),
                               np.asarray(ref["render"]), atol=1e-4)
    assert float(pal["transmittance"].min()) < 1e-3


@pytest.mark.parametrize("layout", ["tiled", "panel"])
def test_valid_rows_strip_ownership(layout):
    """valid_rows (tiles.py valid_tiles_y): tile rows below the traced
    cutoff are BIT-IDENTICAL to the unrestricted render; rows beyond
    render pure background and contribute zero gradients."""
    cam, means, scales, quats, opac, feats, bg = make_scene(n=60, seed=6)

    full = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                     backend="pallas", layout=layout, **KW)
    vr = 32.0  # own the first 2 tile rows of the 3-row image
    lim = rasterize(means, scales, quats, opac, feats, cam, bg=bg,
                    backend="pallas", layout=layout,
                    valid_rows=jnp.asarray(vr), **KW)
    np.testing.assert_array_equal(np.asarray(lim["render"][:, :32]),
                                  np.asarray(full["render"][:, :32]))
    np.testing.assert_allclose(
        np.asarray(lim["render"][:, 32:]),
        np.broadcast_to(np.asarray(bg)[:, None, None], (3, 16, 48)),
        atol=1e-7)

    # gradient flows only from owned rows: compare against cropping the
    # full render's loss to the owned rows
    def loss_lim(m):
        out = rasterize(m, scales, quats, opac, feats, cam, bg=bg,
                        backend="pallas", layout=layout,
                        valid_rows=jnp.asarray(vr), **KW)
        return jnp.sum(out["render"][:, :32] ** 2)

    def loss_crop(m):
        out = rasterize(m, scales, quats, opac, feats, cam, bg=bg,
                        backend="pallas", layout=layout, **KW)
        return jnp.sum(out["render"][:, :32] ** 2)

    g_lim = jax.grad(loss_lim)(means)
    g_crop = jax.grad(loss_crop)(means)
    scale = max(1e-3, float(jnp.abs(g_crop).max()))
    np.testing.assert_allclose(np.asarray(g_lim), np.asarray(g_crop),
                               atol=1e-5 * scale, rtol=1e-4)
