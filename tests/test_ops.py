import jax
import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.knn import knn
from sings_tpu.ops.sampling import grid_sample_2d
from sings_tpu.ops.schedules import cosine_lr, expon_lr
from sings_tpu.ops.sh import C0, eval_sh, rgb2sh, sh2rgb, sh_to_rgb
from sings_tpu.ops.ssim import psnr, ssim


def test_sh_degree0_constant():
    sh = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
    dirs = jnp.asarray(np.random.RandomState(0).randn(5, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = eval_sh(0, sh, dirs)
    np.testing.assert_allclose(np.asarray(out), C0, atol=1e-6)
    out3 = eval_sh(3, sh, dirs)
    np.testing.assert_allclose(np.asarray(out3), C0, atol=1e-6)


def test_sh_rgb_roundtrip():
    rgb = jnp.asarray(np.random.RandomState(1).rand(10, 3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(sh2rgb(rgb2sh(rgb))), np.asarray(rgb),
                               atol=1e-6)
    # dc-only sh evaluated in any direction reproduces the rgb (clamped)
    sh = jnp.zeros((10, 16, 3)).at[:, 0, :].set(rgb2sh(rgb))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (10, 1))
    np.testing.assert_allclose(np.asarray(sh_to_rgb(3, sh, dirs)),
                               np.asarray(rgb), atol=1e-6)


def test_ssim_identity_and_range():
    img = jnp.asarray(np.random.RandomState(2).rand(3, 32, 32).astype(np.float32))
    assert float(ssim(img, img)) > 0.9999
    noise = img + 0.5 * jnp.asarray(
        np.random.RandomState(3).randn(3, 32, 32).astype(np.float32))
    assert float(ssim(img, noise)) < 0.9


def test_ssim_matches_torch_style_2d_conv_reference():
    """Banded-matmul blur == the reference's zero-padded 2D window conv
    (sings/rec/losses/utils.py:27-70 semantics, computed here in numpy)."""
    rs = np.random.RandomState(4)
    a = rs.rand(3, 21, 17).astype(np.float32)
    b = rs.rand(3, 21, 17).astype(np.float32)

    xs = np.arange(11)
    g = np.exp(-((xs - 5) ** 2) / (2 * 1.5**2))
    g = (g / g.sum()).astype(np.float64)
    win2d = np.outer(g, g)

    def blur(img):
        c, h, w = img.shape
        pad = np.zeros((c, h + 10, w + 10))
        pad[:, 5:-5, 5:-5] = img
        out = np.zeros((c, h, w))
        for dy in range(11):
            for dx in range(11):
                out += win2d[dy, dx] * pad[:, dy:dy + h, dx:dx + w]
        return out

    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1**2
    s2 = blur(b * b) - mu2**2
    s12 = blur(a * b) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    expected = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) /
                ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))).mean()
    np.testing.assert_allclose(float(ssim(jnp.asarray(a), jnp.asarray(b))),
                               expected, rtol=2e-5)


def test_psnr():
    img = jnp.zeros((3, 8, 8))
    np.testing.assert_allclose(float(psnr(img, img + 0.1)), 20.0, rtol=1e-4)


def test_grid_sample_matches_manual_bilinear():
    rng = np.random.RandomState(4)
    grid = jnp.asarray(rng.rand(2, 5, 7).astype(np.float32))
    # sample exactly at grid nodes (align_corners=True semantics)
    ys, xs = np.meshgrid(np.arange(5), np.arange(7), indexing="ij")
    coords = np.stack(
        [xs.ravel() / 6 * 2 - 1, ys.ravel() / 4 * 2 - 1], axis=-1
    ).astype(np.float32)
    out = grid_sample_2d(grid, jnp.asarray(coords))
    expect = np.asarray(grid).reshape(2, -1).T
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)
    # border padding: out-of-range clamps
    far = jnp.asarray([[5.0, 5.0], [-5.0, -5.0]], jnp.float32)
    out = grid_sample_2d(grid, far)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(grid[:, 4, 6]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(grid[:, 0, 0]), atol=1e-6)


def test_grid_sample_grads_flow_to_coords_and_grid():
    grid = jnp.asarray(np.random.RandomState(5).rand(2, 8, 8).astype(np.float32))
    coords = jnp.asarray([[0.13, -0.27], [0.5, 0.5]], jnp.float32)
    g_grid, g_coords = jax.grad(
        lambda g, c: grid_sample_2d(g, c).sum(), argnums=(0, 1)
    )(grid, coords)
    assert float(jnp.abs(g_grid).sum()) > 0
    assert float(jnp.abs(g_coords).sum()) > 0


def _grid_sample_autodiff(grid, coords):
    """Naive per-tap formulation: the plain-autodiff ground truth for
    the custom-VJP backward of grid_sample_2d."""
    c, h, w = grid.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (h - 1)
    x = x.clip(0.0, w - 1)
    y = y.clip(0.0, h - 1)
    x0 = jnp.floor(x).clip(0, w - 2)
    y0 = jnp.floor(y).clip(0, h - 2)
    tx, ty = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    flat = grid.reshape(c, h * w)
    idx00 = y0i * w + x0i
    g00, g01 = flat[:, idx00], flat[:, idx00 + 1]
    g10, g11 = flat[:, idx00 + w], flat[:, idx00 + w + 1]
    top = g00 * (1 - tx) + g01 * tx
    bot = g10 * (1 - tx) + g11 * tx
    return (top * (1 - ty) + bot * ty).T


def test_grid_sample_custom_vjp_matches_autodiff():
    rng = np.random.RandomState(7)
    grid = jnp.asarray(rng.randn(3, 9, 13).astype(np.float32))
    # many duplicate cells + border clamps + exact node hits
    coords = np.concatenate([
        rng.uniform(-1.3, 1.3, (400, 2)),
        np.tile(rng.uniform(-1, 1, (1, 2)), (50, 1)),
        np.array([[1.0, 1.0], [-1.0, -1.0], [0.0, 0.0]]),
    ]).astype(np.float32)
    coords = jnp.asarray(coords)
    gout = jnp.asarray(rng.randn(coords.shape[0], 3).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(grid_sample_2d(grid, coords)),
        np.asarray(_grid_sample_autodiff(grid, coords)), atol=1e-5)

    def loss(fn, g, c):
        return jnp.sum(fn(g, c) * gout)

    g_new = jax.grad(lambda g, c: loss(grid_sample_2d, g, c),
                     argnums=(0, 1))(grid, coords)
    g_ref = jax.grad(lambda g, c: loss(_grid_sample_autodiff, g, c),
                     argnums=(0, 1))(grid, coords)
    np.testing.assert_allclose(np.asarray(g_new[0]), np.asarray(g_ref[0]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_new[1]), np.asarray(g_ref[1]),
                               atol=2e-4)


def test_knn_small():
    pts = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [10, 10, 10]])
    d, idx = knn(pts, k=2, block=4)
    assert idx[0, 0] == 0  # self
    assert int(idx[0, 1]) in (1, 2)
    np.testing.assert_allclose(float(d[0, 1]), 1.0, atol=1e-5)


def test_knn_valid_mask():
    pts = jnp.asarray([[0.0, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [0.3, 0, 0]])
    valid = jnp.asarray([True, True, False, True])
    _, idx = knn(pts, k=3, valid=valid, block=4)
    assert 2 not in np.asarray(idx[0])


def test_schedules_match_reference_formulas():
    f = expon_lr(1e-2, 1e-4, max_steps=100)
    np.testing.assert_allclose(float(f(0)), 1e-2, rtol=1e-5)
    np.testing.assert_allclose(float(f(100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(f(50)), 1e-3, rtol=1e-4)
    g = cosine_lr(1.0, 0.2, lr_delay_steps=10, t_max=110)
    np.testing.assert_allclose(float(g(5)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(g(10)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(g(110)), 0.2, rtol=1e-5)
    np.testing.assert_allclose(float(g(60)), 0.6, rtol=1e-5)


def test_knn_window_stat_exact_when_window_covers_all():
    from sings_tpu.ops.knn import knn_window_stat

    rng = np.random.RandomState(3)
    n, k = 128, 5
    pts = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    d, _ = knn(pts, k=k, block=64)
    exact = np.sqrt(np.maximum(np.asarray(d)[:, 1:], 1e-24)).mean(1)
    got = np.asarray(knn_window_stat(pts, k, window=256, block=32))
    np.testing.assert_allclose(got, exact, rtol=1e-5)


def test_knn_window_stat_surface_cloud_accuracy():
    """Morton-window statistic vs exact on a dense capsule cloud.

    Documents the measured accuracy contract of the EXPERIMENTAL
    backend: the Morton curve's true-NN recall is ~85% at window=256
    on dense thin structures (missed neighbors only INFLATE the
    estimate), so the mean statistic error is bounded but not tight —
    which is why trainer 'auto' resolves to the exact dense backend."""
    from sings_tpu.ops.knn import knn_window_stat

    rng = np.random.RandomState(4)
    n, k = 8192, 9
    # capsule surface: cylinder + hemispheres, like a limb
    t = rng.uniform(0, 1, n).astype(np.float32)
    th = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    pts = np.stack([
        0.1 * np.cos(th), t * 1.6, 0.1 * np.sin(th)], -1)
    pts += 0.003 * rng.randn(n, 3)
    pts = jnp.asarray(pts.astype(np.float32))
    d, _ = knn(pts, k=k)
    exact = np.sqrt(np.maximum(np.asarray(d)[:, 1:], 1e-24)).mean(1)
    got = np.asarray(knn_window_stat(pts, k, window=256, block=256))
    rel = (got - exact) / np.maximum(exact, 1e-9)
    assert np.all(rel > -1e-5), rel.min()      # never underestimates
    assert np.abs(rel).mean() < 0.10, np.abs(rel).mean()


def test_knn_window_stat_valid_mask():
    from sings_tpu.ops.knn import knn_window_stat

    rng = np.random.RandomState(5)
    n = 256
    pts = rng.randn(n, 3).astype(np.float32)
    # dead slots parked at a far corner (like pruned gaussians)
    pts[100:140] = 50.0
    valid = np.ones(n, bool)
    valid[100:140] = False
    d, _ = knn(jnp.asarray(pts), k=4, valid=jnp.asarray(valid))
    exact = np.sqrt(np.maximum(np.asarray(d)[:, 1:], 1e-24)).mean(1)
    got = np.asarray(knn_window_stat(
        jnp.asarray(pts), 4, valid=jnp.asarray(valid),
        window=512, block=64))
    np.testing.assert_allclose(got[valid], exact[valid], rtol=1e-5)
    assert np.all(got[~valid] == 0.0)
