"""CUDA-semantics audit tests (VERDICT r1 item 5).

Each test pins ONE convention of graphdeco's diff-gaussian-rasterization
(the reference's external CUDA dependency, gs_renderer_single.py:6-9)
with a HAND-COMPUTED expectation — independent of ops/rasterizer/
reference.py, so the dense compositor itself is under test here, not
used as the oracle. The enumerated rules live in PARITY.md ("CUDA rule
audit").
"""
import jax
import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.graphics import make_camera
from sings_tpu.ops.rasterizer.common import Gaussians2D, preprocess
from sings_tpu.ops.rasterizer.reference import composite_dense
from sings_tpu.ops.sh import sh_to_rgb

HW = 32


def _cam(hw=HW):
    return make_camera(np.eye(4), height=hw, width=hw, fovx=0.9, fovy=0.9)


def _g2d(means2d, conics, colors, opac, depths=None):
    n = len(means2d)
    return Gaussians2D(
        means2d=jnp.asarray(means2d, jnp.float32),
        depths=(jnp.arange(n, dtype=jnp.float32) if depths is None
                else jnp.asarray(depths, jnp.float32)),
        conics=jnp.asarray(conics, jnp.float32),
        colors=jnp.asarray(colors, jnp.float32),
        opacities=jnp.asarray(opac, jnp.float32),
        radii=jnp.full((n,), 100, jnp.int32),
        mask=jnp.ones((n,), bool),
    )


def _pixel(img, x, y):
    return np.asarray(img)[:, y, x]


def test_alpha_saturates_at_099():
    """renderCUDA: alpha = min(0.99f, con_o.w * exp(power)); a fully
    opaque gaussian leaves T = 0.01, never 0."""
    g = _g2d([[8.0, 8.0]], [[0.5, 0.0, 0.5]], [[1.0, 0.0, 0.0]], [1.0])
    bg = jnp.asarray([0.0, 1.0, 0.0])
    img, t = composite_dense(g, HW, HW, bg)
    np.testing.assert_allclose(float(t[8, 8]), 0.01, rtol=1e-6)
    np.testing.assert_allclose(_pixel(img, 8, 8), [0.99, 0.01, 0.0],
                               rtol=1e-6)


def test_alpha_floor_1_255_skips():
    """renderCUDA: if (alpha < 1.0f / 255.0f) continue — a gaussian at
    exactly floor-epsilon contributes NOTHING (not a tiny amount)."""
    # opacity such that alpha at the mean is just under 1/255
    op = 1.0 / 255.0 - 1e-5
    g = _g2d([[8.0, 8.0]], [[0.5, 0.0, 0.5]], [[1.0, 1.0, 1.0]], [op])
    img, t = composite_dense(g, HW, HW, jnp.zeros(3))
    assert float(t[8, 8]) == 1.0
    assert float(img[0, 8, 8]) == 0.0
    # and just over the floor it DOES contribute
    g2 = _g2d([[8.0, 8.0]], [[0.5, 0.0, 0.5]], [[1.0, 1.0, 1.0]],
              [1.0 / 255.0 + 1e-5])
    img2, t2 = composite_dense(g2, HW, HW, jnp.zeros(3))
    assert float(img2[0, 8, 8]) > 0.0


def test_positive_power_skips():
    """renderCUDA: if (power > 0.0f) continue — a non-PD conic (possible
    after the det!=0-only guard) must not contribute exp(power) > 1."""
    g = _g2d([[8.0, 8.0]], [[-0.5, 0.0, -0.5]], [[1.0, 1.0, 1.0]], [1.0])
    img, t = composite_dense(g, HW, HW, jnp.zeros(3))
    # power at pixel (9,8): -0.5*(-0.5*1) = +0.25 > 0 -> skip
    assert float(img[0, 8, 9]) == 0.0
    # at the exact mean power == 0 -> alpha = min(.99, 1) = .99 survives
    np.testing.assert_allclose(float(img[0, 8, 8]), 0.99, rtol=1e-6)


def test_t_eps_termination_excludes_crossing_gaussian():
    """renderCUDA: test_T = T * (1 - alpha); if (test_T < 1e-4) { done =
    true; continue; } — the gaussian that WOULD cross the threshold is
    itself excluded, and everything behind it stays excluded (done
    latches), even later near-zero-alpha gaussians."""
    tight = [0.5, 0.0, 0.5]
    means = [[8.0, 8.0]] * 4
    colors = [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]]
    # a1 = .99 -> T = .01; a2 = .985 -> test_T = 1.5e-4 >= eps, kept,
    # T = 1.5e-4; a3 = .5 -> test_T = 7.5e-5 < eps -> EXCLUDED + done;
    # a4 = .02 would pass the test against the latched T (1.5e-4 * .98
    # = 1.47e-4 >= eps) but `done` keeps it excluded.
    g = _g2d(means, [tight] * 4, colors, [1.0, 0.985, 0.5, 0.02])
    img, t = composite_dense(g, HW, HW, jnp.zeros(3))
    want = np.array([0.99, 0.985 * 0.01, 0.0])
    np.testing.assert_allclose(_pixel(img, 8, 8), want, rtol=1e-4)
    np.testing.assert_allclose(float(t[8, 8]), 0.01 * 0.015, rtol=1e-4)


def test_background_blend_through_final_transmittance():
    """forward.cu final: out = C + T * bg."""
    g = _g2d([[8.0, 8.0]], [[0.5, 0.0, 0.5]], [[0.2, 0.3, 0.4]], [0.5])
    bg = jnp.asarray([1.0, 0.5, 0.25])
    img, t = composite_dense(g, HW, HW, bg)
    a = 0.5  # alpha at the mean
    want = a * np.array([0.2, 0.3, 0.4]) + (1 - a) * np.asarray(bg)
    np.testing.assert_allclose(_pixel(img, 8, 8), want, rtol=1e-6)


def test_equal_depth_ties_keep_index_order():
    """The CUDA radix sort is stable on equal depth keys, so duplication
    (= gaussian index) order decides; compositing is not commutative."""
    tight = [0.5, 0.0, 0.5]
    g = _g2d([[8.0, 8.0]] * 2, [tight] * 2, [[1, 0, 0], [0, 1, 0]],
             [0.5, 0.5], depths=[1.0, 1.0])
    img, _ = composite_dense(g, HW, HW, jnp.zeros(3))
    np.testing.assert_allclose(_pixel(img, 8, 8), [0.5, 0.25, 0.0],
                               rtol=1e-6)


def test_frustum_cull_z_02():
    """preprocessCUDA in_frustum: p_view.z <= 0.2f culled."""
    cam = _cam()
    means = jnp.asarray([[0.0, 0.0, 0.19], [0.0, 0.0, 0.21]])
    scales = jnp.full((2, 3), 0.01)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1))
    g = preprocess(means, scales, quats, jnp.ones(2), jnp.ones((2, 3)), cam)
    assert not bool(g.mask[0])
    assert int(g.radii[0]) == 0
    assert bool(g.mask[1])


def test_dilation_radius_and_conic_closed_form():
    """computeCov2D: +0.3 diagonal dilation; conic = inverse of the
    DILATED cov; radius = ceil(3 sqrt(lambda_max)) with the 0.1 floor
    under the discriminant sqrt. Closed form for an isotropic gaussian
    on the optical axis: cov2d = diag((s*f/z)^2 + 0.3)."""
    cam = _cam()
    s, z = 0.05, 3.0
    g = preprocess(jnp.asarray([[0.0, 0.0, z]]), jnp.full((1, 3), s),
                   jnp.asarray([[1.0, 0, 0, 0]]), jnp.ones(1),
                   jnp.ones((1, 3)), cam)
    fx = cam.width / (2 * cam.tan_fovx)
    c = (s * fx / z) ** 2 + 0.3
    np.testing.assert_allclose(np.asarray(g.conics[0]),
                               [1.0 / c, 0.0, 1.0 / c], rtol=1e-5)
    # lambda_max = mid + sqrt(max(0.1, mid^2 - det)); equal eigenvalues
    # hit the 0.1 floor: lam = c + sqrt(0.1)
    want_r = np.ceil(3.0 * np.sqrt(c + np.sqrt(0.1)))
    assert int(g.radii[0]) == int(want_r)


def test_ndc2pix_convention():
    """ndc2Pix(v, S) = ((v + 1) * S - 1) * 0.5: the optical axis lands at
    (S - 1) / 2, not S / 2."""
    cam = _cam()
    g = preprocess(jnp.asarray([[0.0, 0.0, 2.0]]), jnp.full((1, 3), 0.01),
                   jnp.asarray([[1.0, 0, 0, 0]]), jnp.ones(1),
                   jnp.ones((1, 3)), cam)
    np.testing.assert_allclose(np.asarray(g.means2d[0]),
                               [(HW - 1) / 2.0, (HW - 1) / 2.0], atol=1e-4)


def test_offscreen_empty_rect_cull():
    """preprocessCUDA returns before writing radius when the getRect
    area is zero: an in-frustum gaussian whose 3-sigma rect misses the
    screen must have radii == 0 / visibility False (gates the trainer's
    density statistics)."""
    cam = _cam()
    # far to the side but still z > 0.2: projects way off-screen
    g = preprocess(jnp.asarray([[50.0, 0.0, 2.0], [0.0, 0.0, 2.0]]),
                   jnp.full((2, 3), 0.01),
                   jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)),
                   jnp.ones(2), jnp.ones((2, 3)), cam)
    assert int(g.radii[0]) == 0 and not bool(g.mask[0])
    assert int(g.radii[1]) > 0 and bool(g.mask[1])


def test_sh_clamp_backward_zeroes_gradient():
    """computeColorFromSH clamps rgb at 0 and the backward zeroes
    dL/dsh on clamped channels."""
    sh = jnp.zeros((1, 16, 3)).at[0, 0, 0].set(-10.0).at[0, 0, 1].set(1.0)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])

    def f(sh):
        return jnp.sum(sh_to_rgb(3, sh, dirs))

    g = jax.grad(f)(sh)
    assert float(g[0, 0, 0]) == 0.0      # clamped channel
    assert float(g[0, 0, 1]) != 0.0      # active channel


def test_tangent_plane_clamp_13():
    """computeCov2D clamps the view-space tangents to 1.3 * tan_fov
    before building the Jacobian: two gaussians beyond the clamp at the
    same depth get the SAME covariance."""
    cam = _cam()
    # x/z = 1.0 and 1.4, both beyond 1.3 * tan(0.45) ~ 0.63
    means = jnp.asarray([[2.0, 0.0, 2.0], [2.8, 0.0, 2.0]])
    scales = jnp.full((2, 3), 0.05)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1))
    g = preprocess(means, scales, quats, jnp.ones(2), jnp.ones((2, 3)), cam)
    np.testing.assert_allclose(np.asarray(g.conics[0]),
                               np.asarray(g.conics[1]), rtol=1e-6)


def test_backward_ignores_099_clamp_quirk():
    """backward.cu computes dL_dG = con_o.w * dL_dalpha and dL_dopacity
    = G * dL_dalpha even when alpha saturated at 0.99 — i.e. the clamp
    is NOT treated as a gradient gate. With opacity 1.0 at the mean
    (alpha clamped), d(pixel)/d(opacity) must be nonzero."""
    def f(op):
        g = _g2d([[8.0, 8.0]], [[0.5, 0.0, 0.5]], [[1.0, 1.0, 1.0]],
                 [op[0]])
        img, _ = composite_dense(g, HW, HW, jnp.zeros(3))
        return img[0, 8, 8]

    grad = float(jax.grad(f)(jnp.asarray([1.0]))[0])
    # quirk: d alpha / d op = exp(power) = 1 at the mean (not 0)
    np.testing.assert_allclose(grad, 1.0, rtol=1e-5)
