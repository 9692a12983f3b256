"""Numeric parity against the ACTUAL reference code (CPU torch).

The reference repo at /root/reference is pure Python/torch for these
modules, so they run on the baked-in CPU torch; each test feeds both
implementations identical random inputs and requires allclose. Modules
whose imports need external packages (pytorch3d, smplx, trimesh,
torchvision) are covered elsewhere by golden/formula tests.

A tiny no-op `loguru` stub is installed in sys.modules (the reference
imports it for logging only) — this reads reference BEHAVIOR, it does
not execute any instructions from it.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "sings")),
                                reason="reference repo not present")

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)
if "loguru" not in sys.modules:
    _stub = types.ModuleType("loguru")

    class _L:
        def __getattr__(self, name):
            return lambda *a, **k: None

    _stub.logger = _L()
    sys.modules["loguru"] = _stub
if "omegaconf" not in sys.modules:
    try:
        import omegaconf  # noqa: F401
    except ImportError:
        _oc = types.ModuleType("omegaconf")
        _oc.OmegaConf = object
        sys.modules["omegaconf"] = _oc

import jax.numpy as jnp  # noqa: E402

RTOL, ATOL = 1e-5, 1e-5
rng = np.random.RandomState(7)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _close(ours, ref, atol=ATOL, rtol=RTOL):
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               rtol=rtol, atol=atol)


# ---------------------------------------------------------------- rotations
def _random_aa(n=64):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(-np.pi + 1e-3, np.pi - 1e-3, (n, 1))
    return (axis * angle).astype(np.float32)


def test_rotation_conversions_match_reference():
    from sings.rec.utils.geometry import rotations as R

    from sings_tpu.ops import rotations as ours

    aa = _random_aa()
    m_ref = R.axis_angle_to_matrix(_t(aa))
    _close(ours.axis_angle_to_matrix(jnp.asarray(aa)), m_ref)

    q_ref = R.axis_angle_to_quaternion(_t(aa))
    _close(ours.axis_angle_to_quaternion(jnp.asarray(aa)), q_ref)

    _close(ours.quaternion_to_matrix(jnp.asarray(q_ref.numpy())),
           R.quaternion_to_matrix(q_ref))

    d6_ref = R.matrix_to_rotation_6d(m_ref)
    _close(ours.matrix_to_rotation_6d(jnp.asarray(m_ref.numpy())), d6_ref)
    _close(ours.rotation_6d_to_matrix(jnp.asarray(d6_ref.numpy())),
           R.rotation_6d_to_matrix(d6_ref))

    _close(ours.matrix_to_quaternion(jnp.asarray(m_ref.numpy())),
           R.matrix_to_quaternion(m_ref))
    _close(ours.quaternion_to_axis_angle(jnp.asarray(q_ref.numpy())),
           R.quaternion_to_axis_angle(q_ref), atol=1e-4)

    # matrix_to_axis_angle: ours standardizes to |angle| <= pi; the
    # reference can emit |angle| > pi near pi (matrix_to_quaternion may
    # pick a negative-real candidate). Same rotation, different vector
    # (documented deviation, PARITY.md) — compare as rotations.
    aa_ref = R.matrix_to_axis_angle(m_ref)
    aa_our = ours.matrix_to_axis_angle(jnp.asarray(m_ref.numpy()))
    _close(ours.axis_angle_to_matrix(aa_our),
           R.axis_angle_to_matrix(aa_ref), atol=1e-4)


def test_quaternion_algebra_matches_reference():
    from sings.rec.utils.geometry import rotations as R

    from sings_tpu.ops import rotations as ours

    qa = R.axis_angle_to_quaternion(_t(_random_aa(32)))
    qb = R.axis_angle_to_quaternion(_t(_random_aa(32)))
    pts = rng.normal(size=(32, 3)).astype(np.float32)

    _close(ours.quaternion_multiply(jnp.asarray(qa.numpy()),
                                    jnp.asarray(qb.numpy())),
           R.quaternion_multiply(qa, qb))
    _close(ours.quaternion_apply(jnp.asarray(qa.numpy()), jnp.asarray(pts)),
           R.quaternion_apply(qa, _t(pts)), atol=1e-4)


# ----------------------------------------------------------------- graphics
def test_projection_matrices_match_reference():
    from sings.rec.utils import graphics as G

    from sings_tpu.ops import graphics as ours

    p_ref = G.get_projection_matrix(0.01, 100.0, 0.9, 1.1)
    np.testing.assert_allclose(ours.projection_matrix(0.01, 100.0, 0.9, 1.1),
                               p_ref.numpy(), rtol=1e-6, atol=1e-6)

    pc_ref = G.get_projection_matrix_center(
        0.01, 100.0, fx=500.0, fy=480.0, cx=250.0, cy=270.0,
        width=512, height=540)
    np.testing.assert_allclose(
        ours.projection_matrix_center(0.01, 100.0, 500.0, 480.0, 250.0,
                                      270.0, 512, 540),
        pc_ref.numpy(), rtol=1e-6, atol=1e-6)

    assert ours.fov2focal(0.9, 512) == pytest.approx(G.fov2focal(0.9, 512))
    assert ours.focal2fov(500.0, 512) == pytest.approx(G.focal2fov(500.0, 512))


# ----------------------------------------------------------------- triplane
def test_hexplane_features_match_reference():
    from sings.rec.models.modules.hexplane import HexPlaneField

    from sings_tpu.fields.triplane import TriplaneConfig, triplane_features

    planeconfig = {
        "grid_dimensions": 2,
        "input_coordinate_dim": 3,
        "output_coordinate_dim": 8,
        "resolution": [16, 20, 24],
        "multires": [1, 2],
    }
    torch.manual_seed(0)
    field = HexPlaneField(planeconfig, bounds=1.3, device="cpu")

    cfg = TriplaneConfig(resolution=(16, 20, 24), out_dim=8,
                         multires=(1, 2), bounds=1.3)
    grids = [[jnp.asarray(p.detach().numpy()[0]) for p in scale]
             for scale in field.grids]
    params = {"grids": grids}

    pts = rng.uniform(-1.6, 1.6, (200, 3)).astype(np.float32)  # incl. border
    ref = field(_t(pts))
    out = triplane_features(params, jnp.asarray(pts), cfg)
    _close(out, ref, atol=1e-5)


# ----------------------------------------------------------------- decoders
def _copy_linear(ref_linear):
    return {"w": jnp.asarray(ref_linear.weight.detach().numpy().T),
            "b": jnp.asarray(ref_linear.bias.detach().numpy())}


def test_geometry_decoder_matches_reference():
    from sings.rec.models.modules.decoders import GeometryDecoder

    from sings_tpu.fields.decoders import DecoderConfig, geometry_decoder

    torch.manual_seed(1)
    for iso in (True, False):
        ref = GeometryDecoder(n_features=48, isotropic=iso, hidden_dim=32)
        p = {
            "net0": _copy_linear(ref.net[0]),
            "net1": _copy_linear(ref.net[2]),
            "xyz": _copy_linear(ref.xyz_offsets),
            "scales0": _copy_linear(ref.scales[0]),
            "scales1": _copy_linear(ref.scales[2]),
        }
        if not iso:
            p["rot"] = _copy_linear(ref.rotations[0])
        cfg = DecoderConfig(n_features=48, isotropic=iso, geo_hidden=32)
        x = rng.normal(size=(64, 48)).astype(np.float32)
        r = ref(_t(x))
        o = geometry_decoder(p, jnp.asarray(x), cfg)
        for k in ("xyz_offsets", "scales", "scales_aux"):
            _close(o[k], r[k], atol=1e-5)
        if not iso:
            _close(o["rotations"], r["rotations"], atol=1e-5)


def test_appearance_decoder_matches_reference():
    from sings.rec.models.modules.decoders import AppearanceDecoder

    from sings_tpu.fields.decoders import DecoderConfig, appearance_decoder

    torch.manual_seed(2)
    ref = AppearanceDecoder(n_features=48, hidden_dim=32)
    p = {
        "net0": _copy_linear(ref.net[0]),
        "net1": _copy_linear(ref.net[2]),
        "shs": _copy_linear(ref.shs),
        "opacity": _copy_linear(ref.opacity),
    }
    cfg = DecoderConfig(n_features=48, app_hidden=32)
    x = rng.normal(size=(64, 48)).astype(np.float32)
    r = ref(_t(x))
    o = appearance_decoder(p, jnp.asarray(x), cfg)
    _close(o["shs"].reshape(-1, 16, 3), r["shs"], atol=1e-5)
    _close(o["opacity"], r["opacity"], atol=1e-5)

    # opacity reset floor: offset = where(pre > 0, 0, -pre), sigmoid >= 0.5
    ref.reset_opacity(_t(x))
    r2 = ref(_t(x))
    pre = np.asarray(o["opacity_aux"]) if "opacity_aux" in o else None
    o2 = appearance_decoder(
        p, jnp.asarray(x), cfg,
        opacity_offset=jnp.asarray(ref.opacity_offset.detach().numpy()))
    _close(o2["opacity"], r2["opacity"], atol=1e-5)
    assert float(np.asarray(o2["opacity"]).min()) >= 0.5 - 1e-5
    del pre


# -------------------------------------------------------------- lr schedule
def test_expon_lr_matches_reference():
    from sings.rec.utils.general import get_expon_lr_func

    from sings_tpu.ops.schedules import expon_lr

    ref = get_expon_lr_func(1.6e-4, 1.6e-6, lr_delay_steps=500,
                            lr_delay_mult=0.01, max_steps=12000)
    ours = expon_lr(1.6e-4, 1.6e-6, lr_delay_steps=500, lr_delay_mult=0.01,
                    max_steps=12000)
    for step in (-5, 0, 1, 250, 500, 1000, 6000, 12000, 20000):
        assert float(ours(step)) == pytest.approx(ref(step), rel=1e-6), step


# ------------------------------------------------------------ pcd projector
def test_point_projection_matches_reference():
    from sings.rec.utils.geometry.pcd_projector import pcd_3d_to_pcd_2d_torch

    from sings_tpu.ops.projection import project_points

    pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    K = np.array([[500.0, 0, 256], [0, 480.0, 260], [0, 0, 1]], np.float32)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, 3] = [0.1, -0.2, 0.3]

    ref = pcd_3d_to_pcd_2d_torch(
        _t(pts).T[None], _t(K)[None], _t(ext)[None],
        size=torch.tensor([[512.0, 512.0]]), keep_z=True,
        crop=False, filter_neg=False, norm_coord=False)
    ours = project_points(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(ext))
    np.testing.assert_allclose(np.asarray(ours).T, ref[0].numpy(),
                               rtol=1e-4, atol=1e-4)


# ----------------------------------------------------------- camera factory
def test_rotating_camera_rig_matches_reference():
    from sings.rec.datasets.utils import get_rotating_camera

    from sings_tpu.data.cameras import get_rotating_cameras

    ref = get_rotating_camera(img_size=256, fov=0.5, dist=4.0, device="cpu",
                              nframes=6)
    ours = get_rotating_cameras(img_size=256, fov=0.5, dist=4.0, nframes=6)
    assert len(ref) == len(ours)
    for rd, cam in zip(ref, ours):
        np.testing.assert_allclose(cam.view,
                                   rd["world_view_transform"].numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(cam.proj,
                                   rd["full_proj_transform"].numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(cam.cam_center,
                                   rd["camera_center"].numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_predefined_poses_match_reference():
    from sings.rec.datasets.utils import get_predefined_pose

    from sings_tpu.kinematics.poses import predefined_pose

    for pose in ("da_pose", "a_pose", "little_a_pose", "t_pose"):
        ref = get_predefined_pose(pose, device="cpu")
        np.testing.assert_allclose(predefined_pose(pose),
                                   ref[0].numpy(), atol=0)


# --------------------------------------------------------------------- SH
def test_sh_eval_matches_reference():
    """The reference SH module calls .cuda() at import; a no-op .cuda
    monkeypatch (CPU passthrough) lets its hardcoded coefficient tables
    and basis evaluation run unmodified."""
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        from sings.rec.utils.visualize import spherical_harmonics as S
    finally:
        torch.Tensor.cuda = orig

    from sings_tpu.ops.sh import eval_sh, rgb2sh, sh2rgb

    sh = rng.normal(size=(40, 3, 16)).astype(np.float32)
    dirs = rng.normal(size=(40, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    for deg in range(4):
        ref = S.eval_sh(deg, _t(sh), _t(dirs), S.C0, S.C1, S.C2, S.C3, S.C4)
        # ours takes (..., K, C); the reference takes (..., C, K)
        out = eval_sh(deg, jnp.asarray(sh.transpose(0, 2, 1)),
                      jnp.asarray(dirs))
        _close(out, ref, atol=1e-5)

    rgb = rng.rand(20, 3).astype(np.float32)
    _close(rgb2sh(jnp.asarray(rgb)), S.RGB2SH(_t(rgb)))
    _close(sh2rgb(rgb2sh(jnp.asarray(rgb))), _t(rgb))
