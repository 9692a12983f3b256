import jax.numpy as jnp
import numpy as np

from sings_tpu.kinematics.amass import load_motion, manual_alignment
from sings_tpu.kinematics.body_model import (
    load_template, subdivide_template, synthetic_template,
)
from sings_tpu.kinematics.lbs import lbs, lbs_extra
from sings_tpu.kinematics.poses import predefined_pose
from sings_tpu.kinematics.template import (
    DeviceTemplate, canonical_pose_cache, smpl_forward,
)


def get_tpl():
    return synthetic_template(num_betas=10, n_seg=4, n_ring=8)


def test_synthetic_template_valid():
    tpl = get_tpl()
    assert tpl.num_verts > 500
    assert tpl.faces.min() >= 0 and tpl.faces.max() < tpl.num_verts
    w = tpl.lbs_weights
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)
    np.testing.assert_allclose(tpl.j_regressor.sum(1), 1.0, atol=1e-5)
    assert set(np.unique(tpl.vertex_label)) <= set(range(15))


def test_rest_pose_is_identity():
    tpl = get_tpl()
    dt = DeviceTemplate.from_host(tpl)
    betas = jnp.zeros((1, 10))
    pose = jnp.zeros((1, 69))
    out = smpl_forward(dt, betas, pose)
    np.testing.assert_allclose(
        np.asarray(out.verts[0]), tpl.v_template, atol=1e-5
    )
    # A should be identity at rest
    np.testing.assert_allclose(
        np.asarray(out.A[0]),
        np.broadcast_to(np.eye(4), out.A[0].shape), atol=1e-5,
    )


def test_global_orient_rotates_rigidly():
    tpl = get_tpl()
    dt = DeviceTemplate.from_host(tpl)
    betas = jnp.zeros((1, 10))
    pose = jnp.zeros((1, 69))
    aa = jnp.array([[0.0, jnp.pi / 2, 0.0]])
    out = smpl_forward(dt, betas, pose, aa)
    from sings_tpu.ops.rotations import axis_angle_to_matrix
    Rm = np.asarray(axis_angle_to_matrix(aa[0]))
    # root joint at pelvis: rotation is about the root joint location
    root = tpl.j_regressor[0] @ tpl.v_template
    expect = (tpl.v_template - root) @ Rm.T + root
    np.testing.assert_allclose(np.asarray(out.verts[0]), expect, atol=1e-4)


def test_elbow_bend_moves_only_arm():
    tpl = get_tpl()
    dt = DeviceTemplate.from_host(tpl)
    betas = jnp.zeros((1, 10))
    pose = jnp.zeros((1, 69))
    # joint 18 = left elbow -> body_pose index (18-1)*3 = 51
    pose = pose.at[0, 51 + 2].set(1.2)
    out = smpl_forward(dt, betas, pose)
    disp = np.linalg.norm(np.asarray(out.verts[0]) - tpl.v_template, axis=1)
    moved = disp > 1e-4
    labels = tpl.vertex_label
    # only lower-left-arm (4) and left-hand (6) regions move
    assert set(np.unique(labels[moved])) <= {2, 4, 6}
    assert moved.sum() > 10


def test_lbs_extra_roundtrip():
    """A then inv(A) must restore points; cano cache composes correctly."""
    tpl = get_tpl()
    dt = DeviceTemplate.from_host(tpl)
    betas = jnp.zeros(10)
    cache = canonical_pose_cache(dt, betas, "da_pose")
    # posing canonical verts with A_t2pose @ inv(A_t2cano) at pose==cano
    # must be the identity
    A = cache.A_t2cano @ cache.inv_A_t2cano
    verts, T = lbs_extra(A[None], cache.canonical_verts[None],
                         dt.lbs_weights)
    np.testing.assert_allclose(
        np.asarray(verts[0]), np.asarray(cache.canonical_verts), atol=1e-4
    )

    # full pipeline: canonical -> t-pose -> new pose equals direct lbs
    pose = jnp.asarray(predefined_pose("a_pose"))[None]
    out = smpl_forward(dt, betas[None], pose, disable_posedirs=False)
    A2 = out.A[0] @ cache.inv_A_t2cano
    verts2, _ = lbs_extra(A2[None], cache.canonical_verts[None],
                          dt.lbs_weights)
    np.testing.assert_allclose(
        np.asarray(verts2[0]), np.asarray(out.verts[0]), atol=1e-4
    )


def test_subdivision_grows_and_preserves_weights():
    tpl = get_tpl()
    sub = subdivide_template(tpl, 1, smooth=True)
    assert sub.num_verts > tpl.num_verts
    np.testing.assert_allclose(sub.lbs_weights.sum(1), 1.0, atol=1e-5)
    np.testing.assert_allclose(sub.j_regressor.sum(1), 1.0, atol=1e-5)
    assert sub.faces.max() < sub.num_verts
    # labels preserved in range
    assert set(np.unique(sub.vertex_label)) <= set(range(15))


def test_load_template_fallback():
    tpl = load_template("/nonexistent", "smpl", n_subdivision=0)
    assert tpl.name == "synthetic"
    tplh = load_template(None, "smplh")
    assert tplh.num_joints == 52
    np.testing.assert_allclose(tplh.lbs_weights.sum(1), 1.0, atol=1e-5)


def test_amass_loading():
    m = load_motion(
        "/root/reference/data/animation/AMASS/SFU/0008/0008_Walking002_poses.npz",
        motion_type="AMASS", start=0, end=100, skip=4)
    assert m["body_pose"].shape == (25, 69)
    assert m["global_orient"].shape == (25, 3)
    # rebased: first-frame translation at origin +20 z
    np.testing.assert_allclose(m["transl"][0], [0, 0, 20.0], atol=1e-5)
    t, r, s = manual_alignment("AMASS")
    assert s == 0.5


def test_custom_motion_loading():
    m = load_motion(
        "/root/reference/data/animation/custom/output_motions_kunkun.npz",
        motion_type="custom", start=0, end=40, skip=2)
    assert m["body_pose"].shape[1] == 69


def test_smplh_hand_pca_projection():
    """full_pose with MANO data: hands = coeffs @ components[:C] +
    hands_mean (smplh_layer.py:307-317 with flat_hand_mean=False
    default: zero coefficients still give the MANO mean pose)."""
    import numpy as np

    from sings_tpu.kinematics.body_model import synthetic_template
    from sings_tpu.kinematics.template import DeviceTemplate, full_pose

    tpl = synthetic_template(10, hands=True)
    rng = np.random.RandomState(0)
    hc = rng.randn(2, 12, 45).astype(np.float32)
    hm = rng.randn(2, 45).astype(np.float32) * 0.1
    tpl = tpl._replace(hands_components=hc, hands_mean=hm)
    dt = DeviceTemplate.from_host(tpl)
    assert dt.hands_components is not None

    b = 2
    go = jnp.asarray(rng.randn(b, 3).astype(np.float32))
    body = jnp.asarray(rng.randn(b, 63).astype(np.float32))
    lh = jnp.asarray(rng.randn(b, 6).astype(np.float32))
    rh = jnp.asarray(rng.randn(b, 6).astype(np.float32))

    fp = np.asarray(full_pose(dt, go, body, lh, rh))
    nj = dt.parents.shape[0]
    assert fp.shape == (b, nj * 3)
    want_l = np.asarray(lh) @ hc[0, :6] + hm[0]
    want_r = np.asarray(rh) @ hc[1, :6] + hm[1]
    np.testing.assert_allclose(fp[:, 66:111], want_l, rtol=1e-5)
    np.testing.assert_allclose(fp[:, 111:156], want_r, rtol=1e-5)

    # zero coefficients -> mean pose (flat_hand_mean=False), and
    # omitted coefficients behave the same
    fp0 = np.asarray(full_pose(dt, go, body))
    np.testing.assert_allclose(fp0[:, 66:111],
                               np.broadcast_to(hm[0], (b, 45)), rtol=1e-6)
    # templates without MANO data keep zero hands
    dt2 = dt._replace(hands_components=None, hands_mean=None)
    fpz = np.asarray(full_pose(dt2, go, body))
    assert (fpz[:, 66:] == 0).all()
