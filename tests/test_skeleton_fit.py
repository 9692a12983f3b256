"""Synthetic-template bone-proportion dims + keypoint skeleton fit."""
import jax.numpy as jnp
import numpy as np

from sings_tpu.kinematics.body_model import (_BONE_GROUPS,
                                             subdivide_template,
                                             synthetic_template)
from sings_tpu.kinematics.lbs import blend_shapes, vertices2joints
from sings_tpu.kinematics.template import DeviceTemplate
from sings_tpu.preprocess.refine import (SkeletonFitConfig,
                                         coco133_body_targets,
                                         fit_skeleton, posed_smpl_joints)

N_BONE = len(_BONE_GROUPS) + 1


def _joints(tpl, betas):
    v = tpl.v_template[None] + np.asarray(
        blend_shapes(jnp.asarray(betas)[None], jnp.asarray(tpl.shapedirs)))
    return np.asarray(vertices2joints(
        jnp.asarray(tpl.j_regressor), jnp.asarray(v)))[0]


def test_bone_betas_move_expected_joints():
    tpl = synthetic_template(num_betas=4, n_seg=5, n_ring=8,
                             n_bone_betas=N_BONE)
    assert tpl.num_betas == 4 + N_BONE
    assert tpl.n_bone_betas == N_BONE

    j0 = _joints(tpl, np.zeros(tpl.num_betas))
    b = np.zeros(tpl.num_betas, np.float32)
    b[4] = 1.0  # torso group
    j1 = _joints(tpl, b)
    # head (15) moves up with the torso stretch; pelvis (0) stays
    assert j1[15, 1] - j0[15, 1] > 0.05
    assert np.abs(j1[0] - j0[0]).max() < 0.02
    # legs unaffected by torso stretch
    assert np.abs(j1[4] - j0[4]).max() < 0.02

    b = np.zeros(tpl.num_betas, np.float32)
    b[4 + 6] = 1.0  # thighs group -> knees (4, 5) drop, hips stay
    j2 = _joints(tpl, b)
    assert j0[4, 1] - j2[4, 1] > 0.03
    assert j0[5, 1] - j2[5, 1] > 0.03
    assert np.abs(j2[1] - j0[1]).max() < 0.02
    # ankles follow the knees (downstream translation)
    assert j0[7, 1] - j2[7, 1] > 0.03

    # hip width (last column): hips move apart in x
    b = np.zeros(tpl.num_betas, np.float32)
    b[-1] = 1.0
    j3 = _joints(tpl, b)
    assert (j3[1, 0] - j3[2, 0]) - (j0[1, 0] - j0[2, 0]) > 0.05


def test_bone_betas_exact_under_subdivision():
    tpl = synthetic_template(num_betas=4, n_seg=4, n_ring=6,
                             n_bone_betas=N_BONE)
    sub = subdivide_template(tpl, 1, smooth=False)
    assert sub.num_betas == tpl.num_betas
    assert sub.n_bone_betas == N_BONE
    b = np.zeros(tpl.num_betas, np.float32)
    b[4] = 0.7
    b[-1] = -0.3
    # joints regressed from the subdivided template match the base ones
    j_base = _joints(tpl, b)
    j_sub = _joints(sub, b)
    assert np.abs(j_base - j_sub).max() < 0.02


def test_coco133_body_targets():
    f = 3
    kp = np.random.rand(f, 133, 2).astype(np.float32) * 100
    scores = np.full((f, 133), 0.9, np.float32)
    scores[0, 11] = 0.5  # low-confidence left hip on frame 0
    t, w = coco133_body_targets(kp, scores)
    assert t.shape == (f, 24, 2) and w.shape == (f, 24)
    assert w[0, 1] == 0.0 and w[1, 1] > 0.0
    assert np.allclose(t[1, 1], kp[1, 11])
    # head anchored at ear midpoint
    assert np.allclose(t[2, 15], 0.5 * (kp[2, 3] + kp[2, 4]))
    assert w.max() <= 1.0


def test_fit_skeleton_recovers_bone_lengths():
    tpl = synthetic_template(num_betas=4, n_seg=4, n_ring=6,
                             n_bone_betas=N_BONE)
    dt = DeviceTemplate.from_host(tpl)
    f = 4
    rng = np.random.RandomState(0)
    true = {
        "betas": np.zeros(tpl.num_betas, np.float32),
        "global_orient": np.zeros((f, 3), np.float32),
        "body_pose": (0.05 * rng.randn(f, 69)).astype(np.float32),
        "transl": np.tile(np.array([[0.0, 0.3, 8.0]], np.float32), (f, 1)),
    }
    true["betas"][4] = 1.2   # longer torso
    true["betas"][4 + 6] = -0.8  # shorter thighs

    K = np.array([[1000.0, 0, 128], [0, 1000.0, 224], [0, 0, 1]],
                 np.float32)
    joints = np.asarray(posed_smpl_joints(
        dt, {k: jnp.asarray(v) for k, v in true.items()}))
    uvw = joints @ K.T
    targets = (uvw[..., :2] / uvw[..., 2:]).astype(np.float32)
    weights = np.ones((f, 24), np.float32)

    init = dict(true)
    init["betas"] = np.zeros(tpl.num_betas, np.float32)
    beta_mask = np.zeros(tpl.num_betas, np.float32)
    beta_mask[0] = 1.0
    beta_mask[-N_BONE:] = 1.0
    res = fit_skeleton(dt, K, init, targets, weights,
                       SkeletonFitConfig(steps=300, lr=0.03,
                                         w_pose_prior=10.0),
                       beta_mask=beta_mask)
    assert res["px_err"][-1] < 0.2 * res["px_err"][0]
    # frozen dims untouched
    assert np.all(res["betas"][1:4] == 0.0)
    # recovered proportions point the right way
    assert res["betas"][4] > 0.4
    assert res["betas"][4 + 6] < -0.25


def test_refine_smpl_keeps_converged_keypoints():
    """Regression: stage B must not walk away from a converged stage-A
    start (the minibatched keypoint term diverged under Adam on the
    bundled kit: loss 0.57 -> 7.7 over 200 steps)."""
    from sings_tpu.preprocess.refine import RefineConfig, refine_smpl

    tpl = synthetic_template(num_betas=4, n_seg=4, n_ring=6,
                             n_bone_betas=N_BONE)
    dt = DeviceTemplate.from_host(tpl)
    f = 6
    rng = np.random.RandomState(1)
    true = {
        "betas": np.zeros(tpl.num_betas, np.float32),
        "global_orient": np.zeros((f, 3), np.float32),
        "body_pose": (0.05 * rng.randn(f, 69)).astype(np.float32),
        "transl": np.tile(np.array([[0.0, 0.3, 8.0]], np.float32),
                          (f, 1)),
    }
    K = np.array([[1000.0, 0, 64], [0, 1000.0, 64], [0, 0, 1]],
                 np.float32)
    joints = np.asarray(posed_smpl_joints(
        dt, {k: jnp.asarray(v) for k, v in true.items()}))
    uvw = joints @ K.T
    targets = (uvw[..., :2] / uvw[..., 2:]).astype(np.float32)
    weights = np.ones((f, 24), np.float32)

    from sings_tpu.ops.graphics import make_camera
    cam = make_camera(np.eye(4, dtype=np.float32), 128, 128, K=K)
    masks = np.zeros((f, 128, 128), np.float32)
    kw = dict(tile=16, chunk=8, max_span=8, interpret=True)
    # kp-only (w_silhouette=0 exercises the trace-time gate too),
    # minibatched frames, starting AT the optimum
    cfg = RefineConfig(steps=60, lr=0.01, render_downscale=1,
                       w_silhouette=0.0, w_keypoints=1.0, w_prior=0.01,
                       batch_frames=2, optimize_betas=True)
    res = refine_smpl(dt, cam, K, true, masks, keypoints2d=targets,
                      keypoint_valid=weights, cfg=cfg, raster_kw=kw)
    j2 = np.asarray(posed_smpl_joints(
        dt, {k: jnp.asarray(res[k]) for k in true}))
    uv2 = (j2 @ K.T)
    uv2 = uv2[..., :2] / uv2[..., 2:]
    px = np.sqrt(((uv2 - targets) ** 2).sum(-1)).mean()
    assert px < 1.0, px
    assert res["losses"][-1] <= res["losses"][0] + 1e-3


def _head_rot_angles(dt, params, true_params):
    """Per-frame head-rotation deviation (deg) between two param sets."""
    import jax
    _, r_fit = posed_smpl_joints(
        dt, {k: jnp.asarray(v) for k, v in params.items()
             if k != "face_offsets"}, return_head_rot=True)
    _, r_true = posed_smpl_joints(
        dt, {k: jnp.asarray(v) for k, v in true_params.items()},
        return_head_rot=True)
    rel = jnp.einsum("fxy,fzy->fxz", r_fit, r_true)
    tr = rel[:, 0, 0] + rel[:, 1, 1] + rel[:, 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return np.degrees(np.asarray(jnp.arccos(cos)))


def test_face_anchors_recover_head_yaw():
    """2D joint targets alone cannot constrain head ROTATION (the ear
    midpoint is yaw-invariant); the rigid face anchors must. GT head
    yaw sweeps across frames; the init zeroes it. Fit WITH anchors
    recovers the per-frame head rotation; WITHOUT them it cannot."""
    from sings_tpu.preprocess.refine import (FACE_ANCHOR_INIT,
                                             face_anchor_targets)

    tpl = synthetic_template(num_betas=4, n_seg=4, n_ring=6,
                             n_bone_betas=N_BONE)
    dt = DeviceTemplate.from_host(tpl)
    f = 8
    rng = np.random.RandomState(2)
    body_pose = (0.02 * rng.randn(f, 69)).astype(np.float32)
    yaw = np.linspace(-0.6, 0.6, f).astype(np.float32)  # head joint 15
    body_pose[:, 3 * 14 + 1] = yaw  # body_pose joint j is cols 3(j-1)
    true = {
        "betas": np.zeros(tpl.num_betas, np.float32),
        "global_orient": np.zeros((f, 3), np.float32),
        "body_pose": body_pose,
        "transl": np.tile(np.array([[0.0, 0.3, 8.0]], np.float32),
                          (f, 1)),
    }
    K = np.array([[1000.0, 0, 128], [0, 1000.0, 224], [0, 0, 1]],
                 np.float32)
    tp = {k: jnp.asarray(v) for k, v in true.items()}
    joints, head_rot = posed_smpl_joints(dt, tp, return_head_rot=True)
    joints = np.asarray(joints)
    uvw = joints @ K.T
    targets = (uvw[..., :2] / uvw[..., 2:]).astype(np.float32)
    weights = np.ones((f, 24), np.float32)

    # face keypoints from the GT anchors at slightly NON-default offsets
    # (the fit must calibrate them, not just reuse its init)
    off_true = FACE_ANCHOR_INIT + np.float32(0.01)
    anchors = (joints[:, 15][:, None, :]
               + np.einsum("fxy,ay->fax", np.asarray(head_rot), off_true))
    auvw = anchors @ K.T
    kp133 = np.zeros((f, 133, 2), np.float32)
    kp133[:, :5] = auvw[..., :2] / auvw[..., 2:]
    sc133 = np.zeros((f, 133), np.float32)
    sc133[:, :5] = 1.0
    face_t, face_w = face_anchor_targets(kp133, sc133)
    assert face_w.sum() == 5 * f

    init = {k: np.copy(v) for k, v in true.items()}
    init["body_pose"] = np.copy(body_pose)
    init["body_pose"][:, 3 * 14:3 * 15] = 0.0  # head rotation unknown

    cfg = SkeletonFitConfig(steps=400, lr=0.02, w_pose_prior=0.05,
                            w_temporal=0.0)
    res_no = fit_skeleton(dt, K, init, targets, weights, cfg)
    dev_no = _head_rot_angles(dt, res_no, true)
    res = fit_skeleton(dt, K, init, targets, weights, cfg,
                       face_targets=face_t, face_weights=face_w)
    dev = _head_rot_angles(dt, res, true)
    # without anchors the swept yaw (up to ~34 deg) stays unrecovered
    assert dev_no.max() > 15.0, dev_no
    assert dev.max() < 5.0, (dev, dev_no)
    assert "face_offsets" in res
