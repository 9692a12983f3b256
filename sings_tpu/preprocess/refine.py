"""SMPL pose refinement from 2D keypoints + silhouettes.

TPU-native rebuild of the reference's preprocess refiner
(preprocess/utils/ooptimize_smpl.py / ooptimize_smplh.py:263-455): the
pytorch3d SoftSilhouetteShader mesh renderer is replaced by our own
differentiable gaussian rasterizer — white opacity-splats on the SMPL
vertices render a soft silhouette whose MSE against the SAM2 mask,
together with a joint-reprojection MSE, drives Adam over
(global_orient, body_pose, transl[, betas]).

Unlike the reference (a python loop over frames, one optimizer each),
all frames are refined jointly in one batched jitted optimization —
frames vmap over the LBS and the rasterizer.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..kinematics.template import DeviceTemplate, full_pose, smpl_forward
from ..ops.graphics import Camera
from ..ops.projection import project_points
from ..ops.rasterizer.api import rasterize


def coco17_to_smpl(coco2d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """COCO-17 keypoints -> SMPL 24-joint targets + validity mask
    (reference ooptimize_smpl.coco_to_smpl:36-56)."""
    assert coco2d.shape[-2:] == (17, 2)
    out = np.zeros(coco2d.shape[:-2] + (24, 2), np.float32)
    valid = np.zeros(coco2d.shape[:-2] + (24,), np.float32)
    pairs = [(1, 11), (2, 12), (4, 13), (5, 14), (7, 15), (8, 16),
             (16, 5), (17, 6), (18, 7), (19, 8), (20, 9), (21, 10)]
    for smpl_j, coco_j in pairs:
        out[..., smpl_j, :] = coco2d[..., coco_j, :]
        valid[..., smpl_j] = 1.0
    return out, valid


def coco133_to_smpl(coco2d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """COCO-133 (sapiens) -> SMPL joints for limb/feet refinement
    (reference ooptimize_smpl.coco133_to_smpl:64-101). Foot keypoints
    (toes/heels) are mapped onto the ankle/foot joints."""
    assert coco2d.shape[-2:] == (133, 2)
    out = np.zeros(coco2d.shape[:-2] + (24, 2), np.float32)
    valid = np.zeros(coco2d.shape[:-2] + (24,), np.float32)
    pairs = [(18, 7), (19, 8), (20, 9), (21, 10), (4, 13), (5, 14),
             (7, 15), (8, 16), (10, 17), (11, 20)]
    for smpl_j, coco_j in pairs:
        out[..., smpl_j, :] = coco2d[..., coco_j, :]
        valid[..., smpl_j] = 1.0
    return out, valid


# full-body COCO-133 -> SMPL-24 joint correspondence (reference body
# rows from ooptimize_smplh.coco17_to_smpl/coco133_to_smplh:33-117;
# feet via the big-toe keypoints)
_COCO133_SMPL_PAIRS = (
    (1, 11), (2, 12),      # hips
    (4, 13), (5, 14),      # knees
    (7, 15), (8, 16),      # ankles
    (10, 17), (11, 20),    # feet (big toes)
    (16, 5), (17, 6),      # shoulders
    (18, 7), (19, 8),      # elbows
    (20, 9), (21, 10),     # wrists
)


def coco133_body_targets(
    kp: np.ndarray, scores: np.ndarray, thresh: float = 0.8,
) -> tuple[np.ndarray, np.ndarray]:
    """Score-weighted full-body SMPL-24 keypoint targets.

    kp (F, 133, 2), scores (F, 133) -> targets (F, 24, 2) + weights
    (F, 24). Detections below `thresh` are discarded like the
    reference (ooptimize_smplh.py:334: joints_target[score < 0.8] = 0);
    the head joint is anchored at the ear midpoint."""
    assert kp.shape[-2:] == (133, 2)
    f = kp.shape[0]
    out = np.zeros((f, 24, 2), np.float32)
    w = np.zeros((f, 24), np.float32)
    for sj, cj in _COCO133_SMPL_PAIRS:
        out[:, sj] = kp[:, cj]
        w[:, sj] = np.where(scores[:, cj] >= thresh,
                            np.minimum(scores[:, cj], 1.0), 0.0)
    ear_ok = (scores[:, 3] >= thresh) & (scores[:, 4] >= thresh)
    out[:, 15] = 0.5 * (kp[:, 3] + kp[:, 4])
    w[:, 15] = np.where(ear_ok, 1.0, 0.0)
    return out, w


# COCO-133 face-anchor keypoints: nose, left eye, right eye, left ear,
# right ear. 2D joint POSITIONS cannot constrain head ROTATION (the ear
# midpoint used for the head joint is yaw-invariant), and an
# uncalibrated per-frame head yaw/pitch smears the canonical face
# texture into an eyeless blur (round-3 run r3a: masked PSNR 13.8 with
# a featureless face). These five points are modeled as RIGID offsets
# in the head joint's local frame — the offsets are shared across all
# frames and fit jointly with the poses (rigid-body calibration: a
# turnaround's yaw sweep makes them well-determined), so the per-frame
# head rotation must follow the detected face.
FACE_ANCHOR_COCO = (0, 1, 2, 3, 4)
FACE_ANCHOR_INIT = np.array(
    [[0.000, 0.060, 0.100],    # nose
     [0.033, 0.090, 0.090],    # left eye
     [-0.033, 0.090, 0.090],   # right eye
     [0.070, 0.060, 0.010],    # left ear
     [-0.070, 0.060, 0.010]],  # right ear
    np.float32)


def face_anchor_targets(
    kp: np.ndarray, scores: np.ndarray, thresh: float = 0.8,
) -> tuple[np.ndarray, np.ndarray]:
    """(F, 133, 2) sapiens keypoints -> (F, 5, 2) face-anchor targets
    + (F, 5) score weights (0 below `thresh` — back views have no
    face detections and contribute nothing)."""
    assert kp.shape[-2:] == (133, 2)
    idx = list(FACE_ANCHOR_COCO)
    t = kp[:, idx].astype(np.float32)
    s = scores[:, idx]
    w = np.where(s >= thresh, np.minimum(s, 1.0), 0.0).astype(np.float32)
    return t, w


class SkeletonFitConfig(NamedTuple):
    steps: int = 500
    lr: float = 0.02
    huber_px: float = 10.0        # robust width of the reprojection loss
    w_pose_prior: float = 1.0     # rad^2 toward the kit's initial poses
    # Strong separate prior on global_orient: 2D keypoints cannot
    # disambiguate depth (a pitched body + stretched bones reprojects
    # like an upright one) or front/back on profile frames (a 180-deg
    # flip of a near-symmetric skeleton), and the round-3 quality run
    # proved the fit exploits BOTH per frame (65-deg pitch swings,
    # scattered yaw flips -> canonical texture smeared, masked PSNR
    # plateau at 12). The kit's ScoreHMR orientations are 3D-aware —
    # trust them, let only transl/scale/bones (which carry the 110 px
    # initial misalignment) move freely. Swept on the bundled kit:
    # w=60 -> px 0.84, orient dev mean 14.7/max 73 deg;
    # w=600 -> px 0.76, dev mean 2.0/max 11.3 (keypoints and ScoreHMR
    # AGREE — the deviations were optimizer wandering, not data).
    w_orient_prior: float = 600.0
    w_beta_prior: float = 0.05
    w_temporal: float = 10.0      # adjacent-frame pose/transl smoothness
    w_face: float = 1.0           # face-anchor reprojection (head rot)
    w_face_offset_prior: float = 100.0  # m^2; keep offsets head-sized
    optimize_betas: bool = True


def posed_smpl_joints(template: DeviceTemplate, params: dict,
                      return_head_rot: bool = False):
    """(F, 24, 3) posed joint positions — the joints-only LBS prefix
    (blend shapes -> regressor -> kinematic chain), skipping the
    per-vertex skinning entirely. Used by the keypoint-only fit.

    return_head_rot: also return the head joint's GLOBAL rotation
    (F, 3, 3) for the rigid face-anchor reprojection."""
    from ..kinematics.lbs import (batch_rigid_transform, batch_rodrigues,
                                  blend_shapes, vertices2joints)

    f = params["body_pose"].shape[0]
    v_shaped = template.v_template[None] + blend_shapes(
        params["betas"].reshape(1, -1), template.shapedirs)
    joints = vertices2joints(template.j_regressor, v_shaped)  # (1, J, 3)
    pose = full_pose(template, params["global_orient"],
                     params["body_pose"])
    rot = batch_rodrigues(pose.reshape(f, -1, 3))
    joints_b = jnp.broadcast_to(joints, (f,) + joints.shape[1:])
    posed, transforms = batch_rigid_transform(
        rot, joints_b, template.parents)
    out = posed[:, :24] + params["transl"][:, None, :]
    if return_head_rot:
        # world transforms carry the accumulated chain rotation; the
        # smplx rest-joint correction only touches the translation
        return out, transforms[:, 15, :3, :3]
    return out


def project_px(points: jax.Array, Kj: jax.Array) -> jax.Array:
    """(..., 3) camera-frame points -> (..., 2) pixel coords."""
    uvw = jnp.einsum("...c,kc->...k", points, Kj)
    z = jnp.where(jnp.abs(uvw[..., 2:]) < 1e-9, 1e-9, uvw[..., 2:])
    return uvw[..., :2] / z


def _huber_px(e: jax.Array, d: float) -> jax.Array:
    return jnp.where(e <= d, 0.5 * e * e / d, e - 0.5 * d)


def fit_skeleton(
    template: DeviceTemplate,
    K: np.ndarray,
    smpl_init: dict,
    kp_targets: np.ndarray,
    kp_weights: np.ndarray,
    cfg: SkeletonFitConfig = SkeletonFitConfig(),
    beta_mask: np.ndarray | None = None,
    face_targets: np.ndarray | None = None,
    face_weights: np.ndarray | None = None,
) -> dict:
    """Stage-A geometric alignment: keypoints only, no rendering.

    Jointly fits shared betas (incl. the synthetic template's
    bone-proportion dims) and per-frame pose/orient/transl to the
    sapiens 2D keypoints — the same signal the reference refiner uses
    (ooptimize_smplh.py:326-378) but solved for ALL frames at once so
    the shared shape is constrained by every view of the turnaround.
    Returns refined {betas, global_orient, body_pose, transl, losses,
    px_err (mean weighted px error per recorded step)}.

    beta_mask: optional (nb,) 0/1 — only masked-in beta dims receive
    gradient. Keypoints constrain the SKELETON, so for the synthetic
    template the caller should mask to global scale + bone-proportion
    dims and leave the radial-thickness dims to the silhouette stage
    (unconstrained, the fit drives radial dims negative enough to
    invert tube geometry).
    """
    Kj = jnp.asarray(K)
    kp_t = jnp.asarray(kp_targets)
    kp_w = jnp.asarray(kp_weights)
    b_mask = (None if beta_mask is None
              else jnp.asarray(beta_mask, jnp.float32))
    use_face = (face_targets is not None and cfg.w_face > 0
                and float(np.sum(face_weights)) > 0)

    params0 = {
        "global_orient": jnp.asarray(smpl_init["global_orient"]),
        "body_pose": jnp.asarray(smpl_init["body_pose"]),
        "transl": jnp.asarray(smpl_init["transl"]),
        "betas": jnp.asarray(smpl_init["betas"]),
    }
    if use_face:
        face_t = jnp.asarray(face_targets)
        face_w = jnp.asarray(face_weights)
        params0["face_offsets"] = jnp.asarray(FACE_ANCHOR_INIT)
    prior = jax.tree.map(jnp.copy, params0)

    def loss_fn(params):
        if b_mask is not None:
            params = dict(params)
            params["betas"] = (
                params["betas"] * b_mask
                + jax.lax.stop_gradient(params["betas"]) * (1 - b_mask))
        joints, head_rot = posed_smpl_joints(template, params,
                                             return_head_rot=True)
        uv = project_px(joints, Kj)
        e = jnp.sqrt(jnp.sum((uv - kp_t) ** 2, axis=-1) + 1e-8)  # px
        hub = _huber_px(e, cfg.huber_px)
        px_err = (e * kp_w).sum() / jnp.maximum(kp_w.sum(), 1.0)
        l_kp = (hub * kp_w).sum() / jnp.maximum(kp_w.sum(), 1.0)
        l_prior = jnp.mean((params["body_pose"] - prior["body_pose"]) ** 2)
        l_orient = jnp.mean(
            (params["global_orient"] - prior["global_orient"]) ** 2)
        l_beta = jnp.mean(params["betas"] ** 2)
        l_temp = sum(
            jnp.mean(jnp.diff(params[k], axis=0) ** 2)
            for k in ("body_pose", "global_orient", "transl"))
        total = (l_kp + cfg.w_pose_prior * l_prior
                 + cfg.w_orient_prior * l_orient
                 + cfg.w_beta_prior * l_beta + cfg.w_temporal * l_temp)
        if use_face:
            # rigid face anchors: p = head_pos + R_head @ offset, the
            # shared offsets calibrate against the turnaround's yaw
            # sweep while per-frame head rotation follows the detections
            anchors = (joints[:, 15][:, None, :]
                       + jnp.einsum("fxy,ay->fax", head_rot,
                                    params["face_offsets"]))
            fe = jnp.sqrt(jnp.sum(
                (project_px(anchors, Kj) - face_t) ** 2, axis=-1) + 1e-8)
            l_face = (_huber_px(fe, cfg.huber_px) * face_w).sum() \
                / jnp.maximum(face_w.sum(), 1.0)
            l_off = jnp.mean(
                (params["face_offsets"] - prior["face_offsets"]) ** 2)
            total = total + cfg.w_face * l_face \
                + cfg.w_face_offset_prior * l_off
        return total, px_err

    tx = optax.adam(cfg.lr)
    if not cfg.optimize_betas:
        tx = optax.chain(tx, optax.masked(
            optax.scale(0.0), {k: k == "betas" for k in params0}))
    opt_state = tx.init(params0)

    @jax.jit
    def run(params, opt_state):
        def step(carry, _):
            params, opt_state = carry
            (loss, px), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, px)

        (params, opt_state), (losses, px) = jax.lax.scan(
            step, (params, opt_state), None, length=cfg.steps)
        return params, losses, px

    params, losses, px = run(params0, opt_state)
    out = {k: np.asarray(v) for k, v in params.items()}
    out["losses"] = np.asarray(losses)
    out["px_err"] = np.asarray(px)
    return out


class RefineConfig(NamedTuple):
    steps: int = 300
    lr: float = 0.005
    w_silhouette: float = 1.0
    w_keypoints: float = 1e-4
    w_face: float = 1e-4          # face anchors (head rot), fixed offsets
    w_prior: float = 0.1          # stay close to the initial estimate
    w_orient_prior: float = 60.0  # see SkeletonFitConfig.w_orient_prior
    # silhouette splat size (m); None = auto, ~1.7x the template's
    # median vertex spacing. A fixed 0.02 tuned for 25.6k verts renders
    # a FAT silhouette on a 102k-vert template (spacing ~halves per
    # subdivision) — the r3b fit's mask MSE floored ~2x higher than
    # r3a's because the splats themselves overflowed the mask
    splat_scale: float | None = None
    splat_opacity: float = 0.7
    optimize_betas: bool = False
    render_downscale: int = 4     # silhouettes at reduced resolution
    batch_frames: int = 8         # frames per step (memory bound: each
                                  # vmapped frame holds its own binning
                                  # buffers; all-frames vmap OOMs HBM)
    scan_chunk: int = 64          # steps per device dispatch (long
                                  # single programs fault the tunneled
                                  # TPU worker — see refine_smpl body)
    max_retries: int = 4          # device-fault retries per chunk,
                                  # halving scan_chunk each time


def auto_splat_scale(template: DeviceTemplate) -> float:
    """~1.7x the template's median edge length — splats that tile the
    surface without fattening the silhouette (see RefineConfig)."""
    v = np.asarray(template.v_template)
    f = np.asarray(template.faces)
    e = np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=-1)
    return float(np.clip(1.7 * np.median(e), 1e-4, 0.05))


def _silhouette(verts: jax.Array, camera: Camera, cfg: RefineConfig,
                raster_kw: dict) -> jax.Array:
    """Render a soft silhouette of a vertex cloud: (H, W) in [0, 1]."""
    n = verts.shape[0]
    scales = jnp.full((n, 3), cfg.splat_scale)
    quats = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    opac = jnp.full((n,), cfg.splat_opacity)
    rgb = jnp.ones((n, 3))
    pkg = rasterize(verts, scales, quats, opac, rgb, camera,
                    bg=jnp.zeros(3), backend="pallas", **raster_kw)
    return jnp.clip(pkg["render"][0], 0.0, 1.0)


def refine_smpl(
    template: DeviceTemplate,
    camera: Camera,
    K: np.ndarray,
    smpl_init: dict,
    masks: np.ndarray,
    keypoints2d: np.ndarray | None = None,
    keypoint_valid: np.ndarray | None = None,
    cfg: RefineConfig = RefineConfig(),
    raster_kw: dict | None = None,
    face_targets: np.ndarray | None = None,
    face_weights: np.ndarray | None = None,
    face_offsets: np.ndarray | None = None,
) -> dict:
    """Jointly refine per-frame SMPL parameters.

    smpl_init: {'betas' (nb,), 'global_orient' (F,3),
                'body_pose' (F,69), 'transl' (F,3)} axis-angle.
    masks: (F, H, W) float; keypoints2d: (F, 24, 2) pixel coords.
    Returns the same dict with refined values (poses_optimized contract,
    reference ooptimize_smplh.py:445-455).
    """
    from ..dist.shard import camera_strip  # noqa: F401 (doc ref)

    f = smpl_init["body_pose"].shape[0]
    d = cfg.render_downscale
    if d > 1:
        import numpy as _np

        masks_lr = masks[:, ::d, ::d]
        Kd = K.copy()
        Kd[:2] /= d
        from ..ops.graphics import make_camera

        cam_lr = make_camera(
            np.eye(4, dtype=np.float32), masks_lr.shape[1],
            masks_lr.shape[2], K=Kd)
    else:
        masks_lr = masks
        cam_lr = camera

    if raster_kw is None:
        raster_kw = (dict(tile=16, chunk=128, max_span=3)
                     if jax.default_backend() == "tpu"
                     else dict(tile=16, chunk=8, max_span=3, interpret=True))

    masks_d = jnp.asarray(masks_lr)
    kp = None if keypoints2d is None else jnp.asarray(keypoints2d)
    kp_valid = (None if keypoint_valid is None
                else jnp.asarray(keypoint_valid))
    Kj = jnp.asarray(K)

    init = {
        "global_orient": jnp.asarray(smpl_init["global_orient"]),
        "body_pose": jnp.asarray(smpl_init["body_pose"]),
        "transl": jnp.asarray(smpl_init["transl"]),
        "betas": jnp.asarray(smpl_init["betas"]),
    }
    params0 = dict(init)
    prior = jax.tree.map(jnp.copy, init)

    if cfg.splat_scale is None:
        cfg = cfg._replace(splat_scale=auto_splat_scale(template))

    use_sil = cfg.w_silhouette > 0.0
    use_kp = kp is not None and cfg.w_keypoints > 0.0
    use_face = (face_targets is not None and face_offsets is not None
                and cfg.w_face > 0.0 and float(np.sum(face_weights)) > 0)
    if use_face:
        face_t = jnp.asarray(face_targets)
        face_w = jnp.asarray(face_weights)
        face_o = jnp.asarray(face_offsets)  # calibrated in stage A, fixed

    def sil_loss(params, i):
        out = smpl_forward(
            template, params["betas"].reshape(1, -1),
            params["body_pose"][i].reshape(1, -1),
            params["global_orient"][i].reshape(1, 3),
            disable_posedirs=template.posedirs is None,
        )
        verts = out.verts[0] + params["transl"][i][None]
        sil = _silhouette(verts, cam_lr, cfg, raster_kw)
        return jnp.mean((sil - masks_d[i]) ** 2)

    nb = min(cfg.batch_frames, f)

    def total_loss(params, step_i):
        # Zero-weight terms are dropped at TRACE time: XLA cannot fold
        # 0 * x (0 * inf = nan), so a disabled silhouette term would
        # still run the rasterizer AND propagate any non-finite
        # backward values into the other terms' gradients.
        l = 0.0
        if use_kp or use_face:
            # keypoints + prior over ALL frames every step (joints-only
            # forward, no rendering — cheap). Minibatching these
            # DIVERGED under Adam: per-frame params visited every
            # f/batch steps coast on stale momentum in between, and the
            # walk increased the keypoint loss 13x at the bundled-kit
            # scale. Same robust huber as fit_skeleton.
            joints, head_rot = posed_smpl_joints(template, params,
                                                 return_head_rot=True)
        if use_kp:
            uv = project_px(joints, Kj)
            e = jnp.sqrt(jnp.sum((uv - kp) ** 2, axis=-1) + 1e-8)
            hub = _huber_px(e, 10.0)
            if kp_valid is not None:
                l_kp = (hub * kp_valid).sum() / jnp.maximum(
                    kp_valid.sum(), 1.0)
            else:
                l_kp = hub.mean()
            l = l + cfg.w_keypoints * l_kp
        if use_face:
            anchors = (joints[:, 15][:, None, :]
                       + jnp.einsum("fxy,ay->fax", head_rot, face_o))
            fe = jnp.sqrt(jnp.sum(
                (project_px(anchors, Kj) - face_t) ** 2, axis=-1) + 1e-8)
            l_face = (_huber_px(fe, 10.0) * face_w).sum() \
                / jnp.maximum(face_w.sum(), 1.0)
            l = l + cfg.w_face * l_face
        if use_sil:
            # silhouettes on a deterministic round-robin frame batch
            # (memory bound: each vmapped frame holds its own binning
            # buffers)
            idx = (step_i * nb + jnp.arange(nb)) % f
            sils = jax.vmap(lambda i: sil_loss(params, i))(idx)
            l = l + cfg.w_silhouette * sils.mean()
        l_prior = sum(
            jnp.mean((params[k] - prior[k]) ** 2)
            for k in ("body_pose", "transl"))
        l_orient = jnp.mean(
            (params["global_orient"] - prior["global_orient"]) ** 2)
        return l + cfg.w_prior * l_prior + cfg.w_orient_prior * l_orient

    tx = optax.adam(cfg.lr)
    if not cfg.optimize_betas:
        mask = {k: (k != "betas") for k in params0}
        tx = optax.chain(tx, optax.masked(
            optax.scale(0.0), {k: not v for k, v in mask.items()}))

    opt_state = tx.init(params0)

    @functools.partial(jax.jit, static_argnames=("length",))
    def run(params, opt_state, step0, length):
        def step(carry, step_i):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(total_loss)(params, step_i)
            # skip non-finite steps (the trainer has the same guard):
            # one bad rasterizer backward must not poison Adam state
            finite = jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
            grads = jax.tree.map(
                lambda g: jnp.where(finite, g, 0.0), grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        steps_i = step0 + jnp.arange(length, dtype=jnp.int32)
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), steps_i)
        return params, opt_state, losses

    # bounded dispatches: ONE scan over all steps builds a device
    # program whose runtime grows with steps * silhouette cost, and at
    # reference-scale shapes (102k verts, ~15-30 s single program) the
    # tunneled TPU worker deterministically crashed mid-program
    # (bisected: 100-step scan OK, 180-step scan faults, the identical
    # 300 steps host-stepped are clean — scripts/repro_refine_crash*.py).
    # Chunks of <=64 steps keep each dispatch seconds-long; the chunk
    # body compiles once and the remainder (if any) once more.
    #
    # Residual faults are RETRIED: each completed chunk snapshots
    # params/opt_state to host numpy; on a device fault (UNAVAILABLE /
    # "worker process crashed" — the r3b run needed three manual
    # launches, VERDICT r3 weak #3) the state is re-uploaded from the
    # snapshot and the chunk re-dispatched with scan_chunk halved (the
    # fault is runtime-length-dependent, so shorter programs are the
    # known mitigation).
    chunk_len = int(cfg.scan_chunk)
    params = params0
    snap = jax.tree.map(np.asarray, params0)
    opt_snap = jax.tree.map(np.asarray, opt_state)
    loss_chunks = []
    done = 0
    retries = 0
    while done < cfg.steps:
        ln = min(chunk_len, cfg.steps - done)
        try:
            if _fault_hook is not None:
                _fault_hook(done)
            p_new, o_new, losses_c = run(
                params, opt_state, jnp.int32(done), ln)
            # materialize to host: forces program completion (faults
            # surface here) and doubles as the resume snapshot
            losses_np = np.asarray(losses_c)
            snap = jax.tree.map(np.asarray, p_new)
            opt_snap = jax.tree.map(np.asarray, o_new)
        except Exception as e:  # noqa: BLE001 — filtered below
            if not _is_device_fault(e) or retries >= cfg.max_retries:
                raise
            retries += 1
            chunk_len = max(1, chunk_len // 2)
            print(f"[refine] device fault at step {done} "
                  f"({type(e).__name__}); retry {retries}/"
                  f"{cfg.max_retries} with scan_chunk={chunk_len}",
                  flush=True)
            params = {k: jnp.asarray(v) for k, v in snap.items()}
            opt_state = jax.tree.map(jnp.asarray, opt_snap)
            continue
        params, opt_state = p_new, o_new
        loss_chunks.append(losses_np)
        done += ln
    losses = np.concatenate(loss_chunks) if len(loss_chunks) > 1 \
        else loss_chunks[0]
    out = {k: np.asarray(v) for k, v in params.items()}
    out["losses"] = np.asarray(losses)
    return out


# test hook: called with the chunk's start step before each dispatch;
# tests inject a fault by setting this to a raising callable
_fault_hook = None


_FAULT_SIGNATURES = ("UNAVAILABLE", "DATA_LOSS", "DataLoss",
                     "worker process crashed", "INTERNAL",
                     "DEADLINE_EXCEEDED")


def _is_device_fault(e: Exception) -> bool:
    """Heuristic: runtime faults of the device/worker/tunnel, as
    opposed to programming errors — only the former are retryable."""
    return any(s in str(e) for s in _FAULT_SIGNATURES)
