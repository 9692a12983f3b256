"""Mesh-anchored gaussian avatar: state pytrees + functional forward.

TPU-first redesign of the reference SinGS class
(sings/rec/models/sings_hybrid.py:41-1307). The reference mutates
tensor shapes in place (densify = concat, prune = boolean index, with
matching Adam-state surgery). Here every per-gaussian array lives in a
fixed-capacity buffer with an `alive` mask:

  * AvatarParams  — trainable leaves (optax-visible)
  * AvatarBuffers — non-trainable per-gaussian state; topology changes
    rewrite these on host (model/density.py) and zero the optimizer
    moments of changed slots, never changing any shape.

forward() reproduces the reference pipeline: triplane -> decoders ->
canonical attrs -> (A_t2pose @ inv A_t2cano) lbs_extra -> posed
gaussians (sings_hybrid.py:249-471), including the quirks catalogued in
SURVEY.md section 7 (posedirs enabled inside the template call but
disabled for the avatar skinning; identity rotations for isotropic...).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.decoders import (
    DecoderConfig, appearance_decoder, geometry_decoder,
    init_appearance_decoder, init_geometry_decoder,
)
from ..fields.triplane import TriplaneConfig, init_triplane, triplane_features
from ..kinematics.body_model import BodyTemplate
from ..kinematics.lbs import lbs_extra
from ..kinematics.template import (
    CanonicalCache, DeviceTemplate, smpl_forward,
)
from ..ops.rotations import (
    axis_angle_to_rotation_6d, matrix_to_quaternion, matrix_to_rotation_6d,
    quaternion_multiply, rotation_6d_to_axis_angle, rotation_6d_to_matrix,
    rotation_matrix_from_vectors,
)


class AvatarConfig(NamedTuple):
    capacity: int                 # padded gaussian-slot count
    face_capacity: int
    edge_capacity: int
    num_frames: int               # training frames (per-frame pose params)
    num_betas: int = 10
    sh_degree: int = 3            # max SH degree
    isotropic: bool = True
    fixed_opacity: bool = False
    init_opacity: float = 0.8
    init_scale_multiplier: float = 0.25
    thickness_factor: float = 1.0
    disable_posedirs: bool = True
    canonical_pose: str = "da_pose"
    body_template: str = "smplh"
    triplane: TriplaneConfig = TriplaneConfig()
    decoder: DecoderConfig = DecoderConfig()
    offset_clamp: float = 0.0     # >0: bound |xyz_offsets| via tanh —
                                  # used with the synthetic template,
                                  # where photometric mismatch otherwise
                                  # drags gaussians off the anchor mesh
    scale_clamp: float = 0.0      # >0: ceiling on decoded scales (m).
                                  # The softplus decode is unbounded; a
                                  # diverging run can push exp-scale
                                  # gaussians over the whole screen and
                                  # overflow the loss. min() keeps
                                  # gradients exact below the ceiling.


class AvatarParams(NamedTuple):
    """Trainable parameters (a flat pytree for optax)."""

    xyz: jax.Array            # (C, 3) gaussian anchors (canonical, pre-offset)
    triplane: Any             # triplane grids pytree
    geometry_dec: Any
    appearance_dec: Any
    global_orient: jax.Array  # (F, 6) per-frame 6d
    body_pose: jax.Array      # (F, 23*6)
    transl: jax.Array         # (F, 3)
    betas: jax.Array          # (num_betas,)


class AvatarBuffers(NamedTuple):
    """Non-trainable per-gaussian + topology state (static shapes)."""

    alive: jax.Array               # (C,) float 0/1
    scaling_multiplier: jax.Array  # (C, 1)
    opacity_offset: jax.Array      # (C, 1) additive pre-sigmoid offset
    lbs_weights: jax.Array         # (C, J)
    vertex_label: jax.Array        # (C,) int32
    anchor_normals: jax.Array      # (C, 3) canonical vertex normals
    faces: jax.Array               # (Fc, 3) int32, padded with 0
    face_valid: jax.Array          # (Fc,) float
    edges: jax.Array               # (Ec, 2) int32
    edge_valid: jax.Array          # (Ec,) float
    num_level0: jax.Array          # () int32 — anchors (level-0) count
    max_radii2d: jax.Array         # (C,)
    xyz_grad_accum: jax.Array      # (C,)
    grad_denom: jax.Array          # (C,)


class AvatarState(NamedTuple):
    params: AvatarParams
    buffers: AvatarBuffers
    active_sh_degree: int         # static int (bumped at fixed iters)


def init_avatar(
    key: jax.Array,
    cfg: AvatarConfig,
    tpl: BodyTemplate,
    cache: CanonicalCache,
    smpl_params: dict | None = None,
) -> AvatarState:
    """Build the initial state from the (subdivided) body template.

    Gaussian anchors = canonical-pose vertices (reference initialize(),
    sings_hybrid.py:674-741). smpl_params: optional dict with per-frame
    'global_orient' (F,3), 'body_pose' (F,69), 'transl' (F,3),
    'betas' (nb,) axis-angle arrays from the training kit.
    """
    from ..mesh.ops import vertex_normals

    c = cfg.capacity
    n = tpl.num_verts
    assert n <= c, f"capacity {c} < template verts {n}"

    k_tri, k_geo, k_app = jax.random.split(key, 3)

    canon = np.asarray(cache.canonical_verts)
    xyz = np.zeros((c, 3), np.float32)
    xyz[:n] = canon

    if smpl_params is not None:
        f = smpl_params["body_pose"].shape[0]
        go6 = np.asarray(axis_angle_to_rotation_6d(
            jnp.asarray(smpl_params["global_orient"].reshape(-1, 3))
        )).reshape(f, 6)
        bp = smpl_params["body_pose"].reshape(f, -1, 3)[:, :23]
        bp6 = np.asarray(axis_angle_to_rotation_6d(
            jnp.asarray(bp.reshape(-1, 3)))).reshape(f, 23 * 6)
        transl = smpl_params["transl"].astype(np.float32)
        betas = smpl_params["betas"].reshape(-1)[: cfg.num_betas].astype(
            np.float32)
    else:
        f = max(cfg.num_frames, 1)
        ident6 = np.asarray(axis_angle_to_rotation_6d(jnp.zeros((1, 3))))
        go6 = np.tile(ident6, (f, 1))
        bp6 = np.tile(ident6, (f, 23)).reshape(f, 23 * 6)
        transl = np.zeros((f, 3), np.float32)
        betas = np.zeros(cfg.num_betas, np.float32)

    params = AvatarParams(
        xyz=jnp.asarray(xyz),
        triplane=init_triplane(k_tri, cfg.triplane),
        geometry_dec=init_geometry_decoder(k_geo, cfg.decoder),
        appearance_dec=init_appearance_decoder(k_app, cfg.decoder),
        global_orient=jnp.asarray(go6),
        body_pose=jnp.asarray(bp6),
        transl=jnp.asarray(transl),
        betas=jnp.asarray(betas),
    )

    nj = tpl.lbs_weights.shape[1]
    lbsw = np.zeros((c, nj), np.float32)
    lbsw[:n] = tpl.lbs_weights
    lbsw[n:, 0] = 1.0  # dead slots ride the root joint

    labels = np.full(c, -1, np.int32)
    labels[:n] = tpl.vertex_label

    normals = np.zeros((c, 3), np.float32)
    normals[:n] = vertex_normals(canon, tpl.faces)

    fc, ec = cfg.face_capacity, cfg.edge_capacity
    assert len(tpl.faces) <= fc and len(tpl.edges) <= ec
    faces = np.zeros((fc, 3), np.int32)
    faces[: len(tpl.faces)] = tpl.faces
    fvalid = np.zeros(fc, np.float32)
    fvalid[: len(tpl.faces)] = 1.0
    edges = np.zeros((ec, 2), np.int32)
    edges[: len(tpl.edges)] = tpl.edges
    evalid = np.zeros(ec, np.float32)
    evalid[: len(tpl.edges)] = 1.0

    alive = np.zeros(c, np.float32)
    alive[:n] = 1.0

    buffers = AvatarBuffers(
        alive=jnp.asarray(alive),
        scaling_multiplier=jnp.ones((c, 1), jnp.float32),
        opacity_offset=jnp.zeros((c, 1), jnp.float32),
        lbs_weights=jnp.asarray(lbsw),
        vertex_label=jnp.asarray(labels),
        anchor_normals=jnp.asarray(normals),
        faces=jnp.asarray(faces),
        face_valid=jnp.asarray(fvalid),
        edges=jnp.asarray(edges),
        edge_valid=jnp.asarray(evalid),
        num_level0=jnp.asarray(n, jnp.int32),
        max_radii2d=jnp.zeros(c, jnp.float32),
        xyz_grad_accum=jnp.zeros(c, jnp.float32),
        grad_denom=jnp.zeros(c, jnp.float32),
    )
    return AvatarState(params=params, buffers=buffers, active_sh_degree=0)


def get_gs_attrs(
    params: AvatarParams,
    buffers: AvatarBuffers,
    cfg: AvatarConfig,
    *,
    opt_geo: bool = True,
    opt_app: bool = True,
) -> dict:
    """Triplane -> decoders -> canonical gaussian attributes
    (sings_hybrid.py:249-313)."""
    feats = triplane_features(params.triplane, params.xyz, cfg.triplane)

    geo = geometry_decoder(params.geometry_dec, feats, cfg.decoder)
    app = appearance_decoder(params.appearance_dec, feats, cfg.decoder,
                             opacity_offset=buffers.opacity_offset)
    if not opt_geo:
        geo = jax.tree.map(
            lambda x: None if x is None else jax.lax.stop_gradient(x), geo,
            is_leaf=lambda x: x is None)
    if not opt_app:
        app = jax.tree.map(jax.lax.stop_gradient, app)

    scales = geo["scales"]
    scales = scales.at[:, -1].multiply(cfg.thickness_factor)
    scales = scales * buffers.scaling_multiplier
    if cfg.scale_clamp > 0:
        # LEAKY ceiling (slope 0.05 above the clamp): a hard
        # jnp.minimum has zero gradient above the rail, so a gaussian
        # that once grew past it could never be pulled back — the r2
        # quality run ended with scales pinned at exactly the clamp
        # (VERDICT r2; work/run_r2_f2_dark anim diagnostics)
        c = cfg.scale_clamp
        scales = jnp.where(scales > c, c + 0.05 * (scales - c), scales)

    offsets = geo["xyz_offsets"]
    if cfg.offset_clamp > 0:
        offsets = cfg.offset_clamp * jnp.tanh(offsets / cfg.offset_clamp)
        geo = dict(geo, xyz_offsets=offsets)

    xyz_canon = params.xyz + offsets
    return {
        "xyz_canon": xyz_canon,
        "xyz_offsets": geo["xyz_offsets"],
        "rot6d_canon": geo["rotations"],
        "scales_aux": geo["scales_aux"],
        "scales": scales,
        "opacity": app["opacity"],
        "shs": app["shs"],
    }


def get_canon_xyz(
    params: AvatarParams,
    buffers: AvatarBuffers,
    cfg: AvatarConfig,
) -> jax.Array:
    """Canonical gaussian centers only — triplane + geometry decoder,
    no appearance decode, no scale post-processing.

    Used by the chunk-head KNN edge statistic (train/step.py): the
    statistic is stop-gradient'd (reference loss_items.py:73-83
    .detach()) and consumed once per scan chunk, so it only needs the
    positions, not the full attribute set.
    """
    feats = triplane_features(params.triplane, params.xyz, cfg.triplane)
    geo = geometry_decoder(params.geometry_dec, feats, cfg.decoder)
    offsets = geo["xyz_offsets"]
    if cfg.offset_clamp > 0:
        offsets = cfg.offset_clamp * jnp.tanh(offsets / cfg.offset_clamp)
    return params.xyz + offsets


def avatar_forward(
    params: AvatarParams,
    buffers: AvatarBuffers,
    cfg: AvatarConfig,
    template: DeviceTemplate,
    cache: CanonicalCache,
    *,
    global_orient: jax.Array | None = None,
    body_pose: jax.Array | None = None,
    betas: jax.Array | None = None,
    transl: jax.Array | None = None,
    smpl_scale: jax.Array | None = None,
    dataset_idx: jax.Array | int = 0,
    ext_tfs: tuple | None = None,
    opt_geo: bool = True,
    opt_app: bool = True,
    eval_mode: bool = False,
    gs_attrs: dict | None = None,
    active_sh_degree: int = 0,
) -> dict:
    """Single-frame forward (sings_hybrid.py:331-471).

    Explicit SMPL args override the learned per-frame parameters;
    None falls back to params[dataset_idx] like the reference does for
    the training path.
    """
    if gs_attrs is None:
        gs_attrs = get_gs_attrs(params, buffers, cfg, opt_geo=opt_geo,
                                opt_app=opt_app)

    xyz_canon = gs_attrs["xyz_canon"]
    n = xyz_canon.shape[0]

    if cfg.isotropic:
        rotmat_canon = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
        rotq_canon = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    else:
        rotmat_canon = rotation_6d_to_matrix(gs_attrs["rot6d_canon"])
        rotq_canon = matrix_to_quaternion(rotmat_canon)

    if global_orient is None:
        global_orient = rotation_6d_to_axis_angle(
            params.global_orient[dataset_idx].reshape(1, 6)
        ).reshape(3)
    if body_pose is None:
        body_pose = rotation_6d_to_axis_angle(
            params.body_pose[dataset_idx].reshape(-1, 6)
        ).reshape(-1)
    if betas is None:
        betas = params.betas
    if transl is None:
        transl = params.transl[dataset_idx]

    smpl_out = smpl_forward(
        template, betas.reshape(1, -1), body_pose.reshape(1, -1),
        global_orient.reshape(1, 3), disable_posedirs=False,
    )
    a_cano2pose = smpl_out.A[0] @ cache.inv_A_t2cano
    xyz_def, lbs_t = lbs_extra(
        a_cano2pose[None], xyz_canon[None], buffers.lbs_weights,
        disable_posedirs=cfg.disable_posedirs,
    )
    xyz_def = xyz_def[0]
    lbs_t = lbs_t[0]

    scales = gs_attrs["scales"]
    if smpl_scale is not None:
        s = jnp.reshape(smpl_scale, (-1,))[0]
        xyz_def = xyz_def * s
        scales = scales * s
    if transl is not None:
        xyz_def = xyz_def + jnp.reshape(transl, (1, 3))

    rotmat_def = lbs_t[:, :3, :3] @ rotmat_canon
    rotq_def = matrix_to_quaternion(rotmat_def)

    if ext_tfs is not None:
        etrans, erot, escale = ext_tfs
        etrans = jnp.reshape(etrans, (3,))
        erot = jnp.reshape(erot, (3, 3))
        escale = jnp.reshape(escale, (-1,))[0]
        xyz_def = etrans[None] + escale * (xyz_def @ erot.T)
        scales = escale * scales
        erotq = matrix_to_quaternion(erot)
        rotq_def = quaternion_multiply(erotq[None], rotq_def)

    out = {
        "xyz": xyz_def,
        "xyz_canon": xyz_canon,
        "xyz_offsets": gs_attrs["xyz_offsets"],
        "scales": scales,
        "scales_canon": gs_attrs["scales"],
        "scales_aux": gs_attrs["scales_aux"],
        "rotq": rotq_def,
        "rotq_canon": rotq_canon,
        "rotmat_canon": rotmat_canon,
        "shs": gs_attrs["shs"],
        "opacity": gs_attrs["opacity"],
        "active_sh_degree": active_sh_degree,
        "alive": buffers.alive,
    }
    if not eval_mode:
        # anchor points for the laplacian: level-0 gaussians pushed along
        # canonical vertex normals by mean_scale/2 (sings_hybrid:437-445)
        mean_scales = scales.mean(axis=-1, keepdims=True)
        out["xyz_anchor_canon"] = (
            xyz_canon + mean_scales * buffers.anchor_normals / 2.0
        )
    return out


def avatar_forward_chunk(
    params: AvatarParams,
    buffers: AvatarBuffers,
    cfg: AvatarConfig,
    template: DeviceTemplate,
    cache: CanonicalCache,
    gs_attrs: dict,
    *,
    global_orient: jax.Array,   # (B, 3)
    body_pose: jax.Array,       # (B, 69)
    betas: jax.Array,           # (nb,)
    transl: jax.Array,          # (B, 3)
    smpl_scale: jax.Array | None = None,   # (B, 1)
    ext_tfs: tuple | None = None,  # ((B,3), (B,3,3), (B,1))
    active_sh_degree: int = 0,
) -> dict:
    """Batched animation forward (sings_hybrid.py:474-569): decode once,
    pose B frames with batched LBS."""
    b = body_pose.shape[0]
    xyz_canon = gs_attrs["xyz_canon"]
    n = xyz_canon.shape[0]

    if cfg.isotropic:
        rotmat_canon = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
        rotq_canon = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    else:
        rotmat_canon = rotation_6d_to_matrix(gs_attrs["rot6d_canon"])
        rotq_canon = matrix_to_quaternion(rotmat_canon)

    smpl_out = smpl_forward(
        template, jnp.broadcast_to(betas.reshape(1, -1),
                                   (b, betas.shape[-1])),
        body_pose, global_orient, disable_posedirs=False,
    )
    a_cano2pose = smpl_out.A @ cache.inv_A_t2cano[None]
    xyz_def, lbs_t = lbs_extra(
        a_cano2pose, jnp.broadcast_to(xyz_canon[None], (b, n, 3)),
        buffers.lbs_weights, disable_posedirs=cfg.disable_posedirs,
    )

    scales = jnp.broadcast_to(gs_attrs["scales"][None], (b, n, 3))
    if smpl_scale is not None:
        xyz_def = xyz_def * smpl_scale[:, None, :]
        scales = scales * smpl_scale[:, None, :]
    xyz_def = xyz_def + transl[:, None, :]

    rotmat_def = lbs_t[..., :3, :3] @ rotmat_canon[None]
    rotq_def = matrix_to_quaternion(rotmat_def)

    if ext_tfs is not None:
        etrans, erot, escale = ext_tfs
        xyz_def = etrans[:, None, :] + escale[:, None, :] * jnp.einsum(
            "bxy,bny->bnx", erot, xyz_def)
        scales = escale[:, None, :] * scales
        erotq = matrix_to_quaternion(erot)
        rotq_def = quaternion_multiply(erotq[:, None, :], rotq_def)

    return {
        "xyz": xyz_def,
        "scales": scales,
        "rotq": rotq_def,
        "shs": jnp.broadcast_to(gs_attrs["shs"][None],
                                (b,) + gs_attrs["shs"].shape),
        "opacity": jnp.broadcast_to(gs_attrs["opacity"][None],
                                    (b,) + gs_attrs["opacity"].shape),
        "active_sh_degree": active_sh_degree,
        "alive": buffers.alive,
    }


def initial_attr_targets(cfg: AvatarConfig, tpl: BodyTemplate,
                         cache: CanonicalCache) -> dict:
    """Geometric regression targets for decoder pre-fitting
    (reference initialize(), sings_hybrid.py:674-741).

    scales target: max incident edge length * init_scale_multiplier (the
    reference's per-vertex loop computes a first-two-incident-edges
    variant; we implement the evident intent, vectorized).
    rot6d target: rotation aligning +z to the canonical vertex normal.
    """
    from ..mesh.ops import vertex_normals

    c = cfg.capacity
    n = tpl.num_verts
    canon = np.asarray(cache.canonical_verts)

    edges = tpl.edges
    el = np.linalg.norm(canon[edges[:, 0]] - canon[edges[:, 1]], axis=1)
    max_len = np.zeros(n, np.float32)
    np.maximum.at(max_len, edges[:, 0], el)
    np.maximum.at(max_len, edges[:, 1], el)
    scales_t = np.zeros((c, 3), np.float32)
    scales_t[:n] = (max_len * cfg.init_scale_multiplier)[:, None]
    scales_t[:n, 2] *= cfg.thickness_factor
    scales_t = np.maximum(scales_t, 1e-5)
    scales_aux_t = np.log(np.expm1(np.maximum(scales_t, 1e-6)))

    shs_t = np.zeros((c, 16, 3), np.float32)
    shs_t[:n, 0, :] = 0.5  # reference initialize(): dc coeff = 0.5

    normals = vertex_normals(canon, tpl.faces)
    z = np.zeros((n, 3), np.float32)
    z[:, 2] = 1.0
    rot = rotation_matrix_from_vectors(jnp.asarray(z), jnp.asarray(normals))
    rot6d_t = np.zeros((c, 6), np.float32)
    rot6d_t[:n] = np.asarray(matrix_to_rotation_6d(rot))

    opacity_t = np.zeros((c, 1), np.float32)
    opacity_t[:n] = cfg.init_opacity

    return {
        "xyz_offsets": jnp.zeros((c, 3)),
        "scales": jnp.asarray(scales_t),
        "scales_aux": jnp.asarray(scales_aux_t),
        "rot6d_canon": jnp.asarray(rot6d_t),
        "shs": jnp.asarray(shs_t),
        "opacity": jnp.asarray(opacity_t),
    }


def fit_initial_attrs(
    params: AvatarParams,
    buffers: AvatarBuffers,
    cfg: AvatarConfig,
    targets: dict,
    *,
    steps: int = 500,
    lr: float = 1e-3,
) -> AvatarParams:
    """Pre-fit decoders+triplane to the geometric targets with Adam
    (reference init_attrs, sings_hybrid.py:608-671). Jitted lax.scan."""
    import optax

    trainable = {
        "triplane": params.triplane,
        "geometry_dec": params.geometry_dec,
        "appearance_dec": params.appearance_dec,
    }
    tx = optax.adam(lr, eps=1e-15)
    opt_state = tx.init(trainable)
    alive = buffers.alive[:, None]

    def loss_fn(tr):
        p = params._replace(**tr)
        out = get_gs_attrs(p, buffers, cfg)
        total = 0.0
        for k, tgt in targets.items():
            if k not in out or out[k] is None:
                continue
            pred = out[k]
            m = alive.reshape((-1,) + (1,) * (pred.ndim - 1))
            total = total + jnp.mean(((pred - tgt) * m) ** 2)
        return total

    @jax.jit
    def run(tr, opt_state):
        def step(carry, _):
            tr, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(tr)
            updates, opt_state = tx.update(grads, opt_state, tr)
            tr = optax.apply_updates(tr, updates)
            return (tr, opt_state), loss
        (tr, _), losses = jax.lax.scan(step, (tr, opt_state), None,
                                       length=steps)
        return tr, losses

    trainable, losses = run(trainable, opt_state)
    return params._replace(**trainable), losses
