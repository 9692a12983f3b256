"""Posable body template on device: SMPL forward + canonical-pose cache.

Replaces the reference's SMPL/SMPLH nn.Modules (smpl_layer.py:561-598,
smplh_layer.py:268-367) with a functional wrapper over kinematics/lbs:
given (betas, body_pose, global_orient) it returns vertices plus the
extras the avatar needs (A, T, shape/pose offsets), and caches the
canonical-pose ("da_pose") inverse transforms used by the
canonical->posed gaussian deformation (sings_hybrid.py:578-596).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .body_model import BodyTemplate
from .lbs import LBSOutput, lbs
from .poses import predefined_pose


class DeviceTemplate(NamedTuple):
    """BodyTemplate arrays on device + python metadata."""

    v_template: jax.Array
    shapedirs: jax.Array
    posedirs: jax.Array | None
    j_regressor: jax.Array
    parents: np.ndarray       # static python-side (chain unroll)
    lbs_weights: jax.Array
    faces: jax.Array
    num_body_joints: int      # 23 for smpl, 21 for smplh body part
    # MANO hand PCA (smplh pkls; smplh_layer.py:182-242,307-317)
    hands_components: jax.Array | None = None  # (2, n_comp, 45)
    hands_mean: jax.Array | None = None        # (2, 45)

    @classmethod
    def from_host(cls, tpl: BodyTemplate) -> "DeviceTemplate":
        nbj = 23 if tpl.num_joints == 24 else 21
        hc = getattr(tpl, "hands_components", None)
        hm = getattr(tpl, "hands_mean", None)
        return cls(
            v_template=jnp.asarray(tpl.v_template),
            shapedirs=jnp.asarray(tpl.shapedirs),
            posedirs=None if tpl.posedirs is None else jnp.asarray(tpl.posedirs),
            j_regressor=jnp.asarray(tpl.j_regressor),
            parents=np.asarray(tpl.parents),
            lbs_weights=jnp.asarray(tpl.lbs_weights),
            faces=jnp.asarray(tpl.faces),
            num_body_joints=nbj,
            hands_components=None if hc is None else jnp.asarray(hc),
            hands_mean=None if hm is None else jnp.asarray(hm),
        )


def full_pose(tpl: DeviceTemplate, global_orient: jax.Array,
              body_pose: jax.Array,
              left_hand_pose: jax.Array | None = None,
              right_hand_pose: jax.Array | None = None,
              num_pca_comps: int = 6) -> jax.Array:
    """Assemble the (B, J*3) full pose: root + body (+ hands).

    For SMPLH templates with MANO data, hand poses are PCA
    coefficients projected through the first num_pca_comps components
    and offset by the (non-flat) hand means — reference
    smplh_layer.py:307-317 plus the `full_pose += pose_mean` at :319
    with the default flat_hand_mean=False: zero coefficients still
    yield the MANO mean pose, not flat hands. Templates without MANO
    data (SMPL / synthetic) keep zero wrist-onward joints.
    """
    b = body_pose.shape[0]
    nj = tpl.parents.shape[0]
    body = body_pose[:, : tpl.num_body_joints * 3]
    rest = nj - 1 - tpl.num_body_joints
    parts = [global_orient.reshape(b, 3), body]
    if rest > 0:
        if tpl.hands_components is not None and rest == 30:
            comps = tpl.hands_components[:, :num_pca_comps]  # (2, C, 45)
            hands = []
            for side, coeff in enumerate((left_hand_pose,
                                          right_hand_pose)):
                base = jnp.broadcast_to(tpl.hands_mean[side][None],
                                        (b, 45)).astype(body_pose.dtype)
                if coeff is not None:
                    base = base + jnp.einsum(
                        "bi,ij->bj", coeff.reshape(b, -1),
                        comps[side][: coeff.shape[-1]])
                hands.append(base)
            parts.extend(hands)
        else:
            parts.append(jnp.zeros((b, rest * 3), body_pose.dtype))
    return jnp.concatenate(parts, axis=1)


def smpl_forward(
    tpl: DeviceTemplate,
    betas: jax.Array,
    body_pose: jax.Array,
    global_orient: jax.Array | None = None,
    *,
    disable_posedirs: bool = False,
    left_hand_pose: jax.Array | None = None,
    right_hand_pose: jax.Array | None = None,
) -> LBSOutput:
    """Pose the template. Shapes: betas (B, nb) or (nb,), body_pose
    (B, 69/63...) or 1-D, global_orient (B, 3) or (3,) or None."""
    if betas.ndim == 1:
        betas = betas[None]
    if body_pose.ndim == 1:
        body_pose = body_pose[None]
    b = max(betas.shape[0], body_pose.shape[0])
    if betas.shape[0] != b:
        betas = jnp.broadcast_to(betas, (b, betas.shape[-1]))
    if body_pose.shape[0] != b:
        body_pose = jnp.broadcast_to(body_pose, (b, body_pose.shape[-1]))
    if global_orient is None:
        global_orient = jnp.zeros((b, 3), body_pose.dtype)
    elif global_orient.ndim == 1:
        global_orient = jnp.broadcast_to(global_orient[None], (b, 3))

    pose = full_pose(tpl, global_orient, body_pose,
                     left_hand_pose=left_hand_pose,
                     right_hand_pose=right_hand_pose)
    # parents stay a numpy array: the kinematic chain is unrolled at
    # trace time (static topology)
    return lbs(
        betas, pose, tpl.v_template, tpl.shapedirs, tpl.posedirs,
        tpl.j_regressor, tpl.parents, tpl.lbs_weights,
        pose2rot=True, disable_posedirs=disable_posedirs,
    )


class CanonicalCache(NamedTuple):
    """Cached canonical-pose quantities (sings_hybrid.py:578-596)."""

    canonical_verts: jax.Array  # (V, 3)
    A_t2cano: jax.Array         # (J, 4, 4)
    inv_A_t2cano: jax.Array     # (J, 4, 4)
    canonical_offsets: jax.Array  # (V, 3) shape+pose offsets at canonical


def canonical_pose_cache(
    tpl: DeviceTemplate, betas: jax.Array,
    pose_type: str = "da_pose",
) -> CanonicalCache:
    body_pose = jnp.asarray(predefined_pose(pose_type))[None]
    out = smpl_forward(tpl, betas.reshape(1, -1), body_pose,
                       disable_posedirs=False)
    return CanonicalCache(
        canonical_verts=out.verts[0],
        A_t2cano=out.A[0],
        inv_A_t2cano=jnp.linalg.inv(out.A[0]),
        canonical_offsets=(out.shape_offsets + out.pose_offsets)[0],
    )
