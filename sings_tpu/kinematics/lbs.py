"""Linear blend skinning, pure JAX.

Functional equivalents of the reference's LBS stack
(sings/rec/utils/body_model/lbs.py:16-188 and the smplx primitives it
imports): blend shapes, joint regression, the kinematic-chain rigid
transform, full-model LBS, and `lbs_extra` — applying given per-joint
transforms A to arbitrary points with given skinning weights, which is
the canonical->posed gaussian deformation.

Shapes are batched (B, ...) throughout; everything jit/vmap-friendly.
The W @ A contraction is the big matmul (V x J) @ (J x 16) and runs on
the MXU; homogeneous point transforms are expressed as einsums so XLA
fuses them.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.rotations import axis_angle_to_matrix


def blend_shapes(betas: jax.Array, shape_dirs: jax.Array) -> jax.Array:
    """(B, nb) x (V, 3, nb) -> (B, V, 3)."""
    return jnp.einsum("bl,vcl->bvc", betas, shape_dirs)


def vertices2joints(j_regressor: jax.Array, vertices: jax.Array) -> jax.Array:
    """(J, V) x (B, V, 3) -> (B, J, 3)."""
    return jnp.einsum("jv,bvc->bjc", j_regressor, vertices)


def batch_rodrigues(pose: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 3, 3)."""
    return axis_angle_to_matrix(pose)


def batch_rigid_transform(
    rot_mats: jax.Array, joints: jax.Array, parents: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Kinematic-chain forward: per-joint world transforms.

    rot_mats: (B, J, 3, 3), joints: (B, J, 3), parents: (J,) NUMPY int
    array with parents[0] == -1 (static topology; the chain is unrolled
    at trace time).
    Returns (posed_joints (B, J, 3), rel_transforms A (B, J, 4, 4)) where
    A maps rest-pose-relative points, matching smplx.lbs semantics.
    """
    import numpy as np

    parents = np.asarray(parents)
    b, j, _ = joints.shape
    rel_joints = joints - jnp.where(
        jnp.asarray(parents >= 0)[None, :, None],
        joints[:, np.clip(parents, 0, None)], 0.0
    )

    # local 4x4
    t = jnp.concatenate([rot_mats, rel_joints[..., None]], axis=-1)  # (B,J,3,4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0, 0, 1.0], joints.dtype), (b, j, 1, 4)
    )
    local = jnp.concatenate([t, bottom], axis=-2)  # (B, J, 4, 4)

    # chain accumulation: J is tiny (24/52); unrolled python loop keeps it
    # a static chain of (B,4,4) matmuls that XLA fuses well.
    parents_list = [int(p) for p in parents]
    world = [local[:, 0]]
    for i in range(1, j):
        world.append(world[parents_list[i]] @ local[:, i])
    transforms = jnp.stack(world, axis=1)  # (B, J, 4, 4)

    posed_joints = transforms[..., :3, 3]
    # subtract the skinned rest-joint contribution (smplx convention)
    joints_hom = jnp.concatenate(
        [joints, jnp.zeros((b, j, 1), joints.dtype)], axis=-1
    )
    correction = jnp.einsum("bjxy,bjy->bjx", transforms, joints_hom)
    rel = transforms - jnp.pad(
        correction[..., :, None], ((0, 0), (0, 0), (0, 0), (3, 0))
    )
    return posed_joints, rel


class LBSOutput(NamedTuple):
    verts: jax.Array          # (B, V, 3) posed vertices
    joints: jax.Array         # (B, J, 3) posed joints
    A: jax.Array              # (B, J, 4, 4) per-joint transforms
    T: jax.Array              # (B, V, 4, 4) per-vertex transforms
    v_posed: jax.Array        # (B, V, 3) shaped+pose-corrected rest verts
    v_shaped: jax.Array       # (B, V, 3) shaped rest verts
    shape_offsets: jax.Array  # (B, V, 3)
    pose_offsets: jax.Array   # (B, V, 3)


def pose_feature_and_rotmats(pose: jax.Array, pose2rot: bool,
                             batch_size: int):
    ident = jnp.eye(3, dtype=jnp.float32)
    if pose2rot:
        rot_mats = batch_rodrigues(pose.reshape(batch_size, -1, 3))
    else:
        rot_mats = pose.reshape(batch_size, -1, 3, 3)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(batch_size, -1)
    return pose_feature, rot_mats


def skinning_transforms(A: jax.Array, lbs_weights: jax.Array) -> jax.Array:
    """T = W A: (B, J, 4, 4) x (V, J) -> (B, V, 4, 4). MXU contraction."""
    b, j = A.shape[0], A.shape[1]
    t = lbs_weights @ A.reshape(b, j, 16)  # (V,J)@(B,J,16) -> (B,V,16)
    return t.reshape(b, -1, 4, 4)


def apply_transforms(T: jax.Array, points: jax.Array) -> jax.Array:
    """(B, V, 4, 4) x (B, V, 3) -> (B, V, 3) homogeneous transform."""
    return jnp.einsum("bvxy,bvy->bvx", T[..., :3, :3], points) + T[..., :3, 3]


def lbs(
    betas: jax.Array,
    pose: jax.Array,
    v_template: jax.Array,
    shapedirs: jax.Array,
    posedirs: jax.Array | None,
    j_regressor: jax.Array,
    parents: jax.Array,
    lbs_weights: jax.Array,
    *,
    pose2rot: bool = True,
    disable_posedirs: bool = False,
    vert_offsets: jax.Array | None = None,
) -> LBSOutput:
    """Full SMPL-style LBS (reference lbs.py:77-188)."""
    batch_size = max(betas.shape[0], pose.shape[0])

    shape_offsets = blend_shapes(betas, shapedirs)
    v_shaped = v_template[None] + shape_offsets
    joints = vertices2joints(j_regressor, v_shaped)

    pose_feature, rot_mats = pose_feature_and_rotmats(pose, pose2rot,
                                                      batch_size)
    if disable_posedirs or posedirs is None:
        pose_offsets = jnp.zeros_like(v_shaped)
    else:
        pose_offsets = (pose_feature @ posedirs).reshape(batch_size, -1, 3)

    v_posed = v_shaped + pose_offsets
    if vert_offsets is not None:
        v_posed = v_posed + vert_offsets

    posed_joints, A = batch_rigid_transform(rot_mats, joints, parents)
    T = skinning_transforms(A, lbs_weights)
    verts = apply_transforms(T, v_posed)

    return LBSOutput(
        verts=verts, joints=posed_joints, A=A, T=T, v_posed=v_posed,
        v_shaped=v_shaped, shape_offsets=shape_offsets,
        pose_offsets=pose_offsets,
    )


def lbs_extra(
    A: jax.Array,
    v_shaped: jax.Array,
    lbs_weights: jax.Array,
    pose: jax.Array | None = None,
    posedirs: jax.Array | None = None,
    *,
    disable_posedirs: bool = True,
    pose2rot: bool = True,
):
    """Apply given per-joint transforms to arbitrary points.

    This is the canonical->posed gaussian deformation (reference
    lbs.py:16-74): A is typically A_t2pose @ inv(A_t2cano).
    Returns (verts (B,V,3), T (B,V,4,4)).
    """
    batch_size = A.shape[0]
    if disable_posedirs or posedirs is None:
        v_posed = v_shaped
    else:
        pose_feature, _ = pose_feature_and_rotmats(pose, pose2rot, batch_size)
        v_posed = v_shaped + (pose_feature @ posedirs).reshape(
            batch_size, -1, 3)
    T = skinning_transforms(A, lbs_weights)
    verts = apply_transforms(T, v_posed)
    return verts, T
