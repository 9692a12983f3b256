"""Rotation representation conversions, pure JAX.

Covers the conversion set the avatar model needs (reference:
sings/rec/utils/geometry/rotations.py — pytorch3d-style conventions):
quaternion (w, x, y, z scalar-first) <-> matrix <-> axis-angle <-> 6D.

All functions are batched over leading dimensions and autodiff-safe
(guarded sqrt / division near singularities).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _safe_sqrt(x, eps=1e-18):
    return jnp.sqrt(jnp.maximum(x, eps))


def quaternion_to_matrix(quat: jax.Array) -> jax.Array:
    """(..., 4) scalar-first quaternion -> (..., 3, 3) rotation matrix."""
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) scalar-first quaternion.

    Branch-free variant: compute all four candidate quaternions and select
    the numerically best (largest pivot), as pytorch3d does.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = _safe_sqrt(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        ).clip(0.0)
    )

    quat_by_w = jnp.stack(
        [q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1
    )
    quat_by_x = jnp.stack(
        [m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1
    )
    quat_by_y = jnp.stack(
        [m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1
    )
    quat_by_z = jnp.stack(
        [m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1
    )
    quat_candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)
    quat_candidates = quat_candidates / (2.0 * q_abs[..., None].clip(0.1))

    best = jnp.argmax(q_abs, axis=-1)
    quat = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, -1), axis=-2
    )[..., 0, :]
    return quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-12)


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3)."""
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small_v = sq < 1e-16
    # double-where: keep the singular input out of the sqrt/div graph so
    # gradients stay finite at angle == 0
    sq_safe = jnp.where(small_v, 1.0, sq)
    angle = jnp.where(small_v, 0.0, jnp.sqrt(sq_safe))
    safe = jnp.maximum(angle, 1e-12)
    axis = jnp.where(small_v, 0.0, axis_angle / safe)
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1
    ).reshape(axis_angle.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), K.shape)
    R = eye + s * K + (1 - c) * (K @ K)
    # At angle ~ 0, fall back to first-order expansion (identity + K*theta)
    K_raw = jnp.stack(
        [zeros, -axis_angle[..., 2], axis_angle[..., 1],
         axis_angle[..., 2], zeros, -axis_angle[..., 0],
         -axis_angle[..., 1], axis_angle[..., 0], zeros], axis=-1
    ).reshape(K.shape)
    return jnp.where(small_v[..., None], eye + K_raw, R)


def matrix_to_axis_angle(matrix: jax.Array) -> jax.Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def quaternion_to_axis_angle(quat: jax.Array) -> jax.Array:
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-12)
    # Ensure w >= 0 for a unique representation
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = q[..., 0].clip(-1.0, 1.0)
    xyz = q[..., 1:]
    # double-where norm: jnp.linalg.norm's backward divides by the norm,
    # so at xyz == 0 (identity rotation) even a zero cotangent turns
    # into NaN — keep the singular input out of the sqrt graph entirely
    sq = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    small = sq < 1e-14
    norm = jnp.where(small, 0.0, jnp.sqrt(jnp.where(small, 1.0, sq)))
    angle = 2.0 * jnp.arctan2(norm[..., 0], w)[..., None]
    # near 0: angle/norm -> 2/w (w ~ 1 there; clip guards the dead branch)
    scale = jnp.where(small, 2.0 / w[..., None].clip(0.5),
                      angle / jnp.where(small, 1.0, norm))
    return xyz * scale


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(half)/angle, stable near 0: 0.5 - angle^2/48
    sinc = jnp.where(angle < 1e-6, 0.5 - angle * angle / 48.0,
                     jnp.sin(half) / jnp.maximum(angle, 1e-12))
    return jnp.concatenate([jnp.cos(half), axis_angle * sinc], axis=-1)


def matrix_to_rotation_6d(matrix: jax.Array) -> jax.Array:
    """First two rows of the rotation matrix, flattened: (..., 6)."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Gram-Schmidt per Zhou et al. (..., 6) -> (..., 3, 3)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.linalg.norm(a2p, axis=-1, keepdims=True).clip(1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def axis_angle_to_rotation_6d(axis_angle: jax.Array) -> jax.Array:
    return matrix_to_rotation_6d(axis_angle_to_matrix(axis_angle))


def rotation_6d_to_axis_angle(d6: jax.Array) -> jax.Array:
    return matrix_to_axis_angle(rotation_6d_to_matrix(d6))


def quaternion_raw_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def standardize_quaternion(quat: jax.Array) -> jax.Array:
    """Canonical versor with nonnegative real part (rotations.py:357)."""
    return jnp.where(quat[..., :1] < 0, -quat, quat)


def quaternion_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Composition of rotations, standardized like the reference's
    pytorch3d-style quaternion_multiply (rotations.py:393-408)."""
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_apply(quat: jax.Array, point: jax.Array) -> jax.Array:
    """Rotate (..., 3) points by (..., 4) quaternions."""
    return (quaternion_to_matrix(quat) @ point[..., None])[..., 0]


def rotation_matrix_from_vectors(a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-row rotation aligning unit-ish vectors a -> b. (N,3),(N,3)->(N,3,3).

    Same construction as the reference's torch_rotation_matrix_from_vectors
    (sings/rec/utils/general.py:205), with a guarded parallel case.
    """
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True).clip(1e-12)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True).clip(1e-12)
    v = jnp.cross(a, b)
    c = jnp.sum(a * b, axis=-1)
    s2 = jnp.sum(v * v, axis=-1)
    zeros = jnp.zeros_like(v[..., 0])
    K = jnp.stack(
        [zeros, -v[..., 2], v[..., 1],
         v[..., 2], zeros, -v[..., 0],
         -v[..., 1], v[..., 0], zeros], axis=-1
    ).reshape(v.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), K.shape)
    factor = ((1 - c) / jnp.maximum(s2, 1e-12))[..., None, None]
    R = eye + K + (K @ K) * factor
    # Degenerate: a ~ +-b. Identity for parallel; 180-deg flip for antiparallel.
    parallel = (s2 < 1e-12)[..., None, None]
    flip = -eye + 2.0 * a[..., :, None] * a[..., None, :]  # householder-ish
    fallback = jnp.where((c > 0)[..., None, None], eye, flip)
    return jnp.where(parallel, fallback, R)
