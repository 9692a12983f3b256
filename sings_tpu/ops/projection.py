"""3D <-> 2D point projection utilities
(reference sings/rec/utils/geometry/pcd_projector.py:40-225), used by
the keypoint-reprojection losses in the preprocess refiner.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def project_points(points: jax.Array, K: jax.Array,
                   extrinsic: jax.Array | None = None) -> jax.Array:
    """(N, 3) world points -> (N, 3) [u, v, depth] pixel coords.

    K: (3, 3) intrinsics; extrinsic: optional (4, 4) world-to-camera.
    """
    if extrinsic is not None:
        p = points @ extrinsic[:3, :3].T + extrinsic[:3, 3]
    else:
        p = points
    uvw = p @ K.T
    z = uvw[:, 2:3]
    uv = uvw[:, :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return jnp.concatenate([uv, z], axis=1)


def unproject_points(uvd: jax.Array, K: jax.Array,
                     c2w: jax.Array | None = None) -> jax.Array:
    """(N, 3) [u, v, depth] -> (N, 3) points (camera or world frame)."""
    uv1 = jnp.concatenate(
        [uvd[:, :2], jnp.ones_like(uvd[:, :1])], axis=1)
    rays = uv1 @ jnp.linalg.inv(K).T
    p_cam = rays * uvd[:, 2:3]
    if c2w is not None:
        p_cam = p_cam @ c2w[:3, :3].T + c2w[:3, 3]
    return p_cam
