"""Camera / projection math (3DGS OpenGL-style conventions), pure JAX.

Matches the reference conventions (sings/rec/utils/graphics.py):
  * row-vector convention: matrices are stored transposed so points
    transform as  p_hom @ M  (the reference's `world_view_transform`
    is the world-to-camera matrix transposed).
  * projection maps camera z in [znear, zfar] to NDC with w = z.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Camera(NamedTuple):
    """Static per-frame camera. All matrices use the row-vector convention.

    view: (4,4)   world-to-camera, transposed (p_cam = p_hom @ view)
    proj: (4,4)   full world-to-clip, transposed (p_clip = p_hom @ proj)
    cam_center: (3,) camera position in world space
    height, width: python ints (static for jit)
    tan_fovx, tan_fovy: floats
    """

    view: jax.Array
    proj: jax.Array
    cam_center: jax.Array
    height: int
    width: int
    tan_fovx: float
    tan_fovy: float
    # EWA view-space clamp limits; differ from tan_fov* only for
    # strip sub-cameras (dist/shard.camera_strip), where the physical
    # frustum is wider than the rendered strip
    clamp_tan_fovx: float | None = None
    clamp_tan_fovy: float | None = None


def projection_matrix(znear, zfar, fovx, fovy) -> np.ndarray:
    """Centered perspective projection (reference graphics.py:65-85).

    Returns the matrix in the math convention (column vectors); callers
    transpose for the row-vector convention.
    """
    t = math.tan(fovy / 2) * znear
    r = math.tan(fovx / 2) * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / r
    P[1, 1] = znear / t
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def projection_matrix_center(znear, zfar, fx, fy, cx, cy, width, height) -> np.ndarray:
    """Principal-point-offset projection (reference graphics.py:50-62)."""
    cx = width - cx
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * fx / width
    P[1, 1] = 2.0 * fy / height
    P[0, 2] = 1.0 - 2.0 * cx / width
    P[1, 2] = 2.0 * cy / height - 1.0
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov, pixels):
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal, pixels):
    return 2 * math.atan(pixels / (2 * focal))


def make_camera(
    extrinsic_w2c: np.ndarray,
    height: int,
    width: int,
    *,
    fovx: float | None = None,
    fovy: float | None = None,
    K: np.ndarray | None = None,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    """Build a Camera from a world-to-camera 4x4 and intrinsics.

    If K is given, handles a non-centered principal point the way the
    reference dataset does (Customdataset.py:109-126); otherwise fovx/fovy
    must be provided.
    """
    w2c = np.asarray(extrinsic_w2c, dtype=np.float32)
    if K is not None:
        K = np.asarray(K, dtype=np.float32)
        non_centered = (
            abs(height // 2 - K[1, 2]) > 1.0 or abs(width // 2 - K[0, 2]) > 1.0
        )
        fov_left = math.atan(K[0, 2] / K[0, 0])
        fov_right = math.atan((width - K[0, 2]) / K[0, 0])
        fov_top = math.atan(K[1, 2] / K[1, 1])
        fov_bottom = math.atan((height - K[1, 2]) / K[1, 1])
        fovx = fov_left + fov_right
        fovy = fov_top + fov_bottom
        if non_centered:
            P = projection_matrix_center(
                znear, zfar, K[0, 0], K[1, 1], K[0, 2], K[1, 2], width, height
            )
        else:
            fovx = 2 * math.atan(width / (2 * K[0, 0]))
            fovy = 2 * math.atan(height / (2 * K[1, 1]))
            P = projection_matrix(znear, zfar, fovx, fovy)
    else:
        assert fovx is not None and fovy is not None
        P = projection_matrix(znear, zfar, fovx, fovy)

    view = w2c.T  # row-vector convention
    proj = view @ P.T
    cam_center = np.linalg.inv(view)[3, :3]
    return Camera(
        view=jnp.asarray(view),
        proj=jnp.asarray(proj),
        cam_center=jnp.asarray(cam_center),
        height=int(height),
        width=int(width),
        tan_fovx=float(math.tan(fovx * 0.5)),
        tan_fovy=float(math.tan(fovy * 0.5)),
    )
