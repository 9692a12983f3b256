"""Gaussian-splatting screen-space preprocess, pure JAX.

Reproduces the semantics of the CUDA diff-gaussian-rasterization forward
preprocess (the external dependency of the reference renderer,
sings/rec/renderer/gs_renderer_single.py:6-9,69-95): perspective
projection, EWA 2D covariance with the 0.3-pixel dilation, 3-sigma
radius, SH-to-RGB with clamping, frustum culling at z <= 0.2.

Everything here is differentiable by XLA autodiff; the non-differentiable
outputs (radius, tile spans, validity mask) are integers used only for
binning/ordering, matching the CUDA code which treats them the same way.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..graphics import Camera
from ..rotations import quaternion_to_matrix
from ..sh import sh_to_rgb


class Gaussians2D(NamedTuple):
    """Screen-space gaussians after preprocessing. All (N, ...)."""

    means2d: jax.Array   # (N, 2) pixel coords
    depths: jax.Array    # (N,) camera-space z
    conics: jax.Array    # (N, 3) inverse 2D covariance (a, b, c)
    colors: jax.Array    # (N, 3) RGB
    opacities: jax.Array  # (N,)
    radii: jax.Array     # (N,) int32 screen radius, 0 => invisible
    mask: jax.Array      # (N,) bool visibility


def build_covariance_3d(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """Sigma = R S S^T R^T. scales (N,3), quats (N,4) -> (N,3,3)."""
    R = quaternion_to_matrix(quats)
    M = R * scales[:, None, :]  # R @ diag(s)
    return M @ M.transpose(0, 2, 1)


def project_cov3d_to_2d(
    cov3d: jax.Array, p_view: jax.Array, camera: Camera
) -> jax.Array:
    """EWA splatting: camera-space covariance -> 2D screen covariance.

    Matches CUDA computeCov2D: clamped view-space tangents, focal-scaled
    Jacobian, + 0.3 low-pass dilation on the diagonal.
    Returns (N, 3) as (cov_xx, cov_xy, cov_yy).
    """
    focal_x = camera.width / (2.0 * camera.tan_fovx)
    focal_y = camera.height / (2.0 * camera.tan_fovy)

    z = p_view[:, 2]
    # `is None` (not `or`): the clamp fields may be traced scalars when
    # the camera is built inside a sharded/batched step
    limx = 1.3 * (camera.tan_fovx if camera.clamp_tan_fovx is None
                  else camera.clamp_tan_fovx)
    limy = 1.3 * (camera.tan_fovy if camera.clamp_tan_fovy is None
                  else camera.clamp_tan_fovy)
    txtz = jnp.clip(p_view[:, 0] / z, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / z, -limy, limy)
    tx = txtz * z
    ty = tytz * z

    # J rows: d(pix)/d(cam xyz), third row irrelevant
    j00 = focal_x / z
    j02 = -(focal_x * tx) / (z * z)
    j11 = focal_y / z
    j12 = -(focal_y * ty) / (z * z)

    # world -> camera rotation (row-vector storage: R_w2c = view[:3,:3]^T)
    W = camera.view[:3, :3].T
    cov_cam = jnp.einsum("ij,njk,lk->nil", W, cov3d, W)

    # cov2d = J cov_cam J^T restricted to the first two rows of J
    c00 = cov_cam[:, 0, 0]
    c01 = cov_cam[:, 0, 1]
    c02 = cov_cam[:, 0, 2]
    c11 = cov_cam[:, 1, 1]
    c12 = cov_cam[:, 1, 2]
    c22 = cov_cam[:, 2, 2]

    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)

    return jnp.stack([a + 0.3, b, c + 0.3], axis=-1)


def preprocess(
    means3d: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    opacities: jax.Array,
    features: jax.Array,
    camera: Camera,
    *,
    sh_degree: int = 0,
    scale_modifier: float = 1.0,
    alive: jax.Array | None = None,
    tile: int = 16,
) -> Gaussians2D:
    """Project gaussians into screen space.

    Args:
      means3d: (N, 3) world positions.
      scales: (N, 3) activated scales.
      quats: (N, 4) scalar-first rotations (pass identity for isotropic).
      opacities: (N,) or (N, 1) activated opacity.
      features: (N, K, 3) SH coefficients or (N, 3) precomputed RGB.
      camera: Camera (row-vector convention matrices).
      sh_degree: active SH degree (static int) when features are SH.
      alive: optional (N,) bool mask for padded buffers.
    """
    n = means3d.shape[0]
    if opacities.ndim == 2:
        opacities = opacities[:, 0]

    ones = jnp.ones((n, 1), means3d.dtype)
    p_hom4 = jnp.concatenate([means3d, ones], axis=1)
    p_view = p_hom4 @ camera.view  # (N, 4)
    p_clip = p_hom4 @ camera.proj
    p_w = 1.0 / (p_clip[:, 3] + 1e-7)
    ndc = p_clip[:, :3] * p_w[:, None]

    in_front = p_view[:, 2] > 0.2

    cov3d = build_covariance_3d(scales * scale_modifier, quats)
    cov2d = project_cov3d_to_2d(cov3d, p_view[:, :3], camera)

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conics = jnp.stack(
        [cov2d[:, 2], -cov2d[:, 1], cov2d[:, 0]], axis=-1
    ) / det_safe[:, None]

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    means2d = jnp.stack(
        [
            ((ndc[:, 0] + 1.0) * camera.width - 1.0) * 0.5,
            ((ndc[:, 1] + 1.0) * camera.height - 1.0) * 0.5,
        ],
        axis=-1,
    )

    if features.ndim == 3:
        dirs = means3d - camera.cam_center[None, :]
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
        colors = sh_to_rgb(sh_degree, features, dirs)
    else:
        colors = features

    mask = in_front & det_ok
    if alive is not None:
        mask = mask & alive
    radii = jnp.where(mask, radius_f, 0.0).astype(jnp.int32)
    mask = mask & (radii > 0)
    # CUDA preprocessCUDA returns before writing the radius when the
    # getRect tile rectangle has zero area (gaussian fully off-screen),
    # so such gaussians have radii == 0 and visibility_filter False —
    # which gates the trainer's density-control statistics. Reproduce
    # that cull here (grid = ceil(size / tile), same clamping as
    # tile_rect below).
    ntx = -(-camera.width // tile)
    nty = -(-camera.height // tile)
    r = radii.astype(means2d.dtype)
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - r) / tile), 0, ntx)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - r) / tile), 0, nty)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + r + tile - 1) / tile), 0, ntx)
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + r + tile - 1) / tile), 0, nty)
    mask = mask & ((x1 - x0) * (y1 - y0) > 0)
    radii = jnp.where(mask, radii, 0)

    return Gaussians2D(
        means2d=means2d,
        depths=p_view[:, 2],
        conics=conics,
        colors=colors,
        opacities=opacities,
        radii=radii,
        mask=mask,
    )


def tile_rect(g: Gaussians2D, tile: int, n_tiles_x: int, n_tiles_y: int):
    """Per-gaussian tile bounding rectangle, CUDA getRect semantics.

    Returns (x0, y0, x1, y1) int32 arrays; empty rect (x1<=x0 etc.) means
    the gaussian touches no tile.
    """
    r = g.radii.astype(jnp.float32)
    x0 = jnp.clip(((g.means2d[:, 0] - r) / tile).astype(jnp.int32), 0, n_tiles_x)
    y0 = jnp.clip(((g.means2d[:, 1] - r) / tile).astype(jnp.int32), 0, n_tiles_y)
    x1 = jnp.clip(((g.means2d[:, 0] + r + tile - 1) / tile).astype(jnp.int32),
                  0, n_tiles_x)
    y1 = jnp.clip(((g.means2d[:, 1] + r + tile - 1) / tile).astype(jnp.int32),
                  0, n_tiles_y)
    # floor() of negative values: cast truncates toward zero; recompute with floor
    x0 = jnp.clip(jnp.floor((g.means2d[:, 0] - r) / tile).astype(jnp.int32), 0, n_tiles_x)
    y0 = jnp.clip(jnp.floor((g.means2d[:, 1] - r) / tile).astype(jnp.int32), 0, n_tiles_y)
    return x0, y0, x1, y1
