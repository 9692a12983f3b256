"""Dense pure-JAX alpha compositor: the numerical ground truth.

O(H*W*N) — for tests and tiny scenes only. Differentiable end-to-end by
XLA autodiff; the Pallas tile kernels are validated against this both in
value and in gradient. The skip/terminate rules replicate the CUDA
renderCUDA loop exactly:

  * skip if power > 0 or alpha < 1/255 (no contribution, no termination)
  * alpha = min(0.99, opacity * exp(power))
  * terminate (this gaussian excluded) when T * (1 - alpha) < 1e-4

Because T is non-increasing, the termination flag computed from the
unfrozen cumulative product is already monotone, so one vectorized
exclusive-cumprod pass reproduces the sequential loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Gaussians2D

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def composite_dense(
    g: Gaussians2D, height: int, width: int, bg: jax.Array,
    tile: int | None = 16,
) -> tuple[jax.Array, jax.Array]:
    """Composite all gaussians over every pixel, in depth order.

    tile: when set, a gaussian only affects pixels whose tile lies inside
    its 3-sigma tile rectangle — the CUDA binning granularity. The tiled
    kernels and the CUDA implementation share this cutoff; pass None for
    an uncut mathematical compositor.

    Returns (image (3, H, W), final transmittance (H, W)).
    """
    # Global front-to-back order; masked gaussians pushed to the end.
    depth_key = jnp.where(g.mask, g.depths, jnp.inf)
    order = jnp.argsort(depth_key)
    means2d = g.means2d[order]
    conics = g.conics[order]
    colors = g.colors[order]
    opac = g.opacities[order]
    mask = g.mask[order]

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    px = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H, W, 2)
    pix = px.reshape(-1, 2)  # (P, 2)

    # (P, N) pairwise quadratic form. d = mean - pixel (CUDA convention).
    dx = means2d[None, :, 0] - pix[:, 0:1]
    dy = means2d[None, :, 1] - pix[:, 1:2]
    a, b, c = conics[:, 0], conics[:, 1], conics[:, 2]
    power = -0.5 * (a[None] * dx * dx + c[None] * dy * dy) - b[None] * dx * dy
    alpha_unclamped = opac[None] * jnp.exp(power)
    # CUDA-quirk gradients: backward.cu computes dL_dopacity = G *
    # dL_dalpha and dL_dG = op * dL_dalpha even when alpha saturated at
    # 0.99 — the clamp is a VALUE clamp only, never a gradient gate.
    # Straight-through: value = clamped, derivative = unclamped.
    # (Caught by tests/test_cuda_rules.py::test_backward_ignores_099_
    # clamp_quirk — the Pallas kernel already had the quirk.)
    alpha_raw = alpha_unclamped + jax.lax.stop_gradient(
        jnp.minimum(0.99, alpha_unclamped) - alpha_unclamped)
    skip = (power > 0.0) | (alpha_raw < ALPHA_MIN) | (~mask)[None]
    if tile is not None:
        from .common import tile_rect

        ntx = -(-width // tile)
        nty = -(-height // tile)
        g_sorted = g._replace(
            means2d=means2d, radii=g.radii[order], mask=mask,
            depths=g.depths[order], conics=conics, colors=colors,
            opacities=opac,
        )
        x0, y0, x1, y1 = tile_rect(g_sorted, tile, ntx, nty)
        ptx = (pix[:, 0] // tile).astype(jnp.int32)
        pty = (pix[:, 1] // tile).astype(jnp.int32)
        in_rect = (
            (x0[None] <= ptx[:, None]) & (ptx[:, None] < x1[None])
            & (y0[None] <= pty[:, None]) & (pty[:, None] < y1[None])
        )
        skip = skip | ~in_rect
    alpha = jnp.where(skip, 0.0, alpha_raw)

    one_minus = 1.0 - alpha
    # exclusive cumprod along gaussian axis = transmittance before gaussian i
    t_before = jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]), jnp.cumprod(one_minus[:, :-1], axis=1)],
        axis=1,
    )
    flag = (t_before * one_minus) >= T_EPS
    alpha_eff = alpha * flag

    w = alpha_eff * jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]),
         jnp.cumprod(1.0 - alpha_eff[:, :-1], axis=1)],
        axis=1,
    )
    color_acc = w @ colors  # (P, 3)
    t_final = jnp.prod(1.0 - alpha_eff, axis=1)  # (P,)

    img = color_acc + t_final[:, None] * bg[None, :]
    img = img.reshape(height, width, 3).transpose(2, 0, 1)
    return img, t_final.reshape(height, width)
