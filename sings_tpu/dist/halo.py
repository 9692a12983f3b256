"""Halo exchange for strip-sharded image losses.

SSIM needs an 11x11 window; when the image is sharded into horizontal
strips over the `gs` mesh axis, each rank fetches `halo` boundary rows
from its neighbors with two ppermute shifts over ICI, computes the
windowed loss on the padded strip, and crops back — the distributed
result matches the full-image computation exactly except at the true
image borders (where both use zero padding).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_exchange_rows(x: jax.Array, axis_name: str, halo: int) -> jax.Array:
    """Pad a (C, H_strip, W) strip with `halo` rows from its neighbors.

    Must run inside shard_map with `axis_name` defined. Edge ranks get
    zero padding (matching conv zero padding at image borders).
    Returns (C, H_strip + 2*halo, W).
    """
    n = jax.lax.axis_size(axis_name)
    top_rows = x[:, :halo]       # my first rows -> previous rank's bottom halo
    bot_rows = x[:, -halo:]      # my last rows -> next rank's top halo

    # receive from the previous rank (their bottom rows = my top halo)
    from_prev = jax.lax.ppermute(
        bot_rows, axis_name, [(i, i + 1) for i in range(n - 1)])
    # receive from the next rank (their top rows = my bottom halo)
    from_next = jax.lax.ppermute(
        top_rows, axis_name, [(i + 1, i) for i in range(n - 1)])

    return jnp.concatenate([from_prev, x, from_next], axis=1)


def strip_ssim_local(pred: jax.Array, gt: jax.Array, axis_name: str,
                     window_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """This rank's LOCAL contribution to the full-image mean SSIM.

    Rank-sum of the result equals single-device ssim(pred_full, gt_full)
    (equal strip heights assumed). Crucially there is NO psum/pmean on
    the return value: under shard_map(check_vma=False) the transpose of
    psum is psum — differentiating through a psum of a param-dependent
    value overcounts gradients by the axis size. Cross-strip coupling
    flows only through the halo ppermutes, whose transpose is exact.
    Callers inside jax.grad must use this local form and psum OUTSIDE
    the differentiated function (see dist/train_sharded.py).
    """
    from ..ops.ssim import _band_matrix, _blur, _ssim_map

    halo = window_size // 2
    p = halo_exchange_rows(pred, axis_name, halo)
    g = halo_exchange_rows(gt, axis_name, halo)

    bh = jnp.asarray(_band_matrix(p.shape[1], window_size, sigma))
    bw = jnp.asarray(_band_matrix(p.shape[2], window_size, sigma))

    def blur(x):
        return _blur(x, bh, bw)

    ssim_map = _ssim_map(blur, p, g)
    core = ssim_map[:, halo:-halo]  # this rank's rows only
    return core.mean() / jax.lax.axis_size(axis_name)


def halo_exchange_rows_bounded(x: jax.Array, axis_name: str, halo: int,
                               h_own: jax.Array) -> jax.Array:
    """Halo exchange for pair-balanced strips (variable owned heights).

    x is a STATIC (C, h_max, W) strip window that OWNS only its first
    h_own rows (traced; docs/SCALING.md mitigation 2). The bottom halo
    from the next rank is placed at the traced row halo + h_own —
    overwriting the window's padding rows, which belong to the next
    rank (the overwrite also zeroes their cotangents in the transpose,
    exactly as the ownership contract requires). Returns
    (C, h_max + 2*halo, W); rows [halo, halo + h_own) are the owned
    core with exact full-image SSIM windows.
    """
    n = jax.lax.axis_size(axis_name)
    top_rows = x[:, :halo]
    bot_rows = jax.lax.dynamic_slice_in_dim(
        x, jnp.maximum(h_own - halo, 0), halo, axis=1)

    from_prev = jax.lax.ppermute(
        bot_rows, axis_name, [(i, i + 1) for i in range(n - 1)])
    from_next = jax.lax.ppermute(
        top_rows, axis_name, [(i + 1, i) for i in range(n - 1)])

    buf = jnp.concatenate(
        [from_prev, x, jnp.zeros_like(top_rows)], axis=1)
    return jax.lax.dynamic_update_slice_in_dim(
        buf, from_next, halo + h_own, axis=1)


def strip_ssim_local_bounded(pred: jax.Array, gt: jax.Array,
                             axis_name: str, h_own: jax.Array,
                             full_pixels: float, window_size: int = 11,
                             sigma: float = 1.5) -> jax.Array:
    """Local mean-SSIM contribution for a pair-balanced strip.

    pred/gt are (C, h_max, W) windows owning rows [0, h_own);
    full_pixels = H * W of the FULL image. Rank-sum of the result
    equals single-device ssim(pred_full, gt_full) — same gradient-
    safety contract as strip_ssim_local (no psum inside grad)."""
    from ..ops.ssim import _band_matrix, _blur, _ssim_map

    halo = window_size // 2
    p = halo_exchange_rows_bounded(pred, axis_name, halo, h_own)
    g = halo_exchange_rows_bounded(gt, axis_name, halo, h_own)

    bh = jnp.asarray(_band_matrix(p.shape[1], window_size, sigma))
    bw = jnp.asarray(_band_matrix(p.shape[2], window_size, sigma))

    def blur(x):
        return _blur(x, bh, bw)

    smap = _ssim_map(blur, p, g)
    core = smap[:, halo:halo + pred.shape[1]]
    rm = (jnp.arange(pred.shape[1]) < h_own).astype(core.dtype)
    return jnp.sum(core * rm[None, :, None]) / (
        core.shape[0] * full_pixels)


def strip_ssim(pred: jax.Array, gt: jax.Array, axis_name: str,
               window_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Mean SSIM of a strip-sharded image pair, exact vs the full image.

    Value-only convenience (psum of the local contributions) — do NOT
    differentiate through this inside shard_map(check_vma=False); use
    strip_ssim_local (see its docstring).
    """
    return jax.lax.psum(
        strip_ssim_local(pred, gt, axis_name, window_size, sigma),
        axis_name)
