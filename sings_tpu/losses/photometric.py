"""Photometric training losses (reference sings/rec/losses/loss.py:41-92).

masked L1 (sum / mask area), SSIM scaled by mask fraction, and
LPIPS on masked random patches composited over random-noise background.
Patch sampling is redesigned static-shape: instead of rejection-sampling
pixel coordinates on host (reference sampler.py:16-44), we draw
categorical samples from the mask treated as a distribution — same
"90% inside mask" behavior, fully jittable.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.ssim import ssim


def masked_l1(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """sum |pred - gt| / sum(mask) (loss utils.py:16-18)."""
    return jnp.abs(pred - gt).sum() / jnp.maximum(mask.sum(), 1.0)


def ssim_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """(1 - ssim) * mask_fraction (loss.py:66-67)."""
    frac = mask.sum() / (pred.shape[-1] * pred.shape[-2])
    return (1.0 - ssim(pred, gt)) * frac


def sample_patches(
    rng: jax.Array,
    mask: jax.Array,
    images: tuple[jax.Array, ...],
    *,
    num_patches: int = 4,
    patch_size: int = 128,
    ratio_mask: float = 0.9,
) -> tuple[jax.Array, ...]:
    """Sample aligned square patches, mostly centered inside the mask.

    mask: (H, W); images: (C, H, W) each. Returns per input a stacked
    (num_patches, C, patch_size, patch_size).
    """
    h, w = mask.shape
    half = patch_size // 2
    k_in, k_u, k_choice = jax.random.split(rng, 3)

    # categorical over interior mask pixels (valid as patch top-left + half)
    interior = jax.lax.dynamic_slice(
        mask, (half, half), (h - patch_size, w - patch_size)
    )
    logits = jnp.where(interior.reshape(-1) > 0, 0.0, -1e9)
    idx = jax.random.categorical(k_in, logits, shape=(num_patches,))
    ys_in = idx // (w - patch_size)
    xs_in = idx % (w - patch_size)

    ys_un = jax.random.randint(k_u, (num_patches,), 0, h - patch_size)
    xs_un = jax.random.randint(k_u, (num_patches,), 0, w - patch_size)

    use_mask = jax.random.uniform(k_choice, ()) < ratio_mask
    ys = jnp.where(use_mask, ys_in, ys_un)
    xs = jnp.where(use_mask, xs_in, xs_un)

    def crop(img):
        def one(y, x):
            return jax.lax.dynamic_slice(
                img, (0, y, x), (img.shape[0], patch_size, patch_size)
            )
        return jax.vmap(one)(ys, xs)

    return tuple(crop(img) for img in images)


class PhotometricWeights(NamedTuple):
    l1: float = 0.8
    ssim: float = 0.2
    lpips: float = 1.0
    num_patches: int = 4
    patch_size: int = 128


def photometric_loss(
    rng: jax.Array,
    pred: jax.Array,
    gt_rgb: jax.Array,
    mask: jax.Array,
    bg_color: jax.Array,
    weights: PhotometricWeights,
    lpips_fn=None,
) -> tuple[jax.Array, dict]:
    """Full photometric objective. pred/gt_rgb (3, H, W), mask (H, W).

    gt is composited over bg_color like the reference (loss.py:55);
    LPIPS patches use a random-noise background (loss.py:73-75).
    """
    m = mask[None]
    gt = gt_rgb * m + bg_color[:, None, None] * (1.0 - m)
    losses = {}
    total = 0.0
    if weights.l1 > 0:
        losses["l1"] = weights.l1 * masked_l1(pred, gt, mask)
        total = total + losses["l1"]
    if weights.ssim > 0:
        losses["ssim"] = weights.ssim * ssim_loss(pred, gt, mask)
        total = total + losses["ssim"]
    if weights.lpips > 0 and lpips_fn is not None:
        k_bg, k_patch = jax.random.split(rng)
        noise = jax.random.uniform(k_bg, pred.shape, pred.dtype)
        pred_bg = pred * m + noise * (1.0 - m)
        gt_bg = gt * m + noise * (1.0 - m)
        pred_p, gt_p = sample_patches(
            k_patch, mask, (pred_bg, gt_bg),
            num_patches=weights.num_patches, patch_size=weights.patch_size,
        )
        losses["lpips_patch"] = weights.lpips * lpips_fn(
            pred_p.clip(max=1.0), gt_p
        ).mean()
        total = total + losses["lpips_patch"]
    return total, losses
