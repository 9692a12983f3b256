"""SSIM with an 11x11 Gaussian window, matching the 3DGS formulation
(reference: sings/rec/losses/utils.py:27-70).

Implemented with XLA depthwise convolutions (lax.conv_general_dilated with
feature_group_count) so it fuses well on TPU. Separable 1D passes halve
the FLOPs relative to the reference's 2D window.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jax.Array, win: jax.Array) -> jax.Array:
    """Depthwise separable Gaussian blur. img: (C, H, W)."""
    c, _, _ = img.shape
    w = win.shape[0]
    pad = w // 2
    x = img[None]  # NCHW
    kh = jnp.broadcast_to(win.reshape(1, 1, w, 1), (c, 1, w, 1))
    kw = jnp.broadcast_to(win.reshape(1, 1, 1, w), (c, 1, 1, w))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=c)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=c)
    return x[0]


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         sigma: float = 1.5) -> jax.Array:
    """Mean SSIM over a (C, H, W) image pair (or (..., C, H, W) batches)."""
    if img1.ndim == 4:
        return jax.vmap(lambda a, b: ssim(a, b, window_size, sigma))(
            img1, img2).mean()
    win = jnp.asarray(_gaussian_window(window_size, sigma))
    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win) - mu2_sq
    sigma12 = _blur(img1 * img2, win) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map.mean()


def psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """PSNR per image over flattened channels (reference image.py:15-17)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
