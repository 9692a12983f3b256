"""SSIM with an 11x11 Gaussian window, matching the 3DGS formulation
(reference: sings/rec/losses/utils.py:27-70).

The separable Gaussian blur is applied as two small banded MATMULS
(B_H @ img @ B_W^T) rather than depthwise convolutions: a depthwise
conv with C=3 runs one channel per group on the VPU (7.6 ms fwd+bwd at
512x896 on v5e), while the banded matmuls ride the MXU — same math
(zero-padded SAME conv == truncated banded rows), ~10x faster, and the
backward is just the transposed matmuls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _band_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """(n, n) banded matrix equivalent to zero-padded SAME 1D conv."""
    win = _gaussian_window(window_size, sigma)
    half = window_size // 2
    m = np.zeros((n, n), np.float32)
    for t, wv in enumerate(win):
        off = t - half
        idx = np.arange(max(0, -off), min(n, n - off))
        m[idx, idx + off] = wv
    return m


def _blur(img: jax.Array, bh: jax.Array, bw: jax.Array) -> jax.Array:
    """Separable Gaussian blur as banded matmuls. img: (C, H, W)."""
    tmp = jnp.einsum("hH,cHw->chw", bh, img)
    return jnp.einsum("wW,chW->chw", bw, tmp)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         sigma: float = 1.5) -> jax.Array:
    """Mean SSIM over a (C, H, W) image pair (or (..., C, H, W) batches)."""
    if img1.ndim == 4:
        return jax.vmap(lambda a, b: ssim(a, b, window_size, sigma))(
            img1, img2).mean()
    _, h, w = img1.shape
    bh = jnp.asarray(_band_matrix(h, window_size, sigma))
    bw = jnp.asarray(_band_matrix(w, window_size, sigma))
    _blur_hw = functools.partial(_blur, bh=bh, bw=bw)
    mu1 = _blur_hw(img1)
    mu2 = _blur_hw(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur_hw(img1 * img1) - mu1_sq
    sigma2_sq = _blur_hw(img2 * img2) - mu2_sq
    sigma12 = _blur_hw(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map.mean()


def psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """PSNR per image over flattened channels (reference image.py:15-17)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
