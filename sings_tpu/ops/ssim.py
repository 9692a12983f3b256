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
    """Separable Gaussian blur as banded matmuls. img: (C, H, W).

    Precision=HIGHEST is LOAD-BEARING, not a nicety: at the MXU's
    default precision (bf16 inputs) the moment differences
    E[x^2] - mu^2 below lose everything to cancellation — window
    variances are ~1e-3 while the means are ~0.5, so bf16's ~0.4%
    rounding makes variances NEGATIVE and the SSIM denominator
    (s1 + s2 + c2, c2 = 9e-4) crosses ZERO. On hardware this produced
    ssim ~ 6 (analytically impossible; bounded by 1), i.e. a strongly
    NEGATIVE (1 - ssim) loss the optimizer then maximized — the round-2
    full-recipe color divergence (ROUND2.md). CPU tests never saw it
    because XLA:CPU convs are true f32.
    """
    hp = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("hH,cHw->chw", bh, img, precision=hp)
    return jnp.einsum("wW,chW->chw", bw, tmp, precision=hp)


def _ssim_map(blur_fn, img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Per-pixel SSIM map given a SAME-shaped blur operator.

    The variance floor and the Cauchy-Schwarz clamp on the covariance
    are no-ops in exact arithmetic (sigma^2 >= 0, |sigma12| <=
    sigma1*sigma2 hold analytically) but bound the map under float
    noise so ssim <= ~1 can never be violated materially.
    """
    mu1, mu2 = blur_fn(img1), blur_fn(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = jnp.maximum(blur_fn(img1 * img1) - mu1_sq, 0.0)
    s2 = jnp.maximum(blur_fn(img2 * img2) - mu2_sq, 0.0)
    s12 = blur_fn(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    # the bound carries NO gradient (stop_gradient): constant windows
    # (flat background) have s1*s2 == 0 exactly and sqrt' there is inf —
    # a differentiable bound NaN'd every training step. The +c2 margin
    # keeps the clip inactive in sane regimes; it only catches numeric
    # blowups.
    lim = jax.lax.stop_gradient(jnp.sqrt(jnp.maximum(s1 * s2, 0.0)) + c2)
    s12 = jnp.clip(s12, -lim, lim)
    return ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))


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
    return _ssim_map(_blur_hw, img1, img2).mean()


def psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """PSNR per image over flattened channels (reference image.py:15-17)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
