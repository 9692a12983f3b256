"""Bilinear grid sampling, pure JAX (TPU-friendly gathers).

Equivalent to torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True) on 2D grids, which is what the
reference triplane uses (sings/rec/models/modules/hexplane.py:44-70).
Autodiff provides gradients to both the grid values and the coordinates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d(grid: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample a 2D feature grid at normalized coordinates.

    Args:
      grid: (C, H, W) feature planes.
      coords: (N, 2) in [-1, 1], coords[:, 0] = x (indexes W),
              coords[:, 1] = y (indexes H)  — torch grid_sample convention.
    Returns: (N, C)
    """
    c, h, w = grid.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (h - 1)
    # border padding: clamp the continuous coordinate
    x = x.clip(0.0, w - 1)
    y = y.clip(0.0, h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    # keep the +1 neighbor in range
    x0 = x0.clip(0, w - 2) if w > 1 else x0 * 0
    y0 = y0.clip(0, h - 2) if h > 1 else y0 * 0
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = grid.reshape(c, h * w)  # gather rows of length C via transpose
    idx00 = y0i * w + x0i
    g00 = flat[:, idx00]
    g01 = flat[:, idx00 + 1]
    g10 = flat[:, idx00 + w]
    g11 = flat[:, idx00 + w + 1]
    top = g00 * (1 - tx) + g01 * tx
    bot = g10 * (1 - tx) + g11 * tx
    out = top * (1 - ty) + bot * ty
    return out.T  # (N, C)
