"""Bilinear grid sampling, pure JAX (TPU-friendly gathers).

Equivalent to torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True) on 2D grids, which is what the
reference triplane uses (sings/rec/models/modules/hexplane.py:44-70).
Autodiff provides gradients to both the grid values and the coordinates.

TPU shape of the hot path: the four corner taps of every query are
fetched with a SINGLE row gather from a corner-stacked table
(H-1, W-1, 4C) built by dense shifted slices. Under autodiff the
backward becomes ONE (N, 4C) row scatter-add plus four dense shifted
adds — ~4x fewer scattered rows than the naive four-tap formulation,
and random row scatters at ~10ns/row are the dominant cost of the
triplane backward (docs/PERF.md, scripts/profile_scatter.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _corner_coords(coords, h, w):
    """Continuous -> clamped base-corner indices + fractional offsets."""
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
    return x0.astype(jnp.int32), y0.astype(jnp.int32), tx, ty


def grid_sample_2d(grid: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample a 2D feature grid at normalized coordinates.

    Args:
      grid: (C, H, W) feature planes.
      coords: (N, 2) in [-1, 1], coords[:, 0] = x (indexes W),
              coords[:, 1] = y (indexes H)  — torch grid_sample convention.
    Returns: (N, C)
    """
    c, h, w = grid.shape
    x0i, y0i, tx, ty = _corner_coords(coords, h, w)

    if h < 2 or w < 2:  # degenerate planes: fall back to per-tap gathers
        flat = grid.reshape(c, h * w)
        idx00 = y0i * w + x0i
        g00 = flat[:, idx00]
        g01 = flat[:, jnp.minimum(idx00 + 1, h * w - 1)]
        g10 = flat[:, jnp.minimum(idx00 + w, h * w - 1)]
        g11 = flat[:, jnp.minimum(idx00 + w + 1, h * w - 1)]
        top = g00 * (1 - tx) + g01 * tx
        bot = g10 * (1 - tx) + g11 * tx
        return (top * (1 - ty) + bot * ty).T

    # corner-stacked table: row (y0, x0) holds [g00 | g01 | g10 | g11]
    g = grid.transpose(1, 2, 0)  # (H, W, C), channels minor
    g4 = jnp.concatenate(
        [g[:-1, :-1], g[:-1, 1:], g[1:, :-1], g[1:, 1:]], axis=-1
    ).reshape((h - 1) * (w - 1), 4 * c)
    v = g4[y0i * (w - 1) + x0i].reshape(-1, 4, c)  # one (N, 4C) row gather

    wgt = jnp.stack(
        [(1 - tx) * (1 - ty), tx * (1 - ty), (1 - tx) * ty, tx * ty], axis=1
    )
    return jnp.einsum("nkc,nk->nc", v, wgt)
