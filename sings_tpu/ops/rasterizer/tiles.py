"""Tile binning for the TPU rasterizer: static-shape pair expansion.

The CUDA rasterizer builds per-tile gaussian lists with a dynamic
duplicate-and-sort (InclusiveSum + RadixSort). The TPU redesign keeps
every shape static:

  1. one global depth argsort gives each gaussian a front-to-back rank;
  2. each gaussian emits up to ``max_tiles_per_gauss`` (tile, rank)
     pairs from its (center-cropped) tile bounding rectangle;
  3. one ``lax.sort_key_val`` over ``key = tile * N + rank`` groups the
     pairs by tile, depth-ordered within each tile — the global sort
     makes a per-tile sort unnecessary;
  4. pairs are re-laid-out so every tile's segment starts at a
     128-aligned offset (aligned DMA in the Pallas kernel), with the
     spare gap slots marked invalid.

Everything is O(P log P) sorts + gathers; the only scatter is one int32
index scatter for the aligned layout. Gradients flow back through the
inverse mapping (gather + reshape + sum), never through a float scatter.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import Gaussians2D, tile_rect

INVALID = jnp.int32(2**31 - 1)


class TileBinning(NamedTuple):
    """Static-shape binning result.

    padded_gauss: (P_pad,) int32 gaussian index per aligned pair slot,
        -1 for gap/invalid slots.
    tile_offsets: (T + 1,) int32 offsets into the aligned pair array;
        every offset is a multiple of the alignment (128).
    pair_slot: (N * cap,) int32 aligned slot for each original pair
        (P_pad - 1, a reserved zero slot, for invalid pairs).
    num_pairs: () int32 number of valid pairs (diagnostics).
    overflow: () int32 number of tiles dropped by the span cap.
    """

    padded_gauss: jax.Array
    tile_offsets: jax.Array
    pair_slot: jax.Array
    num_pairs: jax.Array
    overflow: jax.Array


def bin_gaussians(
    g: Gaussians2D,
    *,
    tile: int,
    n_tiles_x: int,
    n_tiles_y: int,
    max_span: int = 5,
    align: int = 128,
    max_pairs: int | None = None,
) -> TileBinning:
    """Build depth-ordered, tile-grouped, 128-aligned pair lists.

    max_span: per-axis cap on the tile span of one gaussian (the rect is
        center-cropped to max_span x max_span tiles; the cap exists only
        to keep shapes static — spans above it are rare and clipped).
    max_pairs: static capacity of the aligned pair array. Pairs beyond
        it (the farthest in the farthest tiles) are dropped. Defaults to
        the loss-free worst case N * max_span^2 + align * n_tiles.
    """
    n = g.means2d.shape[0]
    n_tiles = n_tiles_x * n_tiles_y
    cap = max_span * max_span

    # front-to-back rank per gaussian (masked gaussians sink to the end)
    depth_key = jnp.where(g.mask, g.depths, jnp.inf)
    order = jnp.argsort(depth_key)
    rank = jnp.argsort(order).astype(jnp.int32)

    x0, y0, x1, y1 = tile_rect(g, tile, n_tiles_x, n_tiles_y)
    w = x1 - x0
    h = y1 - y0
    # center-crop oversized rects around the gaussian's own tile
    cx = jnp.clip((g.means2d[:, 0] // tile).astype(jnp.int32), 0, n_tiles_x - 1)
    cy = jnp.clip((g.means2d[:, 1] // tile).astype(jnp.int32), 0, n_tiles_y - 1)
    x0c = jnp.where(w > max_span,
                    jnp.clip(cx - max_span // 2, x0, x1 - max_span), x0)
    y0c = jnp.where(h > max_span,
                    jnp.clip(cy - max_span // 2, y0, y1 - max_span), y0)
    wc = jnp.minimum(w, max_span)
    hc = jnp.minimum(h, max_span)
    overflow = jnp.sum((w * h - wc * hc) * g.mask)

    # pair expansion: k -> (dx, dy) within the cropped rect
    k = jnp.arange(cap, dtype=jnp.int32)
    dx = k % max_span
    dy = k // max_span
    valid = (
        g.mask[:, None]
        & (dx[None, :] < wc[:, None])
        & (dy[None, :] < hc[:, None])
        & (w[:, None] > 0)
        & (h[:, None] > 0)
    )
    tile_id = (y0c[:, None] + dy[None, :]) * n_tiles_x + (x0c[:, None] + dx[None, :])

    # key = tile * N + rank fits int32 for n_tiles * n <= 2^31
    assert n_tiles * n < 2**31 - 1, "int32 sort key overflow"
    key = jnp.where(valid, tile_id * n + rank[:, None], INVALID).reshape(-1)

    p = n * cap
    flat_id = jnp.arange(p, dtype=jnp.int32)
    # ONE sort with a single payload: the gaussian id is recovered as
    # flat // cap, and the inverse mapping comes from a cheap int32
    # scatter instead of a second O(P log P) sort.
    sorted_key, sorted_flat = jax.lax.sort_key_val(key, flat_id)
    sorted_gauss = sorted_flat // jnp.int32(cap)
    is_valid = sorted_key != INVALID
    num_pairs = jnp.sum(is_valid.astype(jnp.int32))
    sorted_tile = jnp.where(is_valid, sorted_key // n, n_tiles)

    # contiguous per-tile offsets, then aligned offsets
    offsets = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = offsets[1:] - offsets[:-1]
    padded_counts = ((counts + align - 1) // align) * align
    padded_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts).astype(jnp.int32)]
    )

    if max_pairs is None:
        max_pairs = p + (align - 1) * n_tiles  # loss-free worst case
    p_pad = max_pairs + 1  # + 1 reserved zero slot
    spare = p_pad - 1
    padded_offsets = jnp.minimum(padded_offsets, max_pairs)

    # aligned destination slot of each sorted pair
    i = jnp.arange(p, dtype=jnp.int32)
    tile_clamped = jnp.minimum(sorted_tile, n_tiles - 1)
    dst = padded_offsets[tile_clamped] + (i - offsets[tile_clamped])
    dst = jnp.where(is_valid & (dst < padded_offsets[tile_clamped + 1]), dst, spare)

    padded_gauss = jnp.full((p_pad,), -1, jnp.int32).at[dst].set(
        jnp.where(is_valid, sorted_gauss, -1), mode="drop"
    )
    # the reserved slot must stay invalid even if an invalid pair wrote it
    padded_gauss = padded_gauss.at[spare].set(-1)

    # original pair -> aligned slot (for gradient un-sorting): invert the
    # sort permutation with one int32 scatter.
    pair_slot = jnp.zeros((p,), jnp.int32).at[sorted_flat].set(dst)

    return TileBinning(
        padded_gauss=padded_gauss,
        tile_offsets=padded_offsets,
        pair_slot=pair_slot,
        num_pairs=num_pairs,
        overflow=overflow,
    )
