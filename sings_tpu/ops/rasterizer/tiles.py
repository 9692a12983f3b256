"""Tile binning for the TPU rasterizer: static-shape pair expansion.

The CUDA rasterizer builds per-tile gaussian lists with a dynamic
duplicate-and-sort (InclusiveSum + RadixSort). The TPU redesign keeps
every shape static and — crucially — avoids per-element gathers and
scatters, which cost ~10ns/element on TPU (two orders of magnitude more
than sorting the same data):

  1. one global depth argsort ranks gaussians front-to-back;
  2. each gaussian emits up to max_span^2 (tile, rank) pairs from its
     (center-cropped) tile rectangle;
  3. one lax.sort over key = tile * N + rank groups pairs by tile,
     depth-ordered within tiles; valid pairs land in a contiguous
     prefix (invalid keys sort to the end) which is sliced to the
     static max_pairs capacity;
  4. per-tile offsets come from one searchsorted — the pair array is
     NOT re-laid out: the composite kernel reads each tile's segment
     through a 128-aligned DMA window and masks the head/tail items
     (pallas_kernels.py), so no scatter ever touches the hot path;
  5. only the backward pass needs an inverse mapping (original pair ->
     slot in the kernel-written gradient buffer); it is built from a
     1024-element scatter + cumsum (piecewise-constant segment shifts)
     and one more sort — still no large scatter.

Backward-glue tables. The un-sort gather after the backward kernel is
row-count-bound (~7-10ns/row), so gathering a dense (N, max_span^2)
slot table wastes 2-3x rows on spare-slot padding (measured: 174k real
pairs vs 450k table rows at the bench scene). Pairs are therefore
enumerated so that each gaussian's VALID pairs form a prefix
(dx = j % wc, dy = j // wc, valid = j < wc*hc), letting the glue gather
a narrow (N, main_width) prefix table that fully covers the ~88% of
gaussians spanning <= main_width tiles, plus a compact
(tail_capacity, cap - main_width) table for the wide ones (scatter-add
of tail_capacity rows, tiny). Tail overflow is counted in `overflow`
(it degrades only gradients of overflowed wide gaussians, never the
forward image — same contract as the max_pairs budget).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import Gaussians2D, tile_rect

INVALID = jnp.int32(2**31 - 1)


class TileBinning(NamedTuple):
    """Static-shape binning result (PK = max_pairs capacity).

    sorted_gauss: (PK,) int32 gaussian index per sorted pair, -1 invalid.
    tile_offsets: (T + 1,) int32 UNALIGNED offsets into sorted order.
    grad_offsets: (T + 1,) int32 aligned offsets into the (PG,) gradient
        buffer the backward kernel writes (PG = grad_capacity).
    main_slot: (N, main_width) int32 grad-buffer slots of each
        gaussian's first min(span, main_width) pairs (PG - 1, the
        reserved spare slot, for invalid/dropped pairs).
    tail_slot: (TC, cap - main_width) int32 slots of pairs
        j >= main_width, compacted over gaussians with span >
        main_width; (TC, 0) when cap <= main_width.
    tail_of_gauss: (N,) int32 tail-table row of each gaussian, TC (one
        past the end, where a zero row is appended) for gaussians with
        no tail — the merge stays a GATHER (a float scatter-add of the
        tail sums measured 2x slower end-to-end: XLA schedules it
        pathologically inside the fused backward).
    num_pairs, overflow: () int32 diagnostics.
    """

    sorted_gauss: jax.Array
    tile_offsets: jax.Array
    grad_offsets: jax.Array
    main_slot: jax.Array
    tail_slot: jax.Array
    tail_of_gauss: jax.Array
    num_pairs: jax.Array
    overflow: jax.Array

    @property
    def grad_capacity(self) -> int:
        return self.pair_slot_capacity

    pair_slot_capacity: int = 0


def grad_capacity(max_pairs: int, n_tiles: int, align: int) -> int:
    """Gradient-buffer slots: per-tile head + tail alignment padding
    (each region covers [aligned segment floor, end) rounded up) plus a
    reserved SPARE CHUNK [pg - align, pg) that the backward kernel
    zero-fills itself (its last slot, pg - 1, is the spare slot invalid
    pairs gather from — kernel-side zeroing replaced an XLA
    ``.at[:, -1].set(0.0)`` whole-buffer copy in the glue)."""
    used = -(-max_pairs // align) * align + 2 * align * n_tiles
    return used + align


def bin_gaussians(
    g: Gaussians2D,
    *,
    tile: int,
    n_tiles_x: int,
    n_tiles_y: int,
    max_span: int = 3,
    align: int = 128,
    max_pairs: int | None = None,
    main_width: int = 6,
    tail_capacity: int | None = None,
    cull: bool = True,
    pair_cap: int | None = None,
    valid_tiles_y: jax.Array | None = None,
) -> TileBinning:
    """Build depth-ordered, tile-grouped pair lists (see module doc).

    max_span: per-axis cap on the tile span of one gaussian (static
        shape requirement; larger spans are center-cropped).
    max_pairs: static capacity of the sorted pair prefix; pairs beyond
        it (highest tile ids) are dropped and counted in `overflow`.
    main_width: prefix width of the backward-glue slot table (pairs
        j < main_width per gaussian).
    tail_capacity: static row budget for gaussians spanning more than
        main_width tiles (default N // 16, aligned); overfull tails lose only
        their gradient contributions and are counted in `overflow`.
    pair_cap: per-gaussian budget of SURVIVING pairs after the exact
        cull. When set, each gaussian's culled pairs are compacted out
        of its enumeration row (a 9-wide row-wise argsort — cheap) and
        only the first pair_cap survivors are kept, shrinking BOTH
        global pair sorts from N*max_span^2 to N*pair_cap rows. Exact
        (bit-identical image and grads) whenever no gaussian has more
        than pair_cap surviving tiles; excess survivors are dropped
        brightest-rect-first-row order and counted in `overflow`.
    valid_tiles_y: optional TRACED () int32 — pairs in tile rows >=
        this are dropped (not overflow-counted). Lets a statically
        shaped strip window own a dynamic sub-range of rows: tiles
        beyond the owned range bin zero pairs, so their composite
        walks exit immediately (pair-balanced strip sharding,
        docs/SCALING.md mitigation 2). Tiles < valid_tiles_y are
        bit-identical to the unrestricted binning.
    """
    n = g.means2d.shape[0]
    n_tiles = n_tiles_x * n_tiles_y
    cap = max_span * max_span

    depth_key = jnp.where(g.mask, g.depths, jnp.inf)
    order = jnp.argsort(depth_key)
    rank = jnp.argsort(order).astype(jnp.int32)

    x0, y0, x1, y1 = tile_rect(g, tile, n_tiles_x, n_tiles_y)
    w = x1 - x0
    h = y1 - y0
    cx = jnp.clip((g.means2d[:, 0] // tile).astype(jnp.int32), 0,
                  n_tiles_x - 1)
    cy = jnp.clip((g.means2d[:, 1] // tile).astype(jnp.int32), 0,
                  n_tiles_y - 1)
    x0c = jnp.where(w > max_span,
                    jnp.clip(cx - max_span // 2, x0, x1 - max_span), x0)
    y0c = jnp.where(h > max_span,
                    jnp.clip(cy - max_span // 2, y0, y1 - max_span), y0)
    wc = jnp.minimum(w, max_span)
    hc = jnp.minimum(h, max_span)
    overflow = jnp.sum((w * h - wc * hc) * g.mask)

    # prefix enumeration: gaussian's pair j covers tile (j % wc, j // wc)
    # of its cropped rect, so valid pairs are exactly j < wc*hc — the
    # backward-glue tables below can then be narrow (see module doc)
    j = jnp.arange(cap, dtype=jnp.int32)
    wc_safe = jnp.maximum(wc, 1)[:, None]
    dx = j[None, :] % wc_safe
    dy = j[None, :] // wc_safe
    span = jnp.where(g.mask & (w > 0) & (h > 0), wc * hc, 0)
    valid = j[None, :] < span[:, None]
    tile_id = (y0c[:, None] + dy) * n_tiles_x + (x0c[:, None] + dx)

    # exact per-pair tile culling. The CUDA rasterizer duplicates a
    # gaussian into EVERY tile of its bounding rect (forward.cu
    # duplicateWithKeys / getRect); corner tiles the ellipse never
    # reaches still ride through its sort + per-tile walks. Here each
    # (gaussian, tile) pair is kept only if the gaussian's peak alpha
    # over the tile's pixel box can reach ALPHA_MIN = 1/255 — below
    # that the composite kernel zeroes alpha anyway (_chunk_alpha), so
    # dropping the pair is NUMERICALLY EXACT for the image and all
    # gradients while cutting pair count (and the VPU-bound kernel
    # walks + glue) substantially. Peak alpha bound: minimize the
    # conic quadratic q(d) = .5a dx^2 + .5c dy^2 + b dxdy over the
    # continuous tile box (a lower bound of the discrete pixel min,
    # hence conservative): 0 if the mean is inside, else the best of
    # the four clamped edge minimizers.
    a_ = g.conics[:, 0:1]
    b_ = g.conics[:, 1:2]
    c_ = g.conics[:, 2:3]
    a_s = jnp.maximum(a_, 1e-12)
    c_s = jnp.maximum(c_, 1e-12)
    bx0 = (x0c[:, None] + dx).astype(jnp.float32) * tile - g.means2d[:, 0:1]
    by0 = (y0c[:, None] + dy).astype(jnp.float32) * tile - g.means2d[:, 1:2]
    bx1 = bx0 + (tile - 1)
    by1 = by0 + (tile - 1)

    def _qx(x):  # min over dy in [by0, by1] at fixed dx = x
        yy = jnp.clip(-b_ * x / c_s, by0, by1)
        return (0.5 * a_ * x + b_ * yy) * x + 0.5 * c_ * yy * yy

    def _qy(y):
        xx = jnp.clip(-b_ * y / a_s, bx0, bx1)
        return (0.5 * c_ * y + b_ * xx) * y + 0.5 * a_ * xx * xx

    if cull:
        inside = (bx0 <= 0) & (bx1 >= 0) & (by0 <= 0) & (by1 >= 0)
        q_min = jnp.minimum(jnp.minimum(_qx(bx0), _qx(bx1)),
                            jnp.minimum(_qy(by0), _qy(by1)))
        q_min = jnp.where(inside, 0.0, q_min)
        reach = q_min <= jnp.log(
            jnp.maximum(g.opacities[:, None], 1e-12) * 255.0)
        valid = valid & reach

    if valid_tiles_y is not None:
        valid = valid & ((y0c[:, None] + dy) < valid_tiles_y)

    if pair_cap is not None and pair_cap < cap:
        # row-compact survivors to a prefix, keep the first pair_cap.
        # The 9-wide row argsort is a tiny vectorized bitonic network;
        # it buys a 1 - pair_cap/cap cut of BOTH global pair sorts.
        skey = jnp.where(valid, j[None, :], cap + j[None, :])
        sidx = jnp.argsort(skey, axis=1)[:, :pair_cap].astype(jnp.int32)
        nvalid = jnp.sum(valid, axis=1).astype(jnp.int32)
        overflow = overflow + jnp.sum(jnp.maximum(nvalid - pair_cap, 0))
        dx = jnp.take_along_axis(dx, sidx, 1)
        dy = jnp.take_along_axis(dy, sidx, 1)
        tile_id = (y0c[:, None] + dy) * n_tiles_x + (x0c[:, None] + dx)
        cap = pair_cap
        j = jnp.arange(cap, dtype=jnp.int32)
        span = jnp.minimum(nvalid, cap)
        valid = j[None, :] < span[:, None]
    elif cull or valid_tiles_y is not None:
        # culled mid-prefix pairs keep their enumeration slot; the glue
        # span must still bound the last VALID j (prefix property holds
        # only without culling/row masking)
        span = jnp.where(valid, j[None, :] + 1, 0).max(axis=1)

    assert n_tiles * n < 2**31 - 1, "int32 sort key overflow"
    key = jnp.where(valid, tile_id * n + rank[:, None], INVALID).reshape(-1)

    p = n * cap
    flat_id = jnp.arange(p, dtype=jnp.int32)
    sorted_key, sorted_flat = jax.lax.sort_key_val(key, flat_id)

    if max_pairs is None:
        max_pairs = p
    # pk MUST be a multiple of align: the composite kernels window the
    # (NFEAT, pk + align) feats array with align-wide DMA slices, and an
    # unaligned minor extent HARD-FAULTS the TPU worker at runtime
    # (reproduced at pk = 25574*9 = 230166; aligned 230144 is clean —
    # scripts/repro_refine_crash.py). Round UP and pad with INVALID
    # keys so no pair is dropped by the alignment itself.
    pk = min(max_pairs, p)
    pk = -(-pk // align) * align
    take = min(pk, p)
    sk = sorted_key[:take]
    sf = sorted_flat[:take]
    if pk > take:
        # fake flat ids >= p keep the inversion sort's keys unique;
        # they sort past all real ids and are sliced off below
        sk = jnp.concatenate(
            [sk, jnp.full((pk - take,), INVALID, jnp.int32)])
        sf = jnp.concatenate(
            [sf, p + jnp.arange(pk - take, dtype=jnp.int32)])
    is_valid = sk != INVALID
    num_pairs = jnp.sum((sorted_key != INVALID).astype(jnp.int32))
    overflow = overflow + jnp.maximum(num_pairs - pk, 0)
    sorted_gauss = jnp.where(is_valid, sf // jnp.int32(cap), -1)
    sorted_tile = jnp.where(is_valid, sk // n, n_tiles)

    offsets = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    # the backward kernel writes chunk-aligned windows starting at the
    # aligned floor of each segment, so each tile's grad region covers
    # [base_t, end_t) rounded up: head + count rounded to align
    counts = offsets[1:] - offsets[:-1]
    base = (offsets[:-1] // align) * align
    head = offsets[:-1] - base
    padded_counts = ((head + counts + align - 1) // align) * align
    grad_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(padded_counts).astype(jnp.int32)])
    pg = grad_capacity(pk, n_tiles, align)
    spare = pg - 1

    # grad slot per sorted pair i: i + shift[tile_i], with
    # shift[t] = grad_offsets[t] - base_t (the kernel writes element i
    # of the window at grad_offsets[t] + (i - base_t)). shift is
    # piecewise constant over the tile-contiguous sorted order — build
    # it with a 1k-element scatter of deltas at segment starts + one
    # cumsum (avoiding a 450k-element table gather).
    shift = grad_offsets[:-1] - base                     # (T,)
    deltas = jnp.diff(jnp.concatenate([jnp.zeros(1, jnp.int32), shift]))
    seg_delta = jnp.zeros((pk,), jnp.int32).at[offsets[:-1]].add(
        deltas, mode="drop")  # out-of-range (truncated tiles) dropped
    shift_of_i = jnp.cumsum(seg_delta)
    slot = jnp.arange(pk, dtype=jnp.int32) + shift_of_i
    slot = jnp.where(is_valid & (slot < pg - 1), slot, spare)

    # invert to original pair order with one more sort (fake alignment
    # ids >= p sort past every real id and are sliced off)
    slot_full = jnp.concatenate(
        [slot, jnp.full((p - take,), spare, jnp.int32)])
    sf_full = jnp.concatenate([sf, sorted_flat[take:]])
    _, pair_slot = jax.lax.sort_key_val(sf_full, slot_full)
    ps = pair_slot[:p].reshape(n, cap)

    # backward-glue tables: narrow prefix + compacted tail
    mw = min(main_width, cap)
    main_slot = ps[:, :mw]
    tw = cap - mw
    if tw > 0:
        tc = tail_capacity
        if tc is None:
            tc = max(align, -(-n // 16 // align) * align)
        tc = min(tc, n)
        big = span > mw
        nbig = jnp.sum(big.astype(jnp.int32))
        order = jnp.argsort(jnp.where(big, 0, 1).astype(jnp.int32),
                            stable=True)
        tail_rows = order[:tc]
        row_ok = jnp.arange(tc, dtype=jnp.int32) < nbig
        tail_slot = jnp.where(row_ok[:, None], ps[tail_rows, mw:], spare)
        # inverse map gaussian -> tail row (tc = "no tail" sentinel);
        # int scatter of tc elements at bin time, so the glue merge is
        # a pure gather
        rank = jnp.cumsum(big.astype(jnp.int32)) - 1
        tail_of_gauss = jnp.where(big & (rank < tc), rank, tc).astype(
            jnp.int32)
        overflow = overflow + jnp.sum(
            jnp.where(big & (rank >= tc), span - mw, 0))
    else:
        tail_of_gauss = jnp.zeros((n,), jnp.int32)
        tail_slot = jnp.zeros((0, 0), jnp.int32)

    return TileBinning(
        sorted_gauss=sorted_gauss,
        tile_offsets=offsets,
        grad_offsets=grad_offsets,
        main_slot=main_slot,
        tail_slot=tail_slot,
        tail_of_gauss=tail_of_gauss,
        num_pairs=num_pairs,
        overflow=overflow,
        pair_slot_capacity=pg,
    )
