"""Multi-resolution triplane feature field (K-planes style).

Functional rebuild of the reference HexPlaneField
(sings/rec/models/modules/hexplane.py:108-189, itself from 4DGaussians):
3 axis-aligned 2D planes x len(multires) scales; bilinear sampling with
border padding and align_corners=True; Hadamard product over the three
planes within a scale; concatenation over scales.

Parameters are a plain pytree {"grids": [[plane_xy, plane_xz, plane_yz],
...]} so optax param labeling stays trivial. Gradients flow to both the
grids and the query coordinates (the gaussian centers are trainable).

The default path fuses the BACKWARD of all planes: the per-plane
sorted-segment grid-gradient reduction (ops/sampling.py::_sample_bwd)
runs once over all 3*len(multires) planes with a combined cell key —
one sort + one blocked-cumsum + one searchsorted instead of nine, the
same numerics (see tests/test_triplane.py fused-equivalence tests).
"""
from __future__ import annotations

import functools
import itertools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..ops.sampling import (
    _corner_coords, _corner_table, _cumsum_rows, _weights, grid_sample_2d,
)


class TriplaneConfig(NamedTuple):
    resolution: Sequence[int] = (64, 64, 64)
    out_dim: int = 32
    multires: Sequence[int] = (1, 2, 4)
    bounds: float = 1.0  # AABB half-extent; can be reset per subject
    # nested=True: grids carry resolution*mult + 1 points so each
    # scale's CELL grid is exactly a 2x refinement of the previous one
    # (reference grids, res*mult points, do NOT nest: 63/127/255
    # cells). Nesting lets one combined corner-table row serve all
    # scales of a plane orientation: 3 point gathers instead of 9, and
    # ONE Morton-ordered segment reduction in the backward for all
    # scales. A deliberate deviation (documented in PARITY.md): the
    # field has one extra grid row/col per plane, same expressive
    # class, different parameter shapes than the reference.
    nested: bool = False

    @property
    def feat_dim(self):
        return self.out_dim * len(self.multires)


# axis pairs per plane, matching itertools.combinations(range(3), 2):
# (0,1) -> xy, (0,2) -> xz, (1,2) -> yz (hexplane.py:78-80)
COO_COMBS = list(itertools.combinations(range(3), 2))


def init_triplane(key: jax.Array, cfg: TriplaneConfig) -> dict:
    """Uniform [0.1, 0.5) init like the reference (hexplane.py:39)."""
    grids = []
    extra = 1 if cfg.nested else 0
    for mult in cfg.multires:
        planes = []
        for (a, b) in COO_COMBS:
            key, sub = jax.random.split(key)
            # torch layout [1, C, reso[b], reso[a]] (reversed coo_comb);
            # we store (C, H=reso[b], W=reso[a])
            shape = (cfg.out_dim, cfg.resolution[b] * mult + extra,
                     cfg.resolution[a] * mult + extra)
            planes.append(jax.random.uniform(sub, shape, jnp.float32,
                                             0.1, 0.5))
        grids.append(planes)
    return {"grids": grids}


def normalize_aabb(pts: jax.Array, bounds: float) -> jax.Array:
    """Map [-bounds, bounds] -> [-1, 1] (hexplane.py:162-163).

    The reference stores aabb = [[b,b,b], [-b,-b,-b]] and computes
    (pts - b) * (2 / (-2b)) - 1 = -pts/b - 1 + ... reproduce exactly:
    (pts - aabb0) * (2 / (aabb1 - aabb0)) - 1 with aabb0=b, aabb1=-b.
    """
    return (pts - bounds) * (2.0 / (-2.0 * bounds)) - 1.0


def _nestable(grids, multires):
    """True when every plane's CELL grid is a power-of-two 2x tower
    (the nested fast path's prerequisite)."""
    def pow2(v):
        return v > 0 and (v & (v - 1)) == 0

    s = len(multires)
    if len(grids) != s or any(len(p) != 3 for p in grids):
        return False
    for o in range(3):
        cells = [(grids[l][o].shape[1] - 1, grids[l][o].shape[2] - 1)
                 for l in range(s)]
        if not all(pow2(cy) and pow2(cx) for cy, cx in cells):
            return False
        for l in range(1, s):
            if cells[l] != (2 * cells[l - 1][0], 2 * cells[l - 1][1]):
                return False
    return True


def triplane_features(params: dict, pts: jax.Array,
                      cfg: TriplaneConfig, *,
                      fused: bool = True) -> jax.Array:
    """(N, 3) points -> (N, feat_dim) features."""
    q = normalize_aabb(pts, cfg.bounds)
    grids = params["grids"]
    if fused and cfg.nested and _nestable(grids, cfg.multires):
        meta = tuple(
            (a, b, p.shape[1], p.shape[2])
            for planes in grids
            for p, (a, b) in zip(planes, COO_COMBS))
        flat = tuple(p for planes in grids for p in planes)
        return _triplane_nested(meta, flat, q)
    if fused and all(p.shape[1] >= 2 and p.shape[2] >= 2
                     for planes in grids for p in planes):
        meta = tuple(
            (a, b, p.shape[1], p.shape[2])
            for planes in grids
            for p, (a, b) in zip(planes, COO_COMBS))
        flat = tuple(p for planes in grids for p in planes)
        return _triplane_fused(meta, flat, q)
    outs = []
    for planes in grids:
        interp = 1.0
        for plane, (a, b) in zip(planes, COO_COMBS):
            coords = q[:, (a, b)]  # x indexes W (axis a), y indexes H (axis b)
            interp = interp * grid_sample_2d(plane, coords)
        outs.append(interp)
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# fused path: one multi-plane custom VJP
# meta: static tuple of (axis_a, axis_b, H, W) per plane, scale-major
# (len = 3 * len(multires)); grids: flat tuple of (C, H, W) planes.


def _fused_samples(meta, grids, q):
    """Per-plane bilinear samples (P, N, C) + the gathered corner rows
    and cell ids (saved so the backward never re-gathers — the corner
    gather is ~10 ns/row and dominated the old bwd)."""
    samples, corners, cells = [], [], []
    for plane, (a, b, h, w) in zip(grids, meta):
        coords = q[:, (a, b)]
        c = plane.shape[0]
        x0i, y0i, tx, ty = _corner_coords(coords, h, w)
        g4 = _corner_table(plane)
        cell = y0i * (w - 1) + x0i
        v = g4[cell].reshape(-1, 4, c)
        samples.append(jnp.einsum("nkc,nk->nc", v, _weights(tx, ty)))
        corners.append(v)
        cells.append(cell)
    return samples, corners, cells


def _fused_out(meta, samples):
    outs = []
    for s in range(len(meta) // 3):
        outs.append(samples[3 * s] * samples[3 * s + 1] * samples[3 * s + 2])
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _triplane_fused(meta, grids, q):
    return _fused_out(meta, _fused_samples(meta, grids, q)[0])


def _triplane_fused_fwd(meta, grids, q):
    samples, corners, cells = _fused_samples(meta, grids, q)
    return _fused_out(meta, samples), (q, samples, corners, cells)


def _triplane_fused_bwd(meta, res, gout):
    q, samples, corners, cells = res
    n = q.shape[0]
    c = corners[0].shape[-1]
    nplanes = len(meta)

    # product rule: per-plane sample cotangents from the per-scale
    # Hadamard product (hexplane.py:97-101)
    gouts = []
    for s in range(nplanes // 3):
        g_s = gout[:, s * c:(s + 1) * c]
        v0, v1, v2 = samples[3 * s], samples[3 * s + 1], samples[3 * s + 2]
        gouts += [g_s * v1 * v2, g_s * v0 * v2, g_s * v0 * v1]

    # ---- coordinate gradient: autodiff through each plane's weight
    # path (integer corner indices are piecewise constant) — identical
    # per-plane math to ops/sampling.py::_sample_bwd. Corner rows come
    # from the forward residuals: NO re-gather.
    dq = jnp.zeros_like(q)
    wvs = []
    for i, (a, b, h, w) in enumerate(meta):
        coords = q[:, (a, b)]
        _, _, tx, ty = _corner_coords(coords, h, w)
        v = corners[i]

        def weight_path(coords, v=v, h=h, w=w):
            _, _, tx, ty = _corner_coords(coords, h, w)
            return jnp.einsum("nkc,nk->nc", v, _weights(tx, ty))

        _, pullback = jax.vjp(weight_path, coords)
        (d_coords,) = pullback(gouts[i])
        dq = dq.at[:, a].add(d_coords[:, 0]).at[:, b].add(d_coords[:, 1])
        wvs.append((_weights(tx, ty)[:, :, None]
                    * gouts[i][:, None, :]).reshape(n, 4 * c))

    # ---- grid gradients: ONE sorted segment reduction over all planes
    # (combined key = plane cell base + cell), replacing nplanes
    # independent sort/cumsum/searchsorted pipelines
    bases = [0]
    for (_, _, h, w) in meta:
        bases.append(bases[-1] + (h - 1) * (w - 1))
    total_cells = bases[-1]
    key = jnp.concatenate(
        [cell + jnp.int32(base) for cell, base in zip(cells, bases)])
    wv = jnp.concatenate(wvs, axis=0)  # (P*N, 4C)
    skey, order = jax.lax.sort_key_val(
        key, jnp.arange(nplanes * n, dtype=jnp.int32))
    csum = _cumsum_rows(wv[order])
    csum = jnp.concatenate([jnp.zeros((1, 4 * c), csum.dtype), csum], 0)
    ends = jnp.searchsorted(
        skey, jnp.arange(1, total_cells + 1, dtype=jnp.int32), side="left",
        method="sort").astype(jnp.int32)
    gathered = csum[ends]
    cellsum = gathered - jnp.concatenate(
        [jnp.zeros((1, 4 * c), gathered.dtype), gathered[:-1]], 0)

    dgrids = []
    for (a, b, h, w), base in zip(meta, bases):
        g4grad = cellsum[base:base + (h - 1) * (w - 1)].reshape(
            h - 1, w - 1, 4, c)
        gg = jnp.zeros((h, w, c), gout.dtype)
        gg = gg.at[:-1, :-1].add(g4grad[:, :, 0])
        gg = gg.at[:-1, 1:].add(g4grad[:, :, 1])
        gg = gg.at[1:, :-1].add(g4grad[:, :, 2])
        gg = gg.at[1:, 1:].add(g4grad[:, :, 3])
        dgrids.append(gg.transpose(2, 0, 1))
    return tuple(dgrids), dq


_triplane_fused.defvjp(_triplane_fused_fwd, _triplane_fused_bwd)


# ---------------------------------------------------------------------------
# nested fast path (cfg.nested=True): power-of-two cell towers per plane
# orientation let ONE combined corner-table row serve every scale, and one
# Morton-keyed segment reduction produce every scale's grid gradients.
#   * forward: 3 row gathers (one per orientation) instead of 3*S;
#   * backward: 3 sorts/cumsums of (N, S*4C) instead of 3*S of (N, 4C),
#     and corner values come from the forward residual (no re-gather).
# Deviation from the reference grids (PARITY.md): one extra grid row/col
# per plane so cells nest (64/128/256 cells vs 63/127/255).

import numpy as _np


def _interleave16_np(v):
    v = v.astype(_np.int64)
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def _interleave16(v):
    """int32 (N,) values < 2^16 -> bits spread to even positions."""
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


@functools.lru_cache(maxsize=None)
def _morton_static(cy, cx, shift):
    """Static per-level tables for the Morton segment reduction.

    Returns (starts, ends, rank): fine-code range [starts[j], ends[j])
    holds the points of the level cell whose sorted-code position is j,
    and rank[y*cx + x] = that position for the row-major cell (y, x).

    NUMPY results on purpose: the cache is shared across jit traces,
    and a jnp array materialized inside a traced scan body is a tracer
    — caching it leaks it into later traces (UnexpectedTracerError,
    found by the round-4 ablation run). Use sites convert per trace.
    """
    ys, xs = _np.mgrid[0:cy, 0:cx]
    codes = (_interleave16_np(xs) | (_interleave16_np(ys) << 1)).reshape(-1)
    order = _np.argsort(codes)
    rank = _np.empty_like(order)
    rank[order] = _np.arange(len(order))
    starts = (codes[order] << (2 * shift)).astype(_np.int32)
    ends = (starts + (1 << (2 * shift))).astype(_np.int32)
    return starts, ends, rank.astype(_np.int32)


def _nested_layout(meta):
    """Per-orientation metadata: (levels, (hF, wF), shifts)."""
    nplanes = len(meta)
    s_scales = nplanes // 3
    per_o = []
    for o in range(3):
        metas_o = [meta[l * 3 + o] for l in range(s_scales)]
        hf, wf = metas_o[-1][2], metas_o[-1][3]
        shifts = []
        for (_a, _b, h, w) in metas_o:
            shifts.append(((wf - 1) // (w - 1)).bit_length() - 1)
        per_o.append((metas_o, (hf, wf), shifts))
    return per_o


def _nested_gather(meta, grids, q):
    """Per-orientation combined-row gather.

    Returns (rows (3 x (N, S*4C)), fine corner indices (3 x (x0F, y0F)))."""
    s_scales = len(meta) // 3
    c = grids[0].shape[0]
    rows, fines = [], []
    for o, (metas_o, (hf, wf), shifts) in enumerate(_nested_layout(meta)):
        a, b = metas_o[0][0], metas_o[0][1]
        coords = q[:, (a, b)]
        fy, fx = hf - 1, wf - 1
        parts = []
        for l in range(s_scales):
            plane = grids[l * 3 + o]
            _aa, _bb, h, w = metas_o[l]
            cy, cx, s = h - 1, w - 1, shifts[l]
            g = _corner_table(plane).reshape(cy, cx, 4 * c)
            g = jnp.broadcast_to(
                g[:, None, :, None, :], (cy, 1 << s, cx, 1 << s, 4 * c)
            ).reshape(fy * fx, 4 * c)
            parts.append(g)
        table = jnp.concatenate(parts, axis=1)  # (Fy*Fx, S*4C)
        x0f, y0f, _, _ = _corner_coords(coords, hf, wf)
        rows.append(table[y0f * fx + x0f])
        fines.append((x0f, y0f))
    return rows, fines


def _nested_samples(meta, rows, q):
    """Per-plane samples (scale-major plane order, like the fused path)."""
    s_scales = len(meta) // 3
    c4 = rows[0].shape[1] // s_scales
    c = c4 // 4
    n = q.shape[0]
    samples = [None] * len(meta)
    for o, (metas_o, _hw, _shifts) in enumerate(_nested_layout(meta)):
        a, b = metas_o[0][0], metas_o[0][1]
        coords = q[:, (a, b)]
        for l, (_aa, _bb, h, w) in enumerate(metas_o):
            _x0, _y0, tx, ty = _corner_coords(coords, h, w)
            v = rows[o][:, l * c4:(l + 1) * c4].reshape(n, 4, c)
            samples[l * 3 + o] = jnp.einsum(
                "nkc,nk->nc", v, _weights(tx, ty))
    return samples


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _triplane_nested(meta, grids, q):
    rows, _ = _nested_gather(meta, grids, q)
    return _fused_out(meta, _nested_samples(meta, rows, q))


def _triplane_nested_fwd(meta, grids, q):
    rows, fines = _nested_gather(meta, grids, q)
    samples = _nested_samples(meta, rows, q)
    return _fused_out(meta, samples), (q, samples, rows, fines)


def _triplane_nested_bwd(meta, res, gout):
    q, samples, rows, fines = res
    n = q.shape[0]
    s_scales = len(meta) // 3
    c4 = rows[0].shape[1] // s_scales
    c = c4 // 4

    # product rule over each scale's Hadamard product (plane order is
    # scale-major, identical to _triplane_fused_bwd)
    gouts = []
    for s in range(s_scales):
        g_s = gout[:, s * c:(s + 1) * c]
        v0, v1, v2 = samples[3 * s], samples[3 * s + 1], samples[3 * s + 2]
        gouts += [g_s * v1 * v2, g_s * v0 * v2, g_s * v0 * v1]

    dq = jnp.zeros_like(q)
    dgrids = [None] * len(meta)
    for o, (metas_o, (hf, wf), shifts) in enumerate(_nested_layout(meta)):
        a, b = metas_o[0][0], metas_o[0][1]
        coords = q[:, (a, b)]
        fy, fx = hf - 1, wf - 1
        x0f, y0f = fines[o]

        # coordinate gradients + weight-cotangent rows, all levels
        wv_parts = []
        for l, (_aa, _bb, h, w) in enumerate(metas_o):
            v = rows[o][:, l * c4:(l + 1) * c4].reshape(n, 4, c)

            def weight_path(coords, v=v, h=h, w=w):
                _, _, tx, ty = _corner_coords(coords, h, w)
                return jnp.einsum("nkc,nk->nc", v, _weights(tx, ty))

            _, pullback = jax.vjp(weight_path, coords)
            (d_coords,) = pullback(gouts[l * 3 + o])
            dq = dq.at[:, a].add(d_coords[:, 0]).at[:, b].add(
                d_coords[:, 1])
            _x0, _y0, tx, ty = _corner_coords(coords, h, w)
            wv_parts.append(
                (_weights(tx, ty)[:, :, None]
                 * gouts[l * 3 + o][:, None, :]).reshape(n, c4))
        wv = jnp.concatenate(wv_parts, axis=1)  # (N, S*4C)

        # ONE Morton-keyed reduction for every level of this orientation
        codes = _interleave16(x0f) | (_interleave16(y0f) << 1)
        skey, order = jax.lax.sort_key_val(
            codes, jnp.arange(n, dtype=jnp.int32))
        csum = _cumsum_rows(wv[order])
        csum = jnp.concatenate(
            [jnp.zeros((1, wv.shape[1]), csum.dtype), csum], 0)
        # one fine-resolution boundary table serves EVERY level: cell
        # ranges nest under the Morton order, so level-l boundaries are
        # gathers from cum_fine instead of per-level sort-based
        # searchsorteds (6 ~200k-element sorts -> 1 per orientation)
        space = 1 << (2 * max((fx - 1).bit_length(),
                              (fy - 1).bit_length()))
        cum_fine = jnp.searchsorted(
            skey, jnp.arange(space + 1, dtype=jnp.int32), side="left",
            method="sort").astype(jnp.int32)
        for l, (_aa, _bb, h, w) in enumerate(metas_o):
            cy, cx = h - 1, w - 1
            starts_np, ends_np, rank_np = _morton_static(
                cy, cx, shifts[l])
            starts = jnp.asarray(starts_np)
            ends = jnp.asarray(ends_np)
            rank = jnp.asarray(rank_np)
            lo = cum_fine[starts]
            hi = cum_fine[ends]
            block = csum[:, l * c4:(l + 1) * c4]
            cellsum = block[hi] - block[lo]      # sorted-code order
            cellsum = cellsum[rank]              # row-major cells
            g4grad = cellsum.reshape(cy, cx, 4, c)
            gg = jnp.zeros((h, w, c), gout.dtype)
            gg = gg.at[:-1, :-1].add(g4grad[:, :, 0])
            gg = gg.at[:-1, 1:].add(g4grad[:, :, 1])
            gg = gg.at[1:, :-1].add(g4grad[:, :, 2])
            gg = gg.at[1:, 1:].add(g4grad[:, :, 3])
            dgrids[l * 3 + o] = gg.transpose(2, 0, 1)
    return tuple(dgrids), dq


_triplane_nested.defvjp(_triplane_nested_fwd, _triplane_nested_bwd)
