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

    @property
    def feat_dim(self):
        return self.out_dim * len(self.multires)


# axis pairs per plane, matching itertools.combinations(range(3), 2):
# (0,1) -> xy, (0,2) -> xz, (1,2) -> yz (hexplane.py:78-80)
COO_COMBS = list(itertools.combinations(range(3), 2))


def init_triplane(key: jax.Array, cfg: TriplaneConfig) -> dict:
    """Uniform [0.1, 0.5) init like the reference (hexplane.py:39)."""
    grids = []
    for mult in cfg.multires:
        planes = []
        for (a, b) in COO_COMBS:
            key, sub = jax.random.split(key)
            # torch layout [1, C, reso[b], reso[a]] (reversed coo_comb);
            # we store (C, H=reso[b], W=reso[a])
            shape = (cfg.out_dim, cfg.resolution[b] * mult,
                     cfg.resolution[a] * mult)
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


def triplane_features(params: dict, pts: jax.Array,
                      cfg: TriplaneConfig, *,
                      fused: bool = True) -> jax.Array:
    """(N, 3) points -> (N, feat_dim) features."""
    q = normalize_aabb(pts, cfg.bounds)
    grids = params["grids"]
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
