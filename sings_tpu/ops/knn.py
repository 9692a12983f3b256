"""Brute-force K-nearest-neighbors on TPU.

Replaces pytorch3d.ops.knn_points (used by GaussiansEdgeLoss, reference
sings/rec/losses/loss_items.py:73). N is <= 2e5 so a blocked dense
distance matrix on the MXU is the speed-of-light approach: distances are
computed as  |a|^2 + |b|^2 - 2 a.b  where the cross term is one big
matmul per block, then reduced with jax.lax.top_k.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block", "approx"))
def knn(points: jax.Array, k: int, *, valid: jax.Array | None = None,
        block: int = 4096, approx: bool = False):
    """K nearest neighbors of each point among all points (self included).

    Args:
      points: (N, 3)
      k: number of neighbors (including self, which is always nearest).
      valid: optional (N,) bool; invalid points are excluded as neighbors
             (their distances become +inf) — used with padded buffers.
      block: query block size.
      approx: use the TPU's hardware-accelerated approximate top-k
              (lax.approx_min_k, recall ~0.95) instead of an exact
              lax.top_k — several times faster over wide rows; on
              backends without the PartialReduce op it falls back to
              exact. Use for statistics (e.g. the KNN edge-length
              regularizer), not for exact neighbor sets.
    Returns: (dists, idx) both (N, k) — squared distances, ascending.
    """
    n = points.shape[0]
    sq = jnp.sum(points * points, axis=-1)
    big = jnp.float32(jnp.inf)

    def one_block(start):
        q = jax.lax.dynamic_slice_in_dim(points, start, block, axis=0)
        qsq = jax.lax.dynamic_slice_in_dim(sq, start, block, axis=0)
        cross = q @ points.T  # (block, N) on the MXU
        d2 = qsq[:, None] + sq[None, :] - 2.0 * cross
        if valid is not None:
            d2 = jnp.where(valid[None, :], d2, big)
        if approx:
            return jax.lax.approx_min_k(d2, k, recall_target=0.95)
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    nblocks = -(-n // block)
    pad = nblocks * block - n
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e9)
    sq = jnp.sum(pts * pts, axis=-1)
    if valid is not None:
        valid = jnp.pad(valid, (0, pad), constant_values=False)
    else:
        valid = jnp.pad(jnp.ones((n,), bool), (0, pad), constant_values=False)
    points = pts

    starts = jnp.arange(nblocks) * block
    dists, idx = jax.lax.map(one_block, starts)
    dists = dists.reshape(-1, k)[:n]
    idx = idx.reshape(-1, k)[:n]
    return jnp.maximum(dists, 0.0), idx


@functools.partial(jax.jit,
                   static_argnames=("k", "rows", "block", "approx"))
def knn_rows(points: jax.Array, k: int, *, row_start, rows: int,
             valid: jax.Array | None = None, block: int = 4096,
             approx: bool = False):
    """knn() restricted to the query slice [row_start, row_start+rows).

    Candidate set is still ALL points. Used by the gs-sharded train step
    so each mesh rank computes the KNN edge statistic only for its own
    capacity/gs query rows (dist/train_sharded.py) — the distance
    matmuls and top-k shrink by the mesh size while the result equals
    the matching rows of knn().
    """
    n = points.shape[0]
    sq = jnp.sum(points * points, axis=-1)
    big = jnp.float32(jnp.inf)
    if valid is None:
        valid = jnp.ones((n,), bool)

    # pad the query range up to a block multiple (clamped row gather, pad
    # rows discarded below) — picking "largest divisor of rows" instead
    # degraded to 1-row blocks for prime row counts, i.e. thousands of
    # tiny matmuls via lax.map
    bl = min(block, rows)
    rows_padded = -(-rows // bl) * bl

    def one_block(start):
        qi = jnp.clip(start + jnp.arange(bl), 0, n - 1)
        q = points[qi]
        qsq = sq[qi]
        d2 = qsq[:, None] + sq[None, :] - 2.0 * (q @ points.T)
        d2 = jnp.where(valid[None, :], d2, big)
        if approx:
            return jax.lax.approx_min_k(d2, k, recall_target=0.95)
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    starts = row_start + jnp.arange(rows_padded // bl) * bl
    dists, idx = jax.lax.map(one_block, starts)
    dists = dists.reshape(-1, k)[:rows]
    idx = idx.reshape(-1, k)[:rows]
    return jnp.maximum(dists, 0.0), idx
