"""K-nearest-neighbors on TPU.

Replaces pytorch3d.ops.knn_points (used by GaussiansEdgeLoss, reference
sings/rec/losses/loss_items.py:73). Two designs:

  * knn / knn_rows: blocked dense distance matrix on the MXU
    (|a|^2 + |b|^2 - 2 a.b, one matmul per block + top_k). Exact (or
    hardware-approx top-k), but O(N^2) — 5 ms at 51k, ~31 ms at 131k.
  * knn_window_stat: Morton-sorted windowed candidates — O(N*W). Points
    are sorted along a 30-bit Morton curve; each point's K neighbors
    are searched only among the W nearest positions along the curve.
    The curve's locality keeps the statistic usable but NOT exact:
    measured ~85% true-NN recall and ~5-7% mean statistic error on
    dense surface clouds at window=256 (tests/test_ops.py, trainer.py)
    — the KNN edge-length regularizer consumes a stop-gradient'd MEAN
    of K-1 distances (loss_items.py:73-83 .detach()), which absorbs
    rank misses but not the systematic overestimate in thin regions.
    Kept opt-in (tpu.knn_backend=window) until accuracy is fixed.
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


def _spread3(x: jax.Array) -> jax.Array:
    """Spread 10 bits to every 3rd bit (Morton interleave helper)."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton3d(points: jax.Array, valid: jax.Array) -> jax.Array:
    """(N, 3) -> (N,) int32 30-bit Morton codes over the valid bbox.

    Invalid points get INT32_MAX so they argsort to the end."""
    big = jnp.float32(3.0e38)
    lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
    # UNIFORM meters-per-cell (max extent over axes): per-axis
    # normalization makes cells anisotropic and breaks metric locality
    # (measured 6% mean statistic error on a capsule cloud vs 0.2%
    # with uniform cells)
    ext = jnp.maximum(jnp.max(hi - lo), 1e-9)
    q = jnp.clip((points - lo) / ext * 1023.0, 0.0, 1023.0).astype(
        jnp.int32)
    code = (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1)
            | (_spread3(q[:, 2]) << 2))
    return jnp.where(valid, code, jnp.int32(2**31 - 1))


@functools.partial(jax.jit, static_argnames=("k", "window", "block"))
def knn_window_stat(points: jax.Array, k: int, *,
                    valid: jax.Array | None = None,
                    window: int = 256, block: int = 256) -> jax.Array:
    """Mean distance to the K-1 nearest neighbors, per point — the
    statistic the KNN edge-length regularizer consumes (self always
    included among the k, as in knn()).

    O(N * (window + block)) via Morton-curve candidate windows instead
    of knn()'s O(N^2) dense matrix: after sorting along the curve, each
    point's candidates are the `window + block` sorted positions
    around its own. Approximate — curve discontinuities can hide a true
    neighbor: measured ~85% true-NN recall and a ~10% mean-error bound
    on a dense capsule cloud at window=256
    (tests/test_ops.py::test_knn_window_stat_surface_cloud_accuracy);
    the regularizer detaches the statistic (loss_items.py:73-83) so the
    error biases the scale target rather than destabilizing training.
    Returns (N,) in ORIGINAL point order; invalid points get 0.
    """
    n = points.shape[0]
    assert n % block == 0, (n, block)
    if valid is None:
        valid = jnp.ones((n,), bool)
    code = morton3d(points, valid)
    order = jnp.argsort(code)
    ps = points[order]
    pv = valid[order]
    sq = jnp.sum(ps * ps, axis=-1)
    big = jnp.float32(jnp.inf)
    half = window // 2
    cand = block + window
    nblocks = n // block

    def one_block(bi):
        start = bi * block
        cstart = jnp.clip(start - half, 0, max(n - cand, 0))
        cp = jax.lax.dynamic_slice_in_dim(ps, cstart, min(cand, n), 0)
        cv = jax.lax.dynamic_slice_in_dim(pv, cstart, min(cand, n), 0)
        csq = jax.lax.dynamic_slice_in_dim(sq, cstart, min(cand, n), 0)
        q = jax.lax.dynamic_slice_in_dim(ps, start, block, 0)
        qsq = jax.lax.dynamic_slice_in_dim(sq, start, block, 0)
        d2 = qsq[:, None] + csq[None, :] - 2.0 * (q @ cp.T)
        d2 = jnp.where(cv[None, :], d2, big)
        neg, _ = jax.lax.top_k(-d2, k)
        d = jnp.sqrt(jnp.maximum(-neg[:, 1:], 1e-24))
        return d.mean(axis=1)

    stat_sorted = jax.lax.map(one_block, jnp.arange(nblocks)).reshape(-1)
    stat_sorted = jnp.where(pv, stat_sorted, 0.0)
    # un-sort: one more key/value sort (a scatter would cost ~10ns/el)
    _, stat = jax.lax.sort_key_val(order, stat_sorted)
    return stat


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
