"""Regularization losses (reference sings/rec/losses/loss_items.py).

All terms operate on padded static buffers with an `alive` mask so the
jitted train step never sees dynamic shapes:
  * l2_norm: xyz-offset norm, scale variance, above-threshold scales,
    below-threshold opacity (loss_items.py:15-54)
  * gaussians_edge_loss: scale ~ mean KNN edge length (:57-90)
  * mesh_edge_loss: mean squared edge length (pytorch3d.mesh_edge_loss)
  * region laplacian: per-region uniform graph laplacian of the anchor
    mesh, applied as padded gather/segment ops (:93-192). The laplacian
    structure is precomputed on host after each topology change.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn, knn_rows, knn_window_stat


def _masked_norm(x: jax.Array, mask: jax.Array) -> jax.Array:
    """||x * mask||_2 — matches torch .norm() over selected entries."""
    sq = jnp.sum((x * mask) ** 2)
    return jnp.sqrt(jnp.maximum(sq, 1e-24))


class L2NormConfig(NamedTuple):
    lambda_xyz_offsets: float = 0.005
    lambda_scales_diff: float = 0.005
    lambda_max_scale: float = 0.001
    max_scale_threshold: float = 0.008
    lambda_min_opacity: float = 0.0001
    min_opacity_threshold: float = 0.2


def l2_norm_loss(
    cfg: L2NormConfig,
    xyz_offsets: jax.Array,
    scales: jax.Array,
    opacity: jax.Array | None,
    alive: jax.Array,
) -> jax.Array:
    n_alive = jnp.maximum(alive.sum(), 1.0)
    a1 = alive[:, None]
    s0 = scales[:, 0]
    mean_s = jnp.sum(s0 * alive) / n_alive
    scales_diff = (s0 - mean_s) * alive
    over = (s0 > cfg.max_scale_threshold) & (alive > 0)
    loss = (
        cfg.lambda_xyz_offsets * _masked_norm(xyz_offsets, a1)
        + cfg.lambda_scales_diff * jnp.sqrt(
            jnp.maximum(jnp.sum(scales_diff**2), 1e-24))
        + cfg.lambda_max_scale * _masked_norm(s0[:, None], over[:, None])
    )
    if opacity is not None:
        op = opacity.reshape(-1)
        under = (op < cfg.min_opacity_threshold) & (alive > 0)
        loss = loss + cfg.lambda_min_opacity * _masked_norm(
            (0.5 - op)[:, None], under[:, None])
    return loss


def edge_stat(
    xyz_canon: jax.Array, alive: jax.Array, k: int = 9,
    approx: bool = True, backend: str = "dense",
) -> jax.Array:
    """Per-gaussian mean distance to the K-1 nearest neighbors, (N,).

    The stop-gradient'd statistic gaussians_edge_loss consumes
    (reference detaches it, loss_items.py:73-83). Split out so the
    train scan can compute it ONCE per chunk and amortize the O(N^2)
    dense KNN over inner_steps (train/step.py knn_backend="chunk") —
    canonical positions move negligibly within a chunk.
    """
    if backend == "window":
        return jax.lax.stop_gradient(
            knn_window_stat(xyz_canon, k, valid=alive > 0))
    dists, _idx = knn(xyz_canon, k, valid=alive > 0, approx=approx)
    # idx[:, 0] is self; mean over the K-1 neighbors
    return jax.lax.stop_gradient(
        jnp.sqrt(jnp.maximum(dists[:, 1:], 1e-24)).mean(axis=1))


def gaussians_edge_loss_from_stat(
    stat: jax.Array, scales: jax.Array, alive: jax.Array,
) -> jax.Array:
    """mean (scale_i - stat_i)^2 over alive gaussians."""
    err = (scales[:, 0] - stat) ** 2 * alive
    return err.sum() / jnp.maximum(alive.sum(), 1.0)


def gaussians_edge_loss(
    xyz_canon: jax.Array, scales: jax.Array, alive: jax.Array, k: int = 9,
    approx: bool = True, backend: str = "dense",
) -> jax.Array:
    """mean (scale_i - mean KNN edge length)^2 (loss_items.py:57-90).

    KNN edge lengths are treated as constants (reference .detach()), so
    approximation is free game:
      * backend="dense": blocked O(N^2) distance matrix; approx=True
        uses the TPU hardware approximate top-k (recall ~0.95), ~10x
        cheaper than exact top_k over the padded capacity.
      * backend="window": Morton-curve windowed candidates, O(N*W) —
        sub-quadratic but approximate: measured ~85% true-NN recall
        and ~5-7% mean statistic error on dense surface clouds at
        window=256 (ops/knn.py::knn_window_stat, tests/test_ops.py);
        opt-in until the accuracy is fixed.
    """
    stat = edge_stat(xyz_canon, alive, k=k, approx=approx,
                     backend=backend)
    return gaussians_edge_loss_from_stat(stat, scales, alive)


def gaussians_edge_loss_rows(
    xyz_canon: jax.Array, scales: jax.Array, alive: jax.Array,
    row_start, rows: int, k: int = 9, approx: bool = True,
) -> jax.Array:
    """gaussians_edge_loss restricted to a contiguous query-row range.

    Local contribution of one "gs" mesh rank; the rank-sum over all
    ranks equals gaussians_edge_loss (same KNN candidates = all points,
    same global alive normalizer). The distance matmuls and top-k cost
    shrink by the mesh size (dist/train_sharded.py, VERDICT r1 item 6).
    """
    dists, _idx = knn_rows(xyz_canon, k, row_start=row_start, rows=rows,
                           valid=alive > 0, approx=approx)
    edge_len = jax.lax.stop_gradient(
        jnp.sqrt(jnp.maximum(dists[:, 1:], 1e-24)).mean(axis=1)
    )
    s_loc = jax.lax.dynamic_slice_in_dim(scales[:, 0], row_start, rows)
    a_loc = jax.lax.dynamic_slice_in_dim(alive, row_start, rows)
    err = (s_loc - edge_len) ** 2 * a_loc
    return err.sum() / jnp.maximum(alive.sum(), 1.0)


def mesh_edge_loss(verts: jax.Array, edges: jax.Array,
                   edge_valid: jax.Array) -> jax.Array:
    """mean squared edge length over valid (non-padded) edges."""
    d = verts[edges[:, 0]] - verts[edges[:, 1]]
    sq = jnp.sum(d * d, axis=1) * edge_valid
    return sq.sum() / jnp.maximum(edge_valid.sum(), 1.0)


@jax.custom_vjp
def _neighbor_mean(nb, nv, x):
    """y_i = mean over valid neighbors j of x_j  (one gather pass).

    Custom VJP: the graph is undirected, so the adjoint scatter-add
    (A^T g with A row-normalized) is ANOTHER gather over the same
    table: gx_j = sum_{i in N(j)} g_i / deg_i. TPU scatter-adds are
    several times slower than gathers of the same volume.
    """
    deg = jnp.maximum(nv.sum(-1), 1.0)
    return (x[nb] * nv[..., None]).sum(1) / deg[:, None]


def _neighbor_mean_fwd(nb, nv, x):
    return _neighbor_mean(nb, nv, x), (nb, nv)


def _neighbor_mean_bwd(res, g):
    nb, nv = res
    deg = jnp.maximum(nv.sum(-1), 1.0)
    gd = g / deg[:, None]
    gx = (gd[nb] * nv[..., None]).sum(1)
    return jnp.zeros_like(nb), jnp.zeros_like(nv), gx


_neighbor_mean.defvjp(_neighbor_mean_fwd, _neighbor_mean_bwd)


class RegionLaplacian(NamedTuple):
    """Precomputed padded uniform laplacian over ALL regions at once.

    Same math as the reference's per-region loop
    (loss_items.py:123-192: for region r, row i of L_r is L[i,i] = -1,
    L[i,j] = 1/deg(i) for same-label neighbors j), but stored as ONE
    global neighbor table indexed by vertex slot — every vertex belongs
    to exactly one region, so a per-region layout only adds padding
    (the 15-iteration gather loop cost ~50 ms/step; this is one gather
    pass) and its shapes depend on the biggest region. Here shapes are
    (capacity, Dmax): stable across topology changes except for rare
    max-degree growth.

      neighbors: (C, D) int32 same-region neighbor slots (self-padded)
      nbr_valid: (C, D) float 0/1
      label:     (C,) int32 region id, 0 where invalid
      vert_valid:(C,) float 1 for labeled live vertices
      inv_count: (R,) float 1 / max(|V_r|, 1)
      weights:   (R,) float region weights
    """

    neighbors: jax.Array
    nbr_valid: jax.Array
    label: jax.Array
    vert_valid: jax.Array
    inv_count: jax.Array
    weights: jax.Array

    def loss(self, x: jax.Array, region_weights: jax.Array | None = None,
             regions: list[int] | None = None) -> jax.Array:
        """sum_r w_r * mean((L_r x_r)^2) (loss_items.py:183-192)."""
        (out,) = self.loss_fused([(x, region_weights, regions)])
        return out

    def loss_fused(self, terms) -> list[jax.Array]:
        """Several laplacian losses with ONE neighbor gather.

        terms: list of (x (C, F), region_weights | None, regions | None).
        The per-step trainer applies the laplacian to three different
        signals (anchor positions, SH dc color, hand positions); row
        gathers cost per ROW on TPU, so concatenating the feature axes
        runs all of them for the price of one.
        """
        xcat = jnp.concatenate([t[0] for t in terms], axis=-1)
        lx = _neighbor_mean(self.neighbors, self.nbr_valid, xcat) - xcat
        outs = []
        f0 = 0
        for x, region_weights, regions in terms:
            f = x.shape[-1]
            lxi = lx[:, f0: f0 + f]
            f0 += f
            per_v = jnp.sum(lxi * lxi, axis=-1) * self.vert_valid  # (C,)
            w = self.weights if region_weights is None else region_weights
            wv = (w * self.inv_count)[self.label] / f
            if regions is not None:
                sel = jnp.zeros(self.label.shape, bool)
                for r in regions:
                    sel = sel | (self.label == r)
                wv = wv * sel.astype(x.dtype)
            outs.append(jnp.sum(per_v * wv))
        return outs


def build_region_laplacian(
    edges: np.ndarray,
    vertex_label: np.ndarray,
    region_weights: np.ndarray,
    num_regions: int = 15,
    pad_to: int | None = None,
) -> RegionLaplacian:
    """Host-side construction after every topology change
    (loss_items.py:123-169: per-region subgraph of same-label edges).

    pad_to: minimum neighbor-table width D (grow-only callers keep it
    fixed so the compiled step is reused across topology changes).
    """
    labels = np.asarray(vertex_label).astype(np.int64)
    edges = np.asarray(edges)
    c = labels.shape[0]

    in_region = (labels >= 0) & (labels < num_regions)
    edge_lbl = labels[edges]
    same = (edge_lbl[:, 0] == edge_lbl[:, 1]) & in_region[edges[:, 0]]
    sel = edges[same]

    # CSR-style neighbor table via one sort (both edge directions)
    src = np.concatenate([sel[:, 0], sel[:, 1]])
    dst = np.concatenate([sel[:, 1], sel[:, 0]])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    deg = np.bincount(src, minlength=c)
    dmax = max(int(deg.max()) if len(src) else 1, 1)
    if pad_to is not None:
        dmax = max(dmax, pad_to)
    offs = np.zeros(c + 1, np.int64)
    np.cumsum(deg, out=offs[1:])
    col = np.arange(len(src)) - offs[src]

    nb = np.tile(np.arange(c, dtype=np.int32)[:, None], (1, dmax))
    nv = np.zeros((c, dmax), np.float32)
    nb[src, col] = dst.astype(np.int32)
    nv[src, col] = 1.0

    counts = np.bincount(labels[in_region], minlength=num_regions)
    return RegionLaplacian(
        neighbors=jnp.asarray(nb), nbr_valid=jnp.asarray(nv),
        label=jnp.asarray(np.where(in_region, labels, 0).astype(np.int32)),
        vert_valid=jnp.asarray(in_region.astype(np.float32)),
        inv_count=jnp.asarray(
            (1.0 / np.maximum(counts, 1)).astype(np.float32)),
        weights=jnp.asarray(region_weights.astype(np.float32)),
    )

# ---------------------------------------------------------------------------
# Cotangent region laplacian (reference loss_items.py:94-124 with
# laplacian_type='cotangent' -> pytorch3d.ops.cot_laplacian).  The
# reference's own `loss.laplacian.type` config knob is never consumed by
# its trainer; here it is wired through (PARITY.md).  'norm' raises like
# the reference (loss_items.py:111-113 NotImplementedError).
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _weighted_neighbor_sum(nb, w, nbt, wt, x):
    """y_i = sum_d w[i,d] * x[nb[i,d]]  (rows may outnumber vertices).

    Custom VJP: the adjoint is the transposed gather over host-built
    (nbt, wt) tables — gx_v = sum_d wt[v,d] * g[nbt[v,d]] — so the
    backward pass is another gather, never a float scatter (~10x
    cheaper on TPU, see module docstring of ops/rasterizer/tiles.py).
    """
    return jnp.einsum("rd,rdf->rf", w, x[nb])


def _wns_fwd(nb, w, nbt, wt, x):
    return _weighted_neighbor_sum(nb, w, nbt, wt, x), (nbt, wt)


def _wns_bwd(res, g):
    nbt, wt = res
    gx = jnp.einsum("vd,vdf->vf", wt, g[nbt])
    return None, None, None, None, gx


_weighted_neighbor_sum.defvjp(_wns_fwd, _wns_bwd)


class CotRegionLaplacian(NamedTuple):
    """Padded cotangent laplacian rows over (region, vertex) memberships.

    Unlike the uniform laplacian, region partitions OVERLAP: the
    reference selects faces where ANY vertex carries the label and
    includes every vertex of those faces (loss_items.py:156-167), so a
    boundary vertex owns one row per adjacent region.  Rows map to
    global vertex slots via the gather tables; `Lx` row i =
    sum_j cot_w(i,j) x_j with ZERO diagonal — pytorch3d cot_laplacian
    returns pure off-diagonal symmetric cot weights
    (L[i,j] = cot(a_ij) + cot(b_ij)), and RegionLaplacianLoss_v2
    matmuls it raw (loss_items.py:186-190).

      neighbors/nbr_w: (R, D) gather table + cot weights per row
      t_neighbors/t_w: (C, Dt) transposed table for the adjoint
      label:           (R,) region id per row
      row_w:           (R,) 1 / (|partition_r| * 1)  premultiplier so
                       sum(rows) * weights[label] == per-region mean
    """

    neighbors: jax.Array
    nbr_w: jax.Array
    t_neighbors: jax.Array
    t_w: jax.Array
    label: jax.Array
    row_w: jax.Array
    weights: jax.Array

    def loss(self, x, region_weights=None, regions=None):
        (out,) = self.loss_fused([(x, region_weights, regions)])
        return out

    def loss_fused(self, terms):
        """Same contract as RegionLaplacian.loss_fused (one gather)."""
        xcat = jnp.concatenate([t[0] for t in terms], axis=-1)
        lx = _weighted_neighbor_sum(
            self.neighbors, self.nbr_w, self.t_neighbors, self.t_w, xcat)
        outs = []
        f0 = 0
        for x, region_weights, regions in terms:
            f = x.shape[-1]
            lxi = lx[:, f0: f0 + f]
            f0 += f
            per_row = jnp.sum(lxi * lxi, axis=-1)  # (R,)
            w = self.weights if region_weights is None else region_weights
            wv = w[self.label] * self.row_w / f
            if regions is not None:
                sel = jnp.zeros(self.label.shape, bool)
                for r in regions:
                    sel = sel | (self.label == r)
                wv = wv * sel.astype(x.dtype)
            outs.append(jnp.sum(per_row * wv))
        return outs


def cot_edge_weights(verts: np.ndarray, faces: np.ndarray,
                     eps: float = 1e-12):
    """Symmetric cotangent weights per directed face edge.

    pytorch3d.ops.cot_laplacian formula: for a triangle with squared
    edge lengths A2,B2,C2 and area S, cot of the angle opposite edge a
    is (B2 + C2 - A2) / (4 S); the sparse L accumulates the angle
    opposite each edge from both adjacent faces (symmetrized by
    L += L.t()).  Returns (rows, cols, w) COO triplets (both
    directions).
    """
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    a = np.linalg.norm(v1 - v2, axis=1)
    b = np.linalg.norm(v0 - v2, axis=1)
    c = np.linalg.norm(v0 - v1, axis=1)
    s = 0.5 * (a + b + c)
    area = np.sqrt(np.clip(s * (s - a) * (s - b) * (s - c), eps, None))
    a2, b2, c2 = a * a, b * b, c * c
    cota = (b2 + c2 - a2) / (4.0 * area)   # angle at v0, opposite edge a
    cotb = (a2 + c2 - b2) / (4.0 * area)   # at v1
    cotc = (a2 + b2 - c2) / (4.0 * area)   # at v2
    # edge (v1,v2) gets cota, (v2,v0) gets cotb, (v0,v1) gets cotc
    ii = faces[:, [1, 2, 0]].reshape(-1)
    jj = faces[:, [2, 0, 1]].reshape(-1)
    ww = np.stack([cota, cotb, cotc], axis=1).reshape(-1)
    rows = np.concatenate([ii, jj])
    cols = np.concatenate([jj, ii])
    w = np.concatenate([ww, ww])
    return rows, cols, w


def _pad_table(src, dst, val, c_rows, pad_to=None, fill=0):
    """COO (src -> dst, val) to padded (rows, Dmax) gather tables."""
    order = np.argsort(src, kind="stable")
    src, dst, val = src[order], dst[order], val[order]
    deg = np.bincount(src, minlength=c_rows)
    dmax = max(int(deg.max()) if len(src) else 1, 1)
    if pad_to is not None:
        dmax = max(dmax, pad_to)
    offs = np.zeros(c_rows + 1, np.int64)
    np.cumsum(deg, out=offs[1:])
    col = np.arange(len(src)) - offs[src]
    nb = np.zeros((c_rows, dmax), np.int32)
    nw = np.full((c_rows, dmax), float(fill), np.float32)
    nb[src, col] = dst.astype(np.int32)
    nw[src, col] = val.astype(np.float32)
    return nb, nw


def build_cot_region_laplacian(
    verts: np.ndarray,
    faces: np.ndarray,
    vertex_label: np.ndarray,
    region_weights: np.ndarray,
    num_regions: int = 15,
    pad_rows_to: int | None = None,
    pad_width_to: int | None = None,
) -> CotRegionLaplacian:
    """Host-side build after every topology change.

    Per region r: faces with ANY vertex labeled r, partition = unique
    vertices of those faces, cot weights from those faces only
    (loss_items.py:156-167).  Note the weights depend on current vertex
    positions and are frozen between rebuilds (reference computes them
    under torch.no_grad(), loss_items.py:165-167).
    """
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces)
    labels = np.asarray(vertex_label).astype(np.int64)
    c = labels.shape[0]

    row_src, row_dst, row_val, row_lbl = [], [], [], []
    part_sizes = np.ones(num_regions)
    row0 = 0
    # row index spaces per region are disjoint; vertex->row maps differ
    rows_of_region = []
    for r in range(num_regions):
        fl = labels[faces]
        fsel = faces[np.any(fl == r, axis=1)]
        part = np.unique(fsel)
        part_sizes[r] = max(len(part), 1)
        v2row = np.full(c, -1, np.int64)
        v2row[part] = row0 + np.arange(len(part))
        if len(fsel):
            rr, cc, ww = cot_edge_weights(verts, fsel)
            row_src.append(v2row[rr])
            row_dst.append(cc)
            row_val.append(ww)
        rows_of_region.append((row0, len(part)))
        row_lbl.append(np.full(len(part), r, np.int64))
        row0 += len(part)

    n_rows = row0
    src = np.concatenate(row_src) if row_src else np.zeros(0, np.int64)
    dst = np.concatenate(row_dst) if row_dst else np.zeros(0, np.int64)
    val = np.concatenate(row_val) if row_val else np.zeros(0)
    # duplicate (row, col) entries must ACCUMULATE (multiple faces share
    # an edge) — collapse duplicates first
    key = src * c + dst
    uk, inv = np.unique(key, return_inverse=True)
    acc = np.zeros(len(uk))
    np.add.at(acc, inv, val)
    src, dst, val = uk // c, uk % c, acc

    if pad_rows_to is not None and n_rows < pad_rows_to:
        pad = pad_rows_to - n_rows
        row_lbl.append(np.zeros(pad, np.int64))
        n_rows = pad_rows_to
    lbl = (np.concatenate(row_lbl) if row_lbl
           else np.zeros(n_rows, np.int64))

    nb, nw = _pad_table(src, dst, val, n_rows, pad_to=pad_width_to)
    nbt, nwt = _pad_table(dst, src, val, c, pad_to=pad_width_to)

    row_w = np.zeros(n_rows, np.float32)
    for r, (r0, ln) in enumerate(rows_of_region):
        row_w[r0: r0 + ln] = 1.0 / part_sizes[r]

    return CotRegionLaplacian(
        neighbors=jnp.asarray(nb), nbr_w=jnp.asarray(nw),
        t_neighbors=jnp.asarray(nbt), t_w=jnp.asarray(nwt),
        label=jnp.asarray(lbl.astype(np.int32)),
        row_w=jnp.asarray(row_w),
        weights=jnp.asarray(np.asarray(region_weights, np.float32)),
    )


class ShardedRegionLaplacian(NamedTuple):
    """RegionLaplacian split into n_gs contiguous row ranges, one per
    "gs" mesh rank (VERDICT r1 item 6 — no replicated O(N) loss work).

    Every field is stacked on a leading gs axis so shard_map in_specs
    can shard the whole pytree with P("gs"); inside shard_map each rank
    sees its own slice (leading axis 1, squeezed by loss_fused).

      neighbors/nbr_w: (gs, C/gs, D) local rows -> GLOBAL vertex slots,
                       weight = 1/deg(i) (row-normalized uniform L)
      t_neighbors/t_w: (gs, C, Dt) transpose table: for global vertex v,
                       the LOCAL row indices i (within this rank's row
                       range) adjacent to v, weight 1/deg(i) — backward
                       stays a gather (never a float scatter)
      label/vert_valid:(gs, C/gs) per local row
      inv_count/weights:(gs, R) replicated copies
      row_start:       (gs,) int32 global index of the first local row
    """

    neighbors: jax.Array
    nbr_w: jax.Array
    t_neighbors: jax.Array
    t_w: jax.Array
    label: jax.Array
    vert_valid: jax.Array
    inv_count: jax.Array
    weights: jax.Array
    row_start: jax.Array

    def loss_fused(self, terms) -> list[jax.Array]:
        """Local-rank contributions; their "gs" rank-sum equals
        RegionLaplacian.loss_fused on the full table. x entries are
        GLOBAL (C, F) arrays (e.g. all_gathered); gradients flow back
        through the transpose-table gather + a dynamic_update_slice pad,
        both scatter-free."""
        nb, w = self.neighbors[0], self.nbr_w[0]
        nbt, wt = self.t_neighbors[0], self.t_w[0]
        label, vert_valid = self.label[0], self.vert_valid[0]
        inv_count, weights = self.inv_count[0], self.weights[0]
        row0 = self.row_start[0]
        rows = nb.shape[0]

        xcat = jnp.concatenate([t[0] for t in terms], axis=-1)
        mean_nb = _weighted_neighbor_sum(nb, w, nbt, wt, xcat)
        lx = mean_nb - jax.lax.dynamic_slice_in_dim(xcat, row0, rows)
        outs = []
        f0 = 0
        for x, region_weights, regions in terms:
            f = x.shape[-1]
            lxi = lx[:, f0: f0 + f]
            f0 += f
            per_v = jnp.sum(lxi * lxi, axis=-1) * vert_valid
            rw = weights if region_weights is None else region_weights
            wv = (rw * inv_count)[label] / f
            if regions is not None:
                sel = jnp.zeros(label.shape, bool)
                for r in regions:
                    sel = sel | (label == r)
                wv = wv * sel.astype(x.dtype)
            outs.append(jnp.sum(per_v * wv))
        return outs


def shard_region_laplacian(rl: RegionLaplacian, n_gs: int,
                           pad_t_width_to: int | None = None,
                           ) -> ShardedRegionLaplacian:
    """Host-side split of a built RegionLaplacian into n_gs row ranges.

    Transpose-table width is padded to the max across ranks (or
    pad_t_width_to — the case pool needs one width across cases) so
    shapes are rank-uniform; grow-only callers keep the compiled step
    stable across topology changes the same way build_region_laplacian's
    pad_to does.
    """
    nb = np.asarray(rl.neighbors)
    nv = np.asarray(rl.nbr_valid)
    c, d = nb.shape
    assert c % n_gs == 0, "capacity must split over gs"
    rows = c // n_gs
    deg = np.maximum(nv.sum(-1), 1.0)
    w_full = (nv / deg[:, None]).astype(np.float32)

    # COO of the full table once
    src = np.repeat(np.arange(c), d)
    dst = nb.reshape(-1)
    val = w_full.reshape(-1)
    keep = nv.reshape(-1) > 0
    src, dst, val = src[keep], dst[keep], val[keep]

    t_nb, t_w = [], []
    dt = pad_t_width_to or 1
    for r in range(n_gs):
        lo, hi = r * rows, (r + 1) * rows
        m = (src >= lo) & (src < hi)
        tnb, tw = _pad_table(dst[m], src[m] - lo, val[m], c)
        t_nb.append(tnb)
        t_w.append(tw)
        dt = max(dt, tnb.shape[1])
    t_nb = [np.pad(t, ((0, 0), (0, dt - t.shape[1]))) for t in t_nb]
    t_w = [np.pad(t, ((0, 0), (0, dt - t.shape[1]))) for t in t_w]

    sl = lambda a: np.asarray(a).reshape(n_gs, rows, *np.asarray(a).shape[1:])  # noqa: E731
    rep = lambda a: np.tile(np.asarray(a)[None], (n_gs, 1))  # noqa: E731
    return ShardedRegionLaplacian(
        neighbors=jnp.asarray(sl(nb)),
        nbr_w=jnp.asarray(sl(w_full)),
        t_neighbors=jnp.asarray(np.stack(t_nb)),
        t_w=jnp.asarray(np.stack(t_w)),
        label=jnp.asarray(sl(rl.label)),
        vert_valid=jnp.asarray(sl(rl.vert_valid)),
        inv_count=jnp.asarray(rep(rl.inv_count)),
        weights=jnp.asarray(rep(rl.weights)),
        row_start=jnp.asarray(np.arange(n_gs, dtype=np.int32) * rows),
    )


# ---------------------------------------------------------------------------
# Banded region laplacian: RCM-permuted banded matmul instead of
# neighbor-table gathers.
#
# The gather formulation costs ~10 ns per gathered ROW: (capacity x
# max_degree) rows forward + the same again in the adjoint gather —
# measured 22.7 ms/step at 128k capacity (docs/PERF.md r4 table). A
# reverse-Cuthill-McKee ordering of the same-region edge graph bounds
# |i - j| <= B for every edge (measured B = 296 at the r3b 120k-vertex
# mesh), so L becomes a BANDED matrix: apply it as blocked dense
# matmuls on the MXU (each 512-row block's band is skewed into a dense
# (R, R+W-1) tile by a pad/reshape — no scatter), with ONE permutation
# gather of the inputs. precision=HIGHEST is mandatory: Lx is a
# neighbor-mean cancellation (CLAUDE.md MXU rule).
# ---------------------------------------------------------------------------


class BandedRegionLaplacian(NamedTuple):
    """RegionLaplacian equivalent with banded storage (permuted order).

    band/band_t: (C, W) rows of L and L^T in RCM order, W = 2B+1.
    perm: (C,) original slot of permuted row; inv_perm its inverse.
    label/vert_valid: per-vertex data in PERMUTED order.
    inv_count/weights: per-region, order-free.
    """

    band: jax.Array
    band_t: jax.Array
    perm: jax.Array
    inv_perm: jax.Array
    label: jax.Array
    vert_valid: jax.Array
    inv_count: jax.Array
    weights: jax.Array

    def loss(self, x, region_weights=None, regions=None):
        (out,) = self.loss_fused([(x, region_weights, regions)])
        return out

    def loss_fused(self, terms) -> list:
        xcat = jnp.concatenate([t[0] for t in terms], axis=-1)
        xp = _perm_rows(xcat, self.perm, self.inv_perm)
        lx = _band_matvec(self.band, self.band_t, xp)
        outs = []
        f0 = 0
        for x, region_weights, regions in terms:
            f = x.shape[-1]
            lxi = lx[:, f0: f0 + f]
            f0 += f
            per_v = jnp.sum(lxi * lxi, axis=-1) * self.vert_valid
            w = self.weights if region_weights is None else region_weights
            wv = (w * self.inv_count)[self.label] / f
            if regions is not None:
                sel = jnp.zeros(self.label.shape, bool)
                for r in regions:
                    sel = sel | (self.label == r)
                wv = wv * sel.astype(x.dtype)
            outs.append(jnp.sum(per_v * wv))
        return outs


@jax.custom_vjp
def _perm_rows(x, perm, inv_perm):
    """x[perm] whose adjoint is g[inv_perm] (permutation transpose =
    inverse permutation — a gather, never a scatter)."""
    return x[perm]


def _perm_rows_fwd(x, perm, inv_perm):
    return x[perm], (perm, inv_perm)


def _perm_rows_bwd(res, g):
    perm, inv_perm = res
    return g[inv_perm], jnp.zeros_like(perm), jnp.zeros_like(inv_perm)


_perm_rows.defvjp(_perm_rows_fwd, _perm_rows_bwd)


def _band_apply_raw(band, x, rblk: int = 512):
    """y_i = sum_k band[i, k] * x[i + k - B], blocked MXU matmuls.

    Each block's (R, W) band slice is skewed into a dense
    (R, R + W - 1) tile purely with pad/reshape (flat offset algebra:
    padding each row to W + R and reflattening at stride W + R - 1
    lands row i's entries at columns [i, i + W)), then one matmul
    against the padded input window.
    """
    c, w = band.shape
    f = x.shape[1]
    b = (w - 1) // 2
    nb_ = -(-c // rblk)
    hp = jax.lax.Precision.HIGHEST
    xp = jnp.pad(x, ((b, b + nb_ * rblk - c), (0, 0)))
    bandp = jnp.pad(band, ((0, nb_ * rblk - c), (0, 0)))

    def block(i):
        r0 = i * rblk
        bb = jax.lax.dynamic_slice_in_dim(bandp, r0, rblk, 0)
        d = jnp.pad(bb, ((0, 0), (0, rblk)))
        d = d.reshape(-1)[: rblk * (w + rblk - 1)].reshape(
            rblk, w + rblk - 1)
        xw = jax.lax.dynamic_slice_in_dim(xp, r0, rblk + w - 1, 0)
        return jnp.dot(d, xw, precision=hp,
                       preferred_element_type=x.dtype)

    out = jax.lax.map(block, jnp.arange(nb_))
    return out.reshape(-1, f)[:c]


@jax.custom_vjp
def _band_matvec(band, band_t, x):
    return _band_apply_raw(band, x)


def _band_matvec_fwd(band, band_t, x):
    return _band_apply_raw(band, x), (band, band_t)


def _band_matvec_bwd(res, g):
    band, band_t = res
    # adjoint of y = L x is L^T g — the transposed band, same blocks
    return (jnp.zeros_like(band), jnp.zeros_like(band_t),
            _band_apply_raw(band_t, g))


_band_matvec.defvjp(_band_matvec_fwd, _band_matvec_bwd)


def build_region_laplacian_banded(
    edges: np.ndarray,
    vertex_label: np.ndarray,
    region_weights: np.ndarray,
    num_regions: int = 15,
    pad_width: int | None = None,
    width_fn=None,
) -> BandedRegionLaplacian:
    """Host-side RCM + device band tables (see class docstring).

    pad_width: minimum W (grow-only callers keep the compiled step
    stable across topology changes).
    width_fn: optional raw_width -> padded_width policy (e.g. the
    trainer's 64-bucketed headroom), applied BEFORE pad_width so the
    caller can size the band once instead of build-measure-rebuild
    (the (capacity, W) band tables are the expensive part at >=32k
    capacity — two ~0.5 GB numpy materializations per build).
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    labels = np.asarray(vertex_label).astype(np.int64)
    edges = np.asarray(edges)
    c = labels.shape[0]

    in_region = (labels >= 0) & (labels < num_regions)
    if len(edges):
        edge_lbl = labels[edges]
        same = (edge_lbl[:, 0] == edge_lbl[:, 1]) & in_region[edges[:, 0]]
        sel = edges[same]
    else:
        sel = np.zeros((0, 2), np.int64)

    if len(sel):
        m = coo_matrix(
            (np.ones(len(sel) * 2),
             (np.r_[sel[:, 0], sel[:, 1]], np.r_[sel[:, 1], sel[:, 0]])),
            shape=(c, c)).tocsr()
        perm = np.asarray(reverse_cuthill_mckee(m, symmetric_mode=True),
                          dtype=np.int64)
    else:
        perm = np.arange(c, dtype=np.int64)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(c)

    src = np.concatenate([sel[:, 0], sel[:, 1]])
    dst = np.concatenate([sel[:, 1], sel[:, 0]])
    ps, pd = inv[src], inv[dst]
    bw = int(np.abs(ps - pd).max()) if len(ps) else 0
    w = 2 * bw + 1
    if width_fn is not None:
        w = max(w, int(width_fn(w)))
    if pad_width is not None:
        w = max(w, pad_width)
    b = (w - 1) // 2

    deg = np.bincount(ps, minlength=c).astype(np.float32)
    wval = 1.0 / np.maximum(deg[ps], 1.0)

    band = np.zeros((c, w), np.float32)
    band_t = np.zeros((c, w), np.float32)
    np.add.at(band, (ps, pd - ps + b), wval)
    np.add.at(band_t, (pd, ps - pd + b), wval)
    valid_p = in_region[perm]
    diag = np.where(valid_p, -1.0, 0.0).astype(np.float32)
    band[np.arange(c), b] += diag
    band_t[np.arange(c), b] += diag

    counts = np.bincount(labels[in_region], minlength=num_regions)
    return BandedRegionLaplacian(
        band=jnp.asarray(band), band_t=jnp.asarray(band_t),
        perm=jnp.asarray(perm.astype(np.int32)),
        inv_perm=jnp.asarray(inv.astype(np.int32)),
        label=jnp.asarray(
            np.where(in_region, labels, 0)[perm].astype(np.int32)),
        vert_valid=jnp.asarray(valid_p.astype(np.float32)),
        inv_count=jnp.asarray(
            (1.0 / np.maximum(counts, 1)).astype(np.float32)),
        weights=jnp.asarray(region_weights.astype(np.float32)),
    )
