"""Pallas TPU kernels for tile-based gaussian alpha compositing.

TPU-first redesign of the CUDA renderCUDA forward/backward loops
(external diff-gaussian-rasterization dep of the reference,
gs_renderer_single.py:87-95). Key mapping decisions:

  * one grid instance per image tile (TILE x TILE pixels on the lane
    axis), gaussian chunks of CHUNK on the sublane axis;
  * the kernels read each tile's segment of the depth/tile-sorted pair
    array DIRECTLY: the DMA window starts at the 128-aligned floor of
    the segment and head/tail items are masked by index comparison.
    This removes the padded re-layout entirely — TPU scatters/gathers
    cost ~10ns/element, so re-laying out 450k pairs costed more than
    all the compositing math combined;
  * the order-dependent front-to-back compositing is reformulated per
    chunk in log space: the exclusive cumulative product of (1 - alpha)
    becomes a strictly-lower-triangular matmul on the MXU;
  * the CUDA early-termination rule (stop when T*(1-alpha) < 1e-4) is
    reproduced exactly with a monotone flag mask (see reference.py),
    plus a per-tile while-loop early exit once every pixel saturates;
  * the backward pass is a second front-to-back walk using the global
    closed form  dC/dalpha_i = c_i*T_i - S_i/(1-alpha_i)  with
    S_i = C_final - C_upto_i; the three per-channel suffix sums only
    appear cotangent-weighted (sum_k g_k S_i,k), so the walk carries a
    single weighted accumulator and ONE inclusive-cumsum matmul per
    chunk. Per-pair gradients stream to an aligned gradient buffer (its
    per-tile regions are padded so chunk writes stay 128-aligned) and
    are reduced outside with a gather (never a float scatter).

Pair features layout (16, PK + CHUNK) float32 — transposed so chunk DMA
slices the minor (pair) axis; the extra CHUNK columns are zero padding
for the last window overrun. Rows:
  0 mean_x | 1 mean_y | 2 conic_a | 3 conic_b | 4 conic_c |
  5 r | 6 g | 7 b | 8 opacity | 9..15 zero
Backward writes gradients in the same row layout (row 8 = d_opacity).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
NFEAT = 16


def _pixel_coords_local(tile: int):
    """(1, tile*tile) x and y pixel coordinates LOCAL to a tile.

    All per-pixel math runs in tile-local coordinates (gaussian means
    are shifted by the tile origin instead): the values stay small
    (|x| <= tile, |mean_loc| <~ 4*tile) which keeps the alpha quadratic
    form better-conditioned in f32 than global pixel coordinates.
    """
    npx = tile * tile
    p = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    col = (p % tile).astype(jnp.float32)
    row = (p // tile).astype(jnp.float32)
    return col, row


def _tile_origin(tile_idx, tile: int, n_tiles_x: int):
    tx = (tile_idx % n_tiles_x).astype(jnp.float32)
    ty = (tile_idx // n_tiles_x).astype(jnp.float32)
    return tx * tile, ty * tile


def _chunk_alpha(f, ox, oy, px_x, px_y, pair_ok):
    """Shared fwd/bwd chunk math. f: (CHUNK, NFEAT) features,
    (ox, oy): scalar tile origin, (px_x, px_y): (1, npx) tile-local
    pixel coords, pair_ok: (CHUNK, 1) mask for items inside the tile's
    segment.

    Returns (alpha, Gv, mx, my) with alpha/Gv (CHUNK, npx) and mx/my
    (CHUNK, 1) tile-local mean columns."""
    mx = f[:, 0:1] - ox
    my = f[:, 1:2] - oy
    ca, cb, cc = f[:, 2:3], f[:, 3:4], f[:, 4:5]
    op = f[:, 8:9]
    dx = mx - px_x
    dy = my - px_y
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    gv = jnp.exp(power)
    alpha = jnp.minimum(0.99, op * gv)
    alpha = jnp.where(
        (power > 0.0) | (alpha < ALPHA_MIN) | ~pair_ok, 0.0, alpha)
    return alpha, gv, mx, my


def _tri_strict(chunk: int):
    """(chunk, chunk) strictly-lower-triangular ones: out[i,j]=1 iff j<i."""
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (j < i).astype(jnp.float32)


def _incl_cumsum_roll(x):
    """Inclusive cumsum over the sublane (chunk) axis via log2(chunk)
    masked rolls — the MXU-free alternative to the triangular matmul.

    The matmul formulation costs 2*chunk MXU flops per pair-pixel (the
    single biggest term in the kernel roofline, docs/PERF.md); the
    Hillis-Steele scan costs ~3*log2(chunk) VPU ops. Same sums, f32
    reassociated (parity tolerance 2e-4 absorbs it)."""
    chunk = x.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < chunk:
        r = pltpu.roll(x, shift=d, axis=0)
        x = x + jnp.where(i >= d, r, 0.0)
        d *= 2
    return x


def _tri_incl(chunk: int):
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (j <= i).astype(jnp.float32)


def _segment(offs_ref, t, chunk):
    start = offs_ref[t]
    end = offs_ref[t + 1]
    base = pl.multiple_of((start // chunk) * chunk, chunk)
    nchunks = (end - base + chunk - 1) // chunk
    return start, end, base, nchunks


def _fwd_kernel(offs_ref, feats_hbm, out_ref, fscratch, sem,
                *, tile, chunk, n_tiles_x, scan_roll=False):
    t = pl.program_id(0)
    npx = tile * tile
    start, end, base, nchunks = _segment(offs_ref, t, chunk)

    px_x, px_y = _pixel_coords_local(tile)
    ox, oy = _tile_origin(t, tile, n_tiles_x)
    ltri = None if scan_roll else _tri_strict(chunk)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    # double-buffered chunk DMA: prefetch c+1 while compositing c
    def start_dma(c, slot):
        off = pl.multiple_of(base + c * chunk, chunk)
        pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(off, chunk)], fscratch.at[slot],
            sem.at[slot],
        ).start()

    @pl.when(nchunks > 0)
    def _():
        start_dma(0, 0)

    def body(carry):
        c, t_carry, acc_r, acc_g, acc_b = carry
        slot = c % 2

        @pl.when(c + 1 < nchunks)
        def _():
            start_dma(c + 1, (c + 1) % 2)

        off = pl.multiple_of(base + c * chunk, chunk)
        pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(off, chunk)], fscratch.at[slot],
            sem.at[slot],
        ).wait()
        f = jnp.transpose(fscratch[slot], (1, 0))  # (chunk, NFEAT)
        gidx = off + sub_iota
        pair_ok = (gidx >= start) & (gidx < end)
        alpha, _, _, _ = _chunk_alpha(f, ox, oy, px_x, px_y, pair_ok)
        la = jnp.log1p(-alpha)
        excl = (_incl_cumsum_roll(la) - la if scan_roll
                else jnp.dot(ltri, la, preferred_element_type=jnp.float32))
        t_bef = t_carry * jnp.exp(excl)
        flag = (t_bef * (1.0 - alpha)) >= T_EPS
        aeff = jnp.where(flag, alpha, 0.0)
        w = aeff * t_bef
        acc_r = acc_r + jnp.sum(w * f[:, 5:6], axis=0, keepdims=True)
        acc_g = acc_g + jnp.sum(w * f[:, 6:7], axis=0, keepdims=True)
        acc_b = acc_b + jnp.sum(w * f[:, 7:8], axis=0, keepdims=True)
        # log1p(-aeff) = flag * la — reuse la instead of a second log1p
        la_eff = jnp.where(flag, la, 0.0)
        t_carry = t_carry * jnp.exp(
            jnp.sum(la_eff, axis=0, keepdims=True))
        return c + 1, t_carry, acc_r, acc_g, acc_b

    def cond(carry):
        c, t_carry, *_ = carry
        return jnp.logical_and(c < nchunks, jnp.max(t_carry) >= T_EPS)

    init = (
        jnp.int32(0),
        jnp.ones((1, npx), jnp.float32),
        jnp.zeros((1, npx), jnp.float32),
        jnp.zeros((1, npx), jnp.float32),
        jnp.zeros((1, npx), jnp.float32),
    )
    c_done, t_final, acc_r, acc_g, acc_b = jax.lax.while_loop(
        cond, body, init)

    # early exit can leave the next chunk's prefetch in flight — drain it
    # so the semaphore/scratch are clean for the next grid step
    @pl.when(c_done < nchunks)
    def _():
        off = pl.multiple_of(base + c_done * chunk, chunk)
        pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(off, chunk)],
            fscratch.at[c_done % 2], sem.at[c_done % 2],
        ).wait()

    zeros = jnp.zeros((4, npx), jnp.float32)
    out_ref[0] = jnp.concatenate(
        [acc_r, acc_g, acc_b, t_final, zeros], axis=0)


def _bwd_kernel(offs_ref, goffs_ref, feats_hbm, fwd_ref, gout_ref, grads_hbm,
                fscratch, gscratch, sem, osem,
                *, tile, chunk, n_tiles_x, grad_cap, scan_roll=False):
    t = pl.program_id(0)
    npx = tile * tile
    start, end, base, nchunks = _segment(offs_ref, t, chunk)
    gbase = goffs_ref[t]

    px_x, px_y = _pixel_coords_local(tile)
    ox, oy = _tile_origin(t, tile, n_tiles_x)
    ltri = None if scan_roll else _tri_strict(chunk)
    linc = None if scan_roll else _tri_incl(chunk)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    t_final = fwd_ref[0, 3:4, :]
    g_rgb = gout_ref[0, 0:3, :]  # (3, npx) color cotangents
    g_t = gout_ref[0, 3:4, :]
    # per-tile constants of the cotangent-weighted backward: the three
    # per-channel suffix sums S_k = C_final_k - up_k only ever appear in
    # dl_da as sum_k g_k * S_k, so the whole chunk walk runs on ONE
    # weighted accumulator (cpg) and ONE inclusive-cumsum matmul instead
    # of three per-channel ones (measured 3.51 -> 3.07 ms at the bench
    # scene; the moment-matmul alternative for the d_* reductions was
    # SLOWER — cross-lane reductions are cheap under Mosaic, N=8
    # matmuls are not; see scripts/exp_bwd_variants.py)
    cfg = jnp.sum(g_rgb * fwd_ref[0, 0:3, :], axis=0, keepdims=True)
    gtf = g_t * t_final

    def write_dma(c, slot):
        return pltpu.make_async_copy(
            gscratch.at[slot],
            grads_hbm.at[:, pl.ds(pl.multiple_of(gbase + c * chunk, chunk),
                                  chunk)],
            osem.at[slot],
        )

    def read_dma(c, slot):
        off = pl.multiple_of(base + c * chunk, chunk)
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(off, chunk)], fscratch.at[slot],
            sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        read_dma(0, 0).start()

    def body(carry):
        c, t_carry, cpg = carry
        slot = c % 2

        @pl.when(c + 1 < nchunks)
        def _():
            read_dma(c + 1, (c + 1) % 2).start()

        read_dma(c, slot).wait()
        # the write issued two chunks ago reused this gscratch slot
        @pl.when(c >= 2)
        def _():
            write_dma(c - 2, slot).wait()

        off = pl.multiple_of(base + c * chunk, chunk)
        f = jnp.transpose(fscratch[slot], (1, 0))  # (chunk, NFEAT)
        gidx = off + sub_iota
        pair_ok = (gidx >= start) & (gidx < end)
        alpha, gv, mx, my = _chunk_alpha(f, ox, oy, px_x, px_y, pair_ok)
        la = jnp.log1p(-alpha)
        excl = (_incl_cumsum_roll(la) - la if scan_roll
                else jnp.dot(ltri, la, preferred_element_type=jnp.float32))
        t_bef = t_carry * jnp.exp(excl)
        flag = (t_bef * (1.0 - alpha)) >= T_EPS
        aeff = jnp.where(flag, alpha, 0.0)
        w = aeff * t_bef

        # gc[i, px] = sum_k g_k[px] * color_k[i]  (VPU rank-3; a 3-K
        # MXU matmul measured slower)
        gc = (f[:, 5:6] * g_rgb[0:1] + f[:, 6:7] * g_rgb[1:2]
              + f[:, 7:8] * g_rgb[2:3])
        wgc = w * gc
        upg = cpg + (_incl_cumsum_roll(wgc) if scan_roll
                     else jnp.dot(linc, wgc,
                                  preferred_element_type=jnp.float32))
        inv1m = 1.0 / (1.0 - aeff)
        dl_da = t_bef * gc - inv1m * ((cfg - upg) + gtf)
        dl_da = jnp.where(aeff > 0.0, dl_da, 0.0)

        # CUDA-quirk derivatives: treat alpha = opacity * G even when the
        # 0.99 clamp was active (backward.cu does the same).
        dl_dg = f[:, 8:9] * dl_da
        dl_dop = jnp.sum(gv * dl_da, axis=1, keepdims=True)
        dl_dpow = dl_dg * gv
        ca, cb, cc = f[:, 2:3], f[:, 3:4], f[:, 4:5]
        dx = mx - px_x
        dy = my - px_y
        # CSE: with u = dl_dpow*dx, v = dl_dpow*dy, the five quadratic
        # reductions share moments — per-pair conic columns factor OUT
        # of the pixel reductions (d_mx = -(ca*sum(u) + cb*sum(v))),
        # saving ~7 full (chunk, npx) elementwise ops per chunk on the
        # VPU-bound walk
        u = dl_dpow * dx
        v = dl_dpow * dy
        su = jnp.sum(u, axis=1, keepdims=True)
        sv = jnp.sum(v, axis=1, keepdims=True)
        d_mx = -(ca * su + cb * sv)
        d_my = -(cc * sv + cb * su)
        d_ca = -0.5 * jnp.sum(u * dx, axis=1, keepdims=True)
        d_cb = -jnp.sum(u * dy, axis=1, keepdims=True)
        d_cc = -0.5 * jnp.sum(v * dy, axis=1, keepdims=True)
        d_r = jnp.sum(g_rgb[0:1] * w, axis=1, keepdims=True)
        d_g = jnp.sum(g_rgb[1:2] * w, axis=1, keepdims=True)
        d_b = jnp.sum(g_rgb[2:3] * w, axis=1, keepdims=True)

        zeros = jnp.zeros((chunk, 1), jnp.float32)
        gchunk = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_r, d_g, d_b, dl_dop,
             zeros, zeros, zeros, zeros, zeros, zeros, zeros], axis=1
        )
        gscratch[slot] = jnp.transpose(gchunk, (1, 0))  # (NFEAT, chunk)
        write_dma(c, slot).start()

        cpg = upg[chunk - 1:chunk, :]  # inclusive-cumsum last row
        la_eff = jnp.where(flag, la, 0.0)
        t_carry = t_carry * jnp.exp(
            jnp.sum(la_eff, axis=0, keepdims=True))
        return c + 1, t_carry, cpg

    def cond(carry):
        c, t_carry, _ = carry
        return jnp.logical_and(c < nchunks, jnp.max(t_carry) >= T_EPS)

    init = (
        jnp.int32(0),
        jnp.ones((1, npx), jnp.float32),
        jnp.zeros((1, npx), jnp.float32),
    )
    c_done, *_ = jax.lax.while_loop(cond, body, init)

    # drain outstanding DMAs (early exit can leave a read prefetch and
    # up to two writes in flight)
    @pl.when(c_done < nchunks)
    def _():
        read_dma(c_done, c_done % 2).wait()

    @pl.when(c_done >= 1)
    def _():
        write_dma(c_done - 1, (c_done - 1) % 2).wait()

    @pl.when(c_done >= 2)
    def _():
        write_dma(c_done - 2, (c_done - 2) % 2).wait()

    # early exit leaves later chunks unwritten; pairs there were never
    # composited (flags false) so their gradients are zero — flush zeros
    gscratch[0] = jnp.zeros((NFEAT, chunk), jnp.float32)

    def zero_body(c, _):
        dma = write_dma(c, 0)
        dma.start()
        dma.wait()
        return 0

    jax.lax.fori_loop(c_done, nchunks, zero_body, 0)

    # last grid step zero-fills the reserved spare chunk (its final slot
    # is the spare slot the glue gathers for invalid pairs) — replaces
    # an XLA whole-buffer copy outside the kernel (api._composite_bwd)
    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        dma = pltpu.make_async_copy(
            gscratch.at[0],
            grads_hbm.at[:, pl.ds(grad_cap - chunk, chunk)],
            osem.at[0],
        )
        dma.start()
        dma.wait()


# ---------------------------------------------------------------------------
# Panel kernels: image-layout output + cross-tile chunk-0 prefetch.
#
# The tiled kernels above emit (T, 8, npx) tile-major blocks that XLA must
# re-lay out into (3, H, W) images with 5D transposes whose minor dim is
# `tile` (16) — measured ~1.8 ms of the 12.3 ms fwd+bwd walk at the bench
# scene (docs/PERF.md roofline). They also pay one full DMA latency at
# every tile start (first chunk has no prefetch across grid steps):
# ~0.6 us x 1024 tiles accounts for most of the 40-50% gap to the
# structural bound.
#
# The panel variant fixes both structurally:
#   * grid (nty, ntx/pw): each step walks pw adjacent tiles of one tile
#     row (pw = 128 // tile, so the out block (4, tile, pw*tile) has a
#     128-lane minor dim) and writes color+transmittance DIRECTLY in
#     image layout — the XLA relayout disappears on both fwd and bwd;
#   * the pw sub-tiles' chunk-0 DMAs are all issued up front (their
#     segments are known from the prefetched offsets), so only the first
#     sub-tile of a panel can stall on DMA latency;
#   * the (1, npx) walk accumulators are placed into the (tile, tile)
#     image block with exact 0/1 selection MATMULS (_row_to_tile): a
#     relayout routed through the MXU, avoiding the Mosaic reshape
#     lowerings that made a dedicated relayout kernel unlowerable
#     (the deleted relayout.py pallas backend).
#
# pw = 1 degenerates to one-tile-per-step with (4, tile, tile) image
# blocks (strided DMA writes, no relayout) — kept for tile sizes > 128.


def _sel_tables(tile: int):
    """Exact 0/1 selection matrices for (1, tile^2) <-> (tile, tile).

    A:  (tile, npx) with A[i, p]  = [p // tile == i];
    B:  (npx, tile) with B[p, j]  = [p %  tile == j];
    BT: (tile, npx) with BT[j, p] = [p %  tile == j] (B's transpose,
        built directly so the kernels never lower a transpose op).
    row->tile: out[i, j] = sum_p A[i,p] * v[p] * B[p,j] = v[i*tile + j].
    """
    npx = tile * tile
    i = jax.lax.broadcasted_iota(jnp.int32, (tile, npx), 0)
    p = jax.lax.broadcasted_iota(jnp.int32, (tile, npx), 1)
    a = ((p // tile) == i).astype(jnp.float32)
    pj = jax.lax.broadcasted_iota(jnp.int32, (npx, tile), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (npx, tile), 1)
    b = ((pj % tile) == j).astype(jnp.float32)
    bt = ((p % tile) == i).astype(jnp.float32)
    return a, b, bt


def _row_to_tile(v, a, b, bt):
    """(1, npx) row-major pixel vector -> (tile, tile) image tile.

    precision=HIGHEST: the default bf16 MXU passes ROUND the routed
    values (~2e-3 absolute, measured on chip); with the f32 split the
    0/1 routing is exact — each output is one product of an exact
    selector with the value."""
    return jnp.dot(a * v, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _tile_to_row(m, a, b, bt):
    """(tile, tile) image tile -> (1, npx) row-major pixel vector."""
    t = jnp.dot(m, bt, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (tile, npx)
    return jnp.sum(a * t, axis=0, keepdims=True)


def _panel_segment(offs_ref, r, tx, n_tiles_x, chunk):
    """Segment of sub-tile column tx in row r; empty when tx >= ntx
    (panel padding columns)."""
    ok = tx < n_tiles_x
    t = r * n_tiles_x + jnp.minimum(tx, n_tiles_x - 1)
    start = jnp.where(ok, offs_ref[t], 0)
    end = jnp.where(ok, offs_ref[t + 1], 0)
    base = pl.multiple_of((start // chunk) * chunk, chunk)
    nchunks = (end - base + chunk - 1) // chunk
    return t, start, end, base, nchunks


def _fwd_kernel_panel(offs_ref, feats_hbm, out_ref, pre, fscratch, psem, sem,
                      *, tile, chunk, n_tiles_x, pw, scan_roll=False):
    r = pl.program_id(0)
    s = pl.program_id(1)
    npx = tile * tile

    px_x, px_y = _pixel_coords_local(tile)
    ltri = None if scan_roll else _tri_strict(chunk)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    a_sel, b_sel, bt_sel = _sel_tables(tile)

    def read_dma(off, slot):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(pl.multiple_of(off, chunk), chunk)],
            fscratch.at[slot], sem.at[slot],
        )

    def pre_dma(base, k):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(base, chunk)], pre.at[k], psem.at[k],
        )

    # issue every sub-tile's first chunk up front (segments all known
    # from the prefetched offsets); empty segments read in-bounds
    # garbage at base=0 that the pair_ok mask discards
    for k in range(pw):
        _, _, _, base_k, _ = _panel_segment(
            offs_ref, r, s * pw + k, n_tiles_x, chunk)
        pre_dma(base_k, k).start()

    for k in range(pw):
        tx = s * pw + k
        _, start, end, base, nchunks = _panel_segment(
            offs_ref, r, tx, n_tiles_x, chunk)
        ox = tx.astype(jnp.float32) * tile
        oy = r.astype(jnp.float32) * tile

        def chunk_math(f, off, carry):
            t_carry, acc_r, acc_g, acc_b = carry
            gidx = off + sub_iota
            pair_ok = (gidx >= start) & (gidx < end)
            alpha, _, _, _ = _chunk_alpha(f, ox, oy, px_x, px_y, pair_ok)
            la = jnp.log1p(-alpha)
            excl = (_incl_cumsum_roll(la) - la if scan_roll
                    else jnp.dot(ltri, la,
                                 preferred_element_type=jnp.float32))
            t_bef = t_carry * jnp.exp(excl)
            flag = (t_bef * (1.0 - alpha)) >= T_EPS
            aeff = jnp.where(flag, alpha, 0.0)
            w = aeff * t_bef
            acc_r = acc_r + jnp.sum(w * f[:, 5:6], axis=0, keepdims=True)
            acc_g = acc_g + jnp.sum(w * f[:, 6:7], axis=0, keepdims=True)
            acc_b = acc_b + jnp.sum(w * f[:, 7:8], axis=0, keepdims=True)
            la_eff = jnp.where(flag, la, 0.0)
            t_carry = t_carry * jnp.exp(
                jnp.sum(la_eff, axis=0, keepdims=True))
            return t_carry, acc_r, acc_g, acc_b

        # peeled chunk 0 from the prefetched slot (may be an empty
        # segment — fully masked, costs one chunk of VPU work only for
        # panels that exist)
        pre_dma(base, k).wait()

        @pl.when(nchunks > 1)
        def _():
            read_dma(base + chunk, 1).start()

        init = (
            jnp.ones((1, npx), jnp.float32),
            jnp.zeros((1, npx), jnp.float32),
            jnp.zeros((1, npx), jnp.float32),
            jnp.zeros((1, npx), jnp.float32),
        )
        carry0 = chunk_math(jnp.transpose(pre[k], (1, 0)), base, init)

        def body(loop):
            c, carry = loop
            slot = c % 2

            @pl.when(c + 1 < nchunks)
            def _():
                read_dma(base + (c + 1) * chunk, (c + 1) % 2).start()

            read_dma(base + c * chunk, slot).wait()
            f = jnp.transpose(fscratch[slot], (1, 0))
            return c + 1, chunk_math(f, base + c * chunk, carry)

        def cond(loop):
            c, carry = loop
            return jnp.logical_and(c < nchunks,
                                   jnp.max(carry[0]) >= T_EPS)

        c_done, carry = jax.lax.while_loop(
            cond, body, (jnp.int32(1), carry0))

        # drain an in-flight prefetch left by early exit
        @pl.when(jnp.logical_and(c_done < nchunks, nchunks > 1))
        def _():
            read_dma(base + c_done * chunk, c_done % 2).wait()

        t_final, acc_r, acc_g, acc_b = carry
        sl = slice(k * tile, (k + 1) * tile)
        out_ref[0, :, sl] = _row_to_tile(acc_r, a_sel, b_sel, bt_sel)
        out_ref[1, :, sl] = _row_to_tile(acc_g, a_sel, b_sel, bt_sel)
        out_ref[2, :, sl] = _row_to_tile(acc_b, a_sel, b_sel, bt_sel)
        out_ref[3, :, sl] = _row_to_tile(t_final, a_sel, b_sel, bt_sel)


def _bwd_kernel_panel(offs_ref, goffs_ref, feats_hbm, fwd_ref, gout_ref,
                      grads_hbm, pre, fscratch, gscratch, psem, sem, osem,
                      *, tile, chunk, n_tiles_x, pw, grad_cap,
                      scan_roll=False):
    r = pl.program_id(0)
    s = pl.program_id(1)
    npx = tile * tile

    px_x, px_y = _pixel_coords_local(tile)
    ltri = None if scan_roll else _tri_strict(chunk)
    linc = None if scan_roll else _tri_incl(chunk)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    a_sel, b_sel, bt_sel = _sel_tables(tile)

    def read_dma(off, slot):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(pl.multiple_of(off, chunk), chunk)],
            fscratch.at[slot], sem.at[slot],
        )

    def pre_dma(base, k):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(base, chunk)], pre.at[k], psem.at[k],
        )

    for k in range(pw):
        _, _, _, base_k, _ = _panel_segment(
            offs_ref, r, s * pw + k, n_tiles_x, chunk)
        pre_dma(base_k, k).start()

    for k in range(pw):
        tx = s * pw + k
        t, start, end, base, nchunks = _panel_segment(
            offs_ref, r, tx, n_tiles_x, chunk)
        gbase = goffs_ref[t]
        ox = tx.astype(jnp.float32) * tile
        oy = r.astype(jnp.float32) * tile
        sl = slice(k * tile, (k + 1) * tile)

        # per-sub-tile cotangent rows (loop-invariant): image-layout
        # planes back to (1, npx) walk rows via the selection matmuls
        t_final = _tile_to_row(fwd_ref[3, :, sl], a_sel, b_sel, bt_sel)
        f_r = _tile_to_row(fwd_ref[0, :, sl], a_sel, b_sel, bt_sel)
        f_g = _tile_to_row(fwd_ref[1, :, sl], a_sel, b_sel, bt_sel)
        f_b = _tile_to_row(fwd_ref[2, :, sl], a_sel, b_sel, bt_sel)
        g_r = _tile_to_row(gout_ref[0, :, sl], a_sel, b_sel, bt_sel)
        g_g = _tile_to_row(gout_ref[1, :, sl], a_sel, b_sel, bt_sel)
        g_b = _tile_to_row(gout_ref[2, :, sl], a_sel, b_sel, bt_sel)
        g_t = _tile_to_row(gout_ref[3, :, sl], a_sel, b_sel, bt_sel)
        # NOTE: the tiled kernel computes this as jnp.sum(g_rgb * fwd,
        # axis=0), which the compiler contracts into FMA chains — the
        # chained-add form here differs by ~1 ulp (tests compare the
        # layouts at 1e-5 relative, not bitwise, for exactly this)
        cfg = g_r * f_r + g_g * f_g + g_b * f_b
        gtf = g_t * t_final

        def write_dma(c, slot):
            return pltpu.make_async_copy(
                gscratch.at[slot],
                grads_hbm.at[:, pl.ds(
                    pl.multiple_of(gbase + c * chunk, chunk), chunk)],
                osem.at[slot],
            )

        def chunk_math(f, off, carry):
            t_carry, cpg = carry
            gidx = off + sub_iota
            pair_ok = (gidx >= start) & (gidx < end)
            alpha, gv, mx, my = _chunk_alpha(f, ox, oy, px_x, px_y, pair_ok)
            la = jnp.log1p(-alpha)
            excl = (_incl_cumsum_roll(la) - la if scan_roll
                    else jnp.dot(ltri, la,
                                 preferred_element_type=jnp.float32))
            t_bef = t_carry * jnp.exp(excl)
            flag = (t_bef * (1.0 - alpha)) >= T_EPS
            aeff = jnp.where(flag, alpha, 0.0)
            w = aeff * t_bef

            gc = (f[:, 5:6] * g_r + f[:, 6:7] * g_g + f[:, 7:8] * g_b)
            wgc = w * gc
            upg = cpg + (_incl_cumsum_roll(wgc) if scan_roll
                         else jnp.dot(linc, wgc,
                                      preferred_element_type=jnp.float32))
            inv1m = 1.0 / (1.0 - aeff)
            dl_da = t_bef * gc - inv1m * ((cfg - upg) + gtf)
            dl_da = jnp.where(aeff > 0.0, dl_da, 0.0)

            dl_dg = f[:, 8:9] * dl_da
            dl_dop = jnp.sum(gv * dl_da, axis=1, keepdims=True)
            dl_dpow = dl_dg * gv
            ca, cb, cc = f[:, 2:3], f[:, 3:4], f[:, 4:5]
            dx = mx - px_x
            dy = my - px_y
            u = dl_dpow * dx
            v = dl_dpow * dy
            su = jnp.sum(u, axis=1, keepdims=True)
            sv = jnp.sum(v, axis=1, keepdims=True)
            d_mx = -(ca * su + cb * sv)
            d_my = -(cc * sv + cb * su)
            d_ca = -0.5 * jnp.sum(u * dx, axis=1, keepdims=True)
            d_cb = -jnp.sum(u * dy, axis=1, keepdims=True)
            d_cc = -0.5 * jnp.sum(v * dy, axis=1, keepdims=True)
            d_r = jnp.sum(g_r * w, axis=1, keepdims=True)
            d_g = jnp.sum(g_g * w, axis=1, keepdims=True)
            d_b = jnp.sum(g_b * w, axis=1, keepdims=True)

            zeros = jnp.zeros((chunk, 1), jnp.float32)
            gchunk = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_r, d_g, d_b, dl_dop,
                 zeros, zeros, zeros, zeros, zeros, zeros, zeros], axis=1
            )
            cpg = upg[chunk - 1:chunk, :]
            la_eff = jnp.where(flag, la, 0.0)
            t_carry = t_carry * jnp.exp(
                jnp.sum(la_eff, axis=0, keepdims=True))
            return (t_carry, cpg), jnp.transpose(gchunk, (1, 0))

        # peeled chunk 0 (prefetched at panel start). Empty segments
        # (nchunks == 0) still run the masked math but must NOT write.
        pre_dma(base, k).wait()

        @pl.when(nchunks > 1)
        def _():
            read_dma(base + chunk, 1).start()

        init = (
            jnp.ones((1, npx), jnp.float32),
            jnp.zeros((1, npx), jnp.float32),
        )
        carry0, g0 = chunk_math(jnp.transpose(pre[k], (1, 0)), base, init)

        @pl.when(nchunks > 0)
        def _():
            gscratch[0] = g0
            write_dma(0, 0).start()

        def body(loop):
            c, carry = loop
            slot = c % 2

            @pl.when(c + 1 < nchunks)
            def _():
                read_dma(base + (c + 1) * chunk, (c + 1) % 2).start()

            read_dma(base + c * chunk, slot).wait()

            @pl.when(c >= 2)
            def _():
                write_dma(c - 2, slot).wait()

            f = jnp.transpose(fscratch[slot], (1, 0))
            carry, gchunk = chunk_math(f, base + c * chunk, carry)
            gscratch[slot] = gchunk
            write_dma(c, slot).start()
            return c + 1, carry

        def cond(loop):
            c, carry = loop
            return jnp.logical_and(c < nchunks,
                                   jnp.max(carry[0]) >= T_EPS)

        c_done, _ = jax.lax.while_loop(cond, body, (jnp.int32(1), carry0))

        # drain reads/writes left in flight by early exit
        @pl.when(jnp.logical_and(c_done < nchunks, nchunks > 1))
        def _():
            read_dma(base + c_done * chunk, c_done % 2).wait()

        @pl.when(jnp.logical_and(c_done >= 1, nchunks > 0))
        def _():
            write_dma(c_done - 1, (c_done - 1) % 2).wait()

        @pl.when(c_done >= 2)
        def _():
            write_dma(c_done - 2, (c_done - 2) % 2).wait()

        # early exit leaves later chunks unwritten — flush zeros
        @pl.when(c_done < nchunks)
        def _():
            gscratch[0] = jnp.zeros((NFEAT, chunk), jnp.float32)

        def zero_body(c, _):
            dma = write_dma(c, 0)
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(c_done, nchunks, zero_body, 0)

    # last grid step zero-fills the reserved spare chunk
    @pl.when(jnp.logical_and(r == pl.num_programs(0) - 1,
                             s == pl.num_programs(1) - 1))
    def _():
        gscratch[0] = jnp.zeros((NFEAT, chunk), jnp.float32)
        dma = pltpu.make_async_copy(
            gscratch.at[0],
            grads_hbm.at[:, pl.ds(grad_cap - chunk, chunk)],
            osem.at[0],
        )
        dma.start()
        dma.wait()


@functools.partial(
    jax.jit, static_argnames=("tile", "chunk", "n_tiles_x", "n_tiles_y",
                              "pw", "interpret", "scan_roll")
)
def composite_fwd_panel(feats, offsets, *, tile, chunk, n_tiles_x,
                        n_tiles_y, pw, interpret=False, scan_roll=False):
    """Panel forward: returns (4, nty*tile, npanels_x*pw*tile) image-layout
    planes (rows 0-2 color without background, row 3 transmittance)."""
    npanels_x = -(-n_tiles_x // pw)
    hp = n_tiles_y * tile
    wp = npanels_x * pw * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles_y, npanels_x),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (4, tile, pw * tile), lambda r, s, offs: (0, r, s),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((pw, NFEAT, chunk), jnp.float32),
            pltpu.VMEM((2, NFEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((pw,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel_panel, tile=tile, chunk=chunk, n_tiles_x=n_tiles_x,
        pw=pw, scan_roll=scan_roll,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
        interpret=interpret,
    )(offsets, feats)


@functools.partial(
    jax.jit, static_argnames=("tile", "chunk", "n_tiles_x", "n_tiles_y",
                              "pw", "grad_cap", "interpret", "scan_roll")
)
def composite_bwd_panel(feats, offsets, grad_offsets, fwd_out, gout, *,
                        tile, chunk, n_tiles_x, n_tiles_y, pw, grad_cap,
                        interpret=False, scan_roll=False):
    """Panel backward. fwd_out/gout are (4, hp, wp) image-layout planes;
    returns per-pair gradients (NFEAT, grad_cap) exactly like
    composite_bwd."""
    npanels_x = -(-n_tiles_x // pw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles_y, npanels_x),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, tile, pw * tile),
                         lambda r, s, offs, goffs: (0, r, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile, pw * tile),
                         lambda r, s, offs, goffs: (0, r, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((pw, NFEAT, chunk), jnp.float32),
            pltpu.VMEM((2, NFEAT, chunk), jnp.float32),
            pltpu.VMEM((2, NFEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((pw,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel_panel, tile=tile, chunk=chunk, n_tiles_x=n_tiles_x,
        pw=pw, grad_cap=grad_cap, scan_roll=scan_roll,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NFEAT, grad_cap), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offsets, grad_offsets, feats, fwd_out, gout)


@functools.partial(
    jax.jit, static_argnames=("tile", "chunk", "n_tiles_x", "n_tiles_y",
                              "interpret", "scan_roll")
)
def composite_fwd(feats, offsets, *, tile, chunk, n_tiles_x, n_tiles_y,
                  interpret=False, scan_roll=False):
    """Run the forward kernel.

    feats: (NFEAT, PK + chunk) sorted-order pair features.
    offsets: (T+1,) int32 unaligned tile offsets into sorted order.
    Returns (T, 8, tile*tile): rows 0-2 accumulated color (no background),
    row 3 final transmittance.
    """
    n_tiles = n_tiles_x * n_tiles_y
    npx = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, npx), lambda t, offs: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NFEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, tile=tile, chunk=chunk, n_tiles_x=n_tiles_x,
        scan_roll=scan_roll,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, npx), jnp.float32),
        interpret=interpret,
    )(offsets, feats)


@functools.partial(
    jax.jit, static_argnames=("tile", "chunk", "n_tiles_x", "n_tiles_y",
                              "grad_cap", "interpret", "scan_roll")
)
def composite_bwd(feats, offsets, grad_offsets, fwd_out, gout, *, tile,
                  chunk, n_tiles_x, n_tiles_y, grad_cap, interpret=False,
                  scan_roll=False):
    """Run the backward kernel.

    Returns per-pair gradients (NFEAT, grad_cap) in the aligned
    grad-buffer layout (tiles.TileBinning.grad_offsets; slot tables
    main_slot/tail_slot index into it). Unwritten slots between regions
    are undefined, but the slot tables point only at written slots plus
    the spare slot grad_cap - 1, which the kernel zero-fills itself
    (the whole reserved chunk [grad_cap - chunk, grad_cap)).
    """
    n_tiles = n_tiles_x * n_tiles_y
    npx = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, npx), lambda t, offs, goffs: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, npx), lambda t, offs, goffs: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, NFEAT, chunk), jnp.float32),
            pltpu.VMEM((2, NFEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, tile=tile, chunk=chunk, n_tiles_x=n_tiles_x,
        grad_cap=grad_cap, scan_roll=scan_roll,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NFEAT, grad_cap), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offsets, grad_offsets, feats, fwd_out, gout)
