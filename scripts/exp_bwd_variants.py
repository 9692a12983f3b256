"""FROZEN against the pre-aligned-relayout kernels (commit 90a53bf and earlier):
uses grad_offsets and the head-masked DMA layout. Kept for the measurements cited
in docs/PERF.md; do not run against the current api.

Bisect backward-kernel math variants at bench shapes.

Variants of the per-chunk math (all numerically equivalent):
  v1: original — 3 per-channel inclusive cumsum matmuls, 9 cross-lane
      reductions for d_*, sublane reductions for cp/t updates.
  v3: cotangent-weighted single cumsum (gc via VPU rank-3), lane
      reductions for d_*.
  v4: v3 + moment-matmul reductions for d_* (gc via VPU).
  v2: v4 but gc via MXU (3-K matmul) + acc/t updates via matmul
      (= the library version as of this experiment).
Forward:
  f1: original (3 sublane reductions), f2: matmul acc (library).
"""
import functools

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sings_tpu.ops.graphics import make_camera
from sings_tpu.ops.rasterizer import api
from sings_tpu.ops.rasterizer.common import preprocess
from sings_tpu.ops.rasterizer.pallas_kernels import (
    NFEAT, T_EPS, _moment_basis, _pixel_coords_local, _segment,
    _tile_origin, _tri_incl, _tri_strict, composite_fwd)
from sings_tpu.ops.rasterizer.tiles import bin_gaussians
from sings_tpu.ops.sh import rgb2sh
from sings_tpu.ops.timing import device_time

ALPHA_MIN = 1.0 / 255.0
n, hw = 50_000, 512
tile, chunk, max_span, max_pairs = 16, 128, 3, 262144
ntx = nty = hw // tile
npx = tile * tile

rng = np.random.RandomState(0)
cam = make_camera(np.eye(4), height=hw, width=hw, fovx=0.9, fovy=0.9)
means = jnp.asarray(np.stack([
    rng.uniform(-0.8, 0.8, n), rng.uniform(-0.8, 0.8, n),
    rng.uniform(2.0, 6.0, n)], -1).astype(np.float32))
scales = jnp.asarray(rng.uniform(0.004, 0.02, (n, 3)).astype(np.float32))
quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
opac = jnp.asarray(rng.uniform(0.2, 1.0, n).astype(np.float32))
shs = jnp.zeros((n, 16, 3)).at[:, 0, :].set(
    rgb2sh(jnp.asarray(rng.rand(n, 3).astype(np.float32))))

g2d = jax.jit(lambda m, s, o, f: preprocess(
    m, s, quats, o, f, cam, sh_degree=3))(means, scales, opac, shs)
binning = jax.jit(lambda g: bin_gaussians(
    g, tile=tile, n_tiles_x=ntx, n_tiles_y=nty, max_span=max_span,
    align=chunk, max_pairs=max_pairs))(g2d)
feats, _ = jax.jit(lambda b, g: api._gather_feats(
    b, g.means2d, g.conics, g.colors, g.opacities, chunk))(binning, g2d)
fwd_out = jax.jit(lambda f, o: composite_fwd(
    f, o, tile=tile, chunk=chunk, n_tiles_x=ntx, n_tiles_y=nty))(
        feats, binning.tile_offsets)
gout = jnp.ones((ntx * nty, 8, npx), jnp.float32)
grad_cap = int(binning.pair_slot_capacity)


def bwd_kernel(offs_ref, goffs_ref, feats_hbm, fwd_ref, gout_ref, grads_hbm,
               fscratch, gscratch, sem, osem, *, variant):
    t = pl.program_id(0)
    start, end, base, nchunks = _segment(offs_ref, t, chunk)
    gbase = goffs_ref[t]
    px_x, px_y = _pixel_coords_local(tile)
    ox, oy = _tile_origin(t, tile, ntx)
    ltri = _tri_strict(chunk)
    linc = _tri_incl(chunk)
    basis = _moment_basis(tile)
    ones_row = jnp.ones((1, chunk), jnp.float32)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    cf = fwd_ref[0, 0:3, :]
    t_final = fwd_ref[0, 3:4, :]
    g_rgb = gout_ref[0, 0:3, :]
    g_t = gout_ref[0, 3:4, :]
    cfg = jnp.sum(g_rgb * cf, axis=0, keepdims=True)
    gtf = g_t * t_final
    g_t8 = jnp.concatenate(
        [jnp.transpose(g_rgb, (1, 0)), jnp.zeros((npx, 5), jnp.float32)],
        axis=1)

    def write_dma(c, slot):
        return pltpu.make_async_copy(
            gscratch.at[slot],
            grads_hbm.at[:, pl.ds(pl.multiple_of(gbase + c * chunk, chunk),
                                  chunk)], osem.at[slot])

    def read_dma(c, slot):
        off = pl.multiple_of(base + c * chunk, chunk)
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(off, chunk)], fscratch.at[slot],
            sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        read_dma(0, 0).start()

    weighted = variant in ("v2", "v3", "v4")

    def body(carry):
        c, t_carry, cp = carry
        slot = c % 2

        @pl.when(c + 1 < nchunks)
        def _():
            read_dma(c + 1, (c + 1) % 2).start()

        read_dma(c, slot).wait()

        @pl.when(c >= 2)
        def _():
            write_dma(c - 2, slot).wait()

        f = jnp.transpose(fscratch[slot], (1, 0))
        gidx = (base + c * chunk) + sub_iota
        pair_ok = (gidx >= start) & (gidx < end)
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
        la = jnp.log1p(-alpha)
        excl = jnp.dot(ltri, la, preferred_element_type=jnp.float32)
        t_bef = t_carry * jnp.exp(excl)
        flag = (t_bef * (1.0 - alpha)) >= T_EPS
        aeff = jnp.where(flag, alpha, 0.0)
        w = aeff * t_bef
        inv1m = 1.0 / (1.0 - aeff)

        if weighted:
            if variant == "v2":
                gc = jnp.dot(f[:, 5:8], g_rgb,
                             preferred_element_type=jnp.float32)
            else:
                gc = (f[:, 5:6] * g_rgb[0:1] + f[:, 6:7] * g_rgb[1:2]
                      + f[:, 7:8] * g_rgb[2:3])
            wgc = w * gc
            upg = cp + jnp.dot(linc, wgc,
                               preferred_element_type=jnp.float32)
            dl_da = t_bef * gc - inv1m * ((cfg - upg) + gtf)
            cp_new = upg[chunk - 1:chunk, :]
        else:
            wr = w * f[:, 5:6]
            wg = w * f[:, 6:7]
            wb = w * f[:, 7:8]
            cp_r, cp_g, cp_b = cp[0:1], cp[1:2], cp[2:3]
            up_r = cp_r + jnp.dot(linc, wr,
                                  preferred_element_type=jnp.float32)
            up_g = cp_g + jnp.dot(linc, wg,
                                  preferred_element_type=jnp.float32)
            up_b = cp_b + jnp.dot(linc, wb,
                                  preferred_element_type=jnp.float32)
            dl_da = (
                g_rgb[0:1] * (f[:, 5:6] * t_bef - (cf[0:1] - up_r) * inv1m)
                + g_rgb[1:2] * (f[:, 6:7] * t_bef - (cf[1:2] - up_g) * inv1m)
                + g_rgb[2:3] * (f[:, 7:8] * t_bef - (cf[2:3] - up_b) * inv1m)
                - gtf * inv1m)
            cp_new = jnp.concatenate([
                cp_r + jnp.sum(wr, axis=0, keepdims=True),
                cp_g + jnp.sum(wg, axis=0, keepdims=True),
                cp_b + jnp.sum(wb, axis=0, keepdims=True)], axis=0)
        dl_da = jnp.where(aeff > 0.0, dl_da, 0.0)

        if variant in ("v2", "v4"):
            dl_dpow = op * dl_da * gv
            md = jnp.dot(dl_dpow, basis, preferred_element_type=jnp.float32)
            mw = jnp.dot(w, g_t8, preferred_element_type=jnp.float32)
            m00, m10, m01 = md[:, 0:1], md[:, 1:2], md[:, 2:3]
            m20, m11, m02 = md[:, 3:4], md[:, 4:5], md[:, 5:6]
            ex = mx * m00 - m10
            ey = my * m00 - m01
            d_mx = -(ca * ex + cb * ey)
            d_my = -(cc * ey + cb * ex)
            d_ca = -0.5 * (mx * mx * m00 - 2.0 * mx * m10 + m20)
            d_cb = -(mx * my * m00 - mx * m01 - my * m10 + m11)
            d_cc = -0.5 * (my * my * m00 - 2.0 * my * m01 + m02)
            dl_dop = m00 / jnp.maximum(op, 1e-6)
            d_r, d_g, d_b = mw[:, 0:1], mw[:, 1:2], mw[:, 2:3]
        else:
            dl_dg = op * dl_da
            dl_dop = jnp.sum(gv * dl_da, axis=1, keepdims=True)
            dl_dpow = dl_dg * gv
            d_mx = jnp.sum(dl_dpow * -(ca * dx + cb * dy), axis=1,
                           keepdims=True)
            d_my = jnp.sum(dl_dpow * -(cc * dy + cb * dx), axis=1,
                           keepdims=True)
            d_ca = jnp.sum(dl_dpow * (-0.5 * dx * dx), axis=1,
                           keepdims=True)
            d_cb = jnp.sum(dl_dpow * (-dx * dy), axis=1, keepdims=True)
            d_cc = jnp.sum(dl_dpow * (-0.5 * dy * dy), axis=1,
                           keepdims=True)
            d_r = jnp.sum(g_rgb[0:1] * w, axis=1, keepdims=True)
            d_g = jnp.sum(g_rgb[1:2] * w, axis=1, keepdims=True)
            d_b = jnp.sum(g_rgb[2:3] * w, axis=1, keepdims=True)

        zeros = jnp.zeros((chunk, 1), jnp.float32)
        gchunk = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_r, d_g, d_b, dl_dop,
             zeros, zeros, zeros, zeros, zeros, zeros, zeros], axis=1)
        gscratch[slot] = jnp.transpose(gchunk, (1, 0))
        write_dma(c, slot).start()

        la_eff = jnp.where(flag, la, 0.0)
        t_carry = t_carry * jnp.exp(
            jnp.sum(la_eff, axis=0, keepdims=True))
        return c + 1, t_carry, cp_new

    def cond(carry):
        c, t_carry, _ = carry
        return jnp.logical_and(c < nchunks, jnp.max(t_carry) >= T_EPS)

    ncp = 1 if weighted else 3
    init = (jnp.int32(0), jnp.ones((1, npx), jnp.float32),
            jnp.zeros((ncp, npx), jnp.float32))
    c_done, *_ = jax.lax.while_loop(cond, body, init)

    @pl.when(c_done < nchunks)
    def _():
        read_dma(c_done, c_done % 2).wait()

    @pl.when(c_done >= 1)
    def _():
        write_dma(c_done - 1, (c_done - 1) % 2).wait()

    @pl.when(c_done >= 2)
    def _():
        write_dma(c_done - 2, (c_done - 2) % 2).wait()

    gscratch[0] = jnp.zeros((NFEAT, chunk), jnp.float32)

    def zero_body(c, _):
        dma = write_dma(c, 0)
        dma.start()
        dma.wait()
        return 0

    jax.lax.fori_loop(c_done, nchunks, zero_body, 0)


def run_bwd(variant):
    n_tiles = ntx * nty
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
    f = pl.pallas_call(
        functools.partial(bwd_kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NFEAT, grad_cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    args = (binning.tile_offsets, binning.grad_offsets, feats, fwd_out, gout)
    ref = None
    out = jax.jit(lambda *a: f(*a))(*args)
    ms = device_time(lambda *a: f(*a), args, k1=1, k2=6, repeats=2) * 1e3
    print(f"bwd {variant}: {ms:.2f} ms", flush=True)
    return out


outs = {v: run_bwd(v) for v in ["v1", "v3", "v4", "v2"]}
# cross-check numerics (only written slots are defined; compare via the
# pair_slot gather with the spare zeroed)
ps = binning.main_slot  # NOTE: post-refactor: prefix table only


def reduce(o):
    return np.asarray(jax.jit(
        lambda o: o.at[:, -1].set(0.0)[:9].T[ps].reshape(n, -1, 9).sum(1))(o))


r1 = reduce(outs["v1"])
for v in ["v3", "v4", "v2"]:
    rv = reduce(outs[v])
    err = np.max(np.abs(rv - r1)) / (np.max(np.abs(r1)) + 1e-12)
    print(f"{v} vs v1 max rel err: {err:.2e}", flush=True)
