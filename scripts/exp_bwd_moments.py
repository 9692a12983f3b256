"""A/B the backward kernel's per-chunk reduction strategy on hardware.

Variant A (production): 9 cross-lane reductions + per-pixel u/v
elementwise products.
Variant B (moments): ONE (chunk, npx) @ (npx, 8) MXU matmul against a
constant pixel-polynomial basis [1, px, py, px^2, px*py, py^2, 0, 0]
plus ONE (chunk, npx) @ (npx, 8) against [g_r, g_g, g_b, ...]; the five
quadratic reductions become per-pair (chunk, 1) polynomial combinations
of the moments, and dl_dop = M00 / opacity. Round-1 tried per-quantity
matmuls (8 of them) and measured SLOWER; this packs everything into 2.

Correctness is checked against the production composite_bwd on the
bench scene before timing.
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
from sings_tpu.ops.rasterizer import pallas_kernels as pk
from sings_tpu.ops.rasterizer.api import _gather_feats
from sings_tpu.ops.rasterizer.common import preprocess
from sings_tpu.ops.rasterizer.pallas_kernels import (
    NFEAT, T_EPS, _chunk_alpha, _pixel_coords_local, _segment,
    _tile_origin, _tri_incl, _tri_strict, composite_bwd, composite_fwd)
from sings_tpu.ops.rasterizer.tiles import bin_gaussians
from sings_tpu.ops.sh import rgb2sh
from sings_tpu.ops.timing import device_time


def _bwd_kernel_moments(offs_ref, goffs_ref, feats_hbm, fwd_ref, gout_ref,
                        grads_hbm, fscratch, gscratch, sem, osem,
                        *, tile, chunk, n_tiles_x):
    t = pl.program_id(0)
    npx = tile * tile
    start, end, base, nchunks = _segment(offs_ref, t, chunk)
    gbase = goffs_ref[t]

    px_x, px_y = _pixel_coords_local(tile)
    ox, oy = _tile_origin(t, tile, n_tiles_x)
    ltri = _tri_strict(chunk)
    linc = _tri_incl(chunk)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    t_final = fwd_ref[0, 3:4, :]
    g_rgb = gout_ref[0, 0:3, :]
    g_t = gout_ref[0, 3:4, :]
    cfg = jnp.sum(g_rgb * fwd_ref[0, 0:3, :], axis=0, keepdims=True)
    gtf = g_t * t_final

    # constant pixel bases (npx, 8): polynomial + color-cotangent
    ones = jnp.ones((1, npx), jnp.float32)
    zeros_r = jnp.zeros((1, npx), jnp.float32)
    poly = jnp.concatenate(
        [ones, px_x, px_y, px_x * px_x, px_x * px_y, px_y * px_y,
         zeros_r, zeros_r], axis=0).T  # (npx, 8)
    gbasis = jnp.concatenate(
        [g_rgb, jnp.zeros((5, npx), jnp.float32)], axis=0).T  # (npx, 8)

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

        @pl.when(c >= 2)
        def _():
            write_dma(c - 2, slot).wait()

        off = pl.multiple_of(base + c * chunk, chunk)
        f = jnp.transpose(fscratch[slot], (1, 0))
        gidx = off + sub_iota
        pair_ok = (gidx >= start) & (gidx < end)
        alpha, gv, mx, my = _chunk_alpha(f, ox, oy, px_x, px_y, pair_ok)
        la = jnp.log1p(-alpha)
        excl = jnp.dot(ltri, la, preferred_element_type=jnp.float32)
        t_bef = t_carry * jnp.exp(excl)
        flag = (t_bef * (1.0 - alpha)) >= T_EPS
        aeff = jnp.where(flag, alpha, 0.0)
        w = aeff * t_bef

        gc = (f[:, 5:6] * g_rgb[0:1] + f[:, 6:7] * g_rgb[1:2]
              + f[:, 7:8] * g_rgb[2:3])
        wgc = w * gc
        upg = cpg + jnp.dot(linc, wgc, preferred_element_type=jnp.float32)
        inv1m = 1.0 / (1.0 - aeff)
        dl_da = t_bef * gc - inv1m * ((cfg - upg) + gtf)
        dl_da = jnp.where(aeff > 0.0, dl_da, 0.0)

        dl_dg = f[:, 8:9] * dl_da
        dl_dpow = dl_dg * gv
        ca, cb, cc = f[:, 2:3], f[:, 3:4], f[:, 4:5]

        # moments via MXU: M = dl_dpow @ poly (chunk, 8)
        m = jnp.dot(dl_dpow, poly, preferred_element_type=jnp.float32)
        m00 = m[:, 0:1]
        mx_ = m[:, 1:2]
        my_ = m[:, 2:3]
        mxx = m[:, 3:4]
        mxy = m[:, 4:5]
        myy = m[:, 5:6]
        # sums over dx = mx - px etc. as polynomial combinations
        su = mx * m00 - mx_
        sv = my * m00 - my_
        sudx = mx * mx * m00 - 2.0 * mx * mx_ + mxx
        sudy = mx * my * m00 - mx * my_ - my * mx_ + mxy
        svdy = my * my * m00 - 2.0 * my * my_ + myy

        d_mx = -(ca * su + cb * sv)
        d_my = -(cc * sv + cb * su)
        d_ca = -0.5 * sudx
        d_cb = -sudy
        d_cc = -0.5 * svdy
        # dl_dop = sum(gv * dl_da) = M00 / op (dl_dpow = op*dl_da*gv)
        op = f[:, 8:9]
        dl_dop = jnp.where(op > 1e-12, m00 / jnp.maximum(op, 1e-12), 0.0)
        # color grads via the second matmul: sum(w * g_k)
        mc = jnp.dot(w, gbasis, preferred_element_type=jnp.float32)
        d_r, d_g, d_b = mc[:, 0:1], mc[:, 1:2], mc[:, 2:3]

        zeros = jnp.zeros((chunk, 1), jnp.float32)
        gchunk = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_r, d_g, d_b, dl_dop,
             zeros, zeros, zeros, zeros, zeros, zeros, zeros], axis=1)
        gscratch[slot] = jnp.transpose(gchunk, (1, 0))
        write_dma(c, slot).start()

        cpg = upg[chunk - 1:chunk, :]
        la_eff = jnp.where(flag, la, 0.0)
        t_carry = t_carry * jnp.exp(jnp.sum(la_eff, axis=0, keepdims=True))
        return c + 1, t_carry, cpg

    def cond(carry):
        c, t_carry, _ = carry
        return jnp.logical_and(c < nchunks, jnp.max(t_carry) >= T_EPS)

    init = (jnp.int32(0), jnp.ones((1, npx), jnp.float32),
            jnp.zeros((1, npx), jnp.float32))
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


@functools.partial(
    jax.jit, static_argnames=("tile", "chunk", "n_tiles_x", "n_tiles_y",
                              "grad_cap"))
def composite_bwd_moments(feats, offsets, grad_offsets, fwd_out, gout, *,
                          tile, chunk, n_tiles_x, n_tiles_y, grad_cap):
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
        _bwd_kernel_moments, tile=tile, chunk=chunk, n_tiles_x=n_tiles_x)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NFEAT, grad_cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offsets, grad_offsets, feats, fwd_out, gout)


def main():
    n, hw = 50_000, 512
    tile, chunk, max_span, max_pairs = 16, 128, 3, 262144
    ntx = nty = hw // tile
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

    g = jax.jit(lambda: preprocess(means, scales, quats, opac, shs, cam,
                                   sh_degree=3))()
    b = jax.jit(lambda: bin_gaussians(
        g, tile=tile, n_tiles_x=ntx, n_tiles_y=nty, max_span=max_span,
        align=chunk, max_pairs=max_pairs))()
    feats, _ = jax.jit(lambda: _gather_feats(
        b, g.means2d, g.conics, g.colors, g.opacities, chunk))()
    fwd = jax.jit(lambda: composite_fwd(
        feats, b.tile_offsets, tile=tile, chunk=chunk, n_tiles_x=ntx,
        n_tiles_y=nty))()
    gout = jnp.asarray(rng.rand(ntx * nty, 8, tile * tile
                                ).astype(np.float32) * 0.1)
    gout = gout.at[:, 4:, :].set(0.0)
    grad_cap = int(b.pair_slot_capacity)

    kw = dict(tile=tile, chunk=chunk, n_tiles_x=ntx, n_tiles_y=nty,
              grad_cap=grad_cap)
    args = (feats, b.tile_offsets, b.grad_offsets, fwd, gout)
    ref = np.asarray(jax.jit(
        lambda *a: composite_bwd(*a, **kw))(*args))
    got = np.asarray(jax.jit(
        lambda *a: composite_bwd_moments(*a, **kw))(*args))
    # compare only written slots (both kernels leave spare undefined):
    # use the main/tail tables
    slots = np.unique(np.concatenate(
        [np.asarray(b.main_slot).ravel(), np.asarray(b.tail_slot).ravel()]))
    slots = slots[slots < grad_cap - 1]
    r, gg = ref[:9, slots], got[:9, slots]
    scale = np.abs(r).max()
    print("max abs diff:", np.abs(r - gg).max(), "scale:", scale)
    assert np.abs(r - gg).max() < 2e-4 * max(scale, 1.0), "MISMATCH"

    ta = device_time(lambda *a: composite_bwd(*a, **kw), args,
                     k1=2, k2=10) * 1e3
    tb = device_time(lambda *a: composite_bwd_moments(*a, **kw), args,
                     k1=2, k2=10) * 1e3
    print(f"production bwd kernel: {ta:.2f} ms")
    print(f"moment-matmul bwd kernel: {tb:.2f} ms")


if __name__ == "__main__":
    main()
