"""FROZEN against the pre-aligned-relayout kernels (commit 90a53bf and earlier):
uses grad_offsets and the head-masked DMA layout. Kept for the measurements cited
in docs/PERF.md; do not run against the current api.

Pin down unaccounted backward-path cost at bench config.

Times incrementally larger slices of _composite_bwd's epilogue:
  1. bwd kernel alone (raw output)
  2. + spare-slot zero + [:9].T relayout
  3. + pair_slot gather + reshape-sum (full glue)
  4. gout assembly (image -> tile cotangent relayout) alone
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.graphics import make_camera
from sings_tpu.ops.rasterizer import api
from sings_tpu.ops.rasterizer.common import preprocess
from sings_tpu.ops.rasterizer.pallas_kernels import (
    composite_bwd, composite_fwd)
from sings_tpu.ops.rasterizer.tiles import bin_gaussians
from sings_tpu.ops.sh import rgb2sh
from sings_tpu.ops.timing import device_time

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
offsets, grad_offsets = binning.tile_offsets, binning.grad_offsets
main_slot, tail_slot = binning.main_slot, binning.tail_slot
tail_of_gauss = binning.tail_of_gauss
g_color = jnp.ones((3, hw, hw), jnp.float32)
g_t = jnp.ones((hw, hw), jnp.float32)


def t(name, fn, *args):
    ms = device_time(fn, args, k1=1, k2=6, repeats=2) * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)


def kern(f):
    return composite_bwd(f, offsets, grad_offsets, fwd_out, gout,
                         tile=tile, chunk=chunk, n_tiles_x=ntx,
                         n_tiles_y=nty, grad_cap=grad_cap)


def glue_main_tail(f):
    pg = kern(f).at[:, -1].set(0.0)[:9].T
    mw = main_slot.shape[1]
    out = pg[main_slot.reshape(-1)].reshape(n, mw, 9).sum(1)
    tc_, tw = tail_slot.shape
    if tw > 0:
        pgt = pg[tail_slot.reshape(-1)].reshape(tc_, tw, 9).sum(1)
        tail_sums = jnp.concatenate([pgt, jnp.zeros((1, 9), pgt.dtype)], 0)
        out = out + tail_sums[tail_of_gauss]
    return out


t("1. bwd kernel raw", kern, feats)
t("2. + zero spare + [:9].T",
  lambda f: kern(f).at[:, -1].set(0.0)[:9].T, feats)
t("3. + prefix/tail gather glue", glue_main_tail, feats)
print("   main", main_slot.shape, "tail", tail_slot.shape)


def gout_assembly(g_color, g_t):
    gc_tiles = g_color.reshape(3, nty, tile, ntx, tile).transpose(
        1, 3, 0, 2, 4).reshape(nty * ntx, 3, npx)
    gt_tiles = g_t.reshape(nty, tile, ntx, tile).transpose(
        0, 2, 1, 3).reshape(nty * ntx, 1, npx)
    return jnp.concatenate(
        [gc_tiles, gt_tiles,
         jnp.zeros((nty * ntx, 4, npx), g_color.dtype)], axis=1)


t("4. gout assembly", gout_assembly, g_color, g_t)
t("5. fwd image relayout",
  lambda o: o[:, :3, :].reshape(nty, ntx, 3, tile, tile).transpose(
      2, 0, 3, 1, 4).reshape(3, nty * tile, ntx * tile), fwd_out)


def glue_dense_oldstyle(f):
    # old dense (n, cap) table emulated: main_width = cap, no tail
    pg = kern(f).at[:, -1].set(0.0)[:9].T
    mw = dense_slot.shape[1]
    return pg[dense_slot.reshape(-1)].reshape(n, mw, 9).sum(1)


from sings_tpu.ops.rasterizer.tiles import bin_gaussians as _bg
dense = jax.jit(lambda g: _bg(
    g, tile=tile, n_tiles_x=ntx, n_tiles_y=nty, max_span=max_span,
    align=chunk, max_pairs=max_pairs, main_width=max_span * max_span))(g2d)
dense_slot = dense.main_slot
t("6. dense (n, cap) glue [old]", glue_dense_oldstyle, feats)
