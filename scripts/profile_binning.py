"""Substage device timing of bin_gaussians + tile->image epilogue
variants, at bench config (50k gaussians, 512^2, max_span=3)."""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.graphics import make_camera
from sings_tpu.ops.rasterizer.common import preprocess, tile_rect
from sings_tpu.ops.rasterizer.tiles import INVALID, bin_gaussians
from sings_tpu.ops.sh import rgb2sh
from sings_tpu.ops.timing import device_time

n, hw = 50_000, 512
tile, chunk, max_span, max_pairs = 16, 128, 3, 262144
ntx = nty = hw // tile
n_tiles = ntx * nty
cap = max_span * max_span
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

g = jax.jit(lambda m, s, o, f: preprocess(
    m, s, quats, o, f, cam, sh_degree=3))(means, scales, opac, shs)
prev = [0.0]


def t(name, fn, *args):
    ms = device_time(fn, args, k1=1, k2=6, repeats=2) * 1e3
    print(f"{name}: {ms:.2f} ms (+{ms - prev[0]:.2f})", flush=True)
    prev[0] = ms
    return ms


def stage_a(g):
    depth_key = jnp.where(g.mask, g.depths, jnp.inf)
    order = jnp.argsort(depth_key)
    rank = jnp.argsort(order).astype(jnp.int32)
    return order, rank


def stage_b(g):
    order, rank = stage_a(g)
    x0, y0, x1, y1 = tile_rect(g, tile, ntx, nty)
    w, h = x1 - x0, y1 - y0
    cx = jnp.clip((g.means2d[:, 0] // tile).astype(jnp.int32), 0, ntx - 1)
    cy = jnp.clip((g.means2d[:, 1] // tile).astype(jnp.int32), 0, nty - 1)
    x0c = jnp.where(w > max_span,
                    jnp.clip(cx - max_span // 2, x0, x1 - max_span), x0)
    y0c = jnp.where(h > max_span,
                    jnp.clip(cy - max_span // 2, y0, y1 - max_span), y0)
    wc, hc = jnp.minimum(w, max_span), jnp.minimum(h, max_span)
    j = jnp.arange(cap, dtype=jnp.int32)
    wcs = jnp.maximum(wc, 1)[:, None]
    dx, dy = j[None, :] % wcs, j[None, :] // wcs
    span = jnp.where(g.mask & (w > 0) & (h > 0), wc * hc, 0)
    valid = j[None, :] < span[:, None]
    tile_id = (y0c[:, None] + dy) * ntx + (x0c[:, None] + dx)
    key = jnp.where(valid, tile_id * n + rank[:, None], INVALID).reshape(-1)
    return key, span


def stage_c(g):
    key, span = stage_b(g)
    p = n * cap
    flat_id = jnp.arange(p, dtype=jnp.int32)
    return jax.lax.sort_key_val(key, flat_id)


def stage_c_keyonly(g):
    key, span = stage_b(g)
    return jax.lax.sort(key)


def stage_f_full(g):
    return bin_gaussians(g, tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
                         max_span=max_span, align=chunk,
                         max_pairs=max_pairs)


print("== binning substages ==")
t("A depth argsort+rank", lambda g: stage_a(g)[1], g)
t("B +rect+key build", lambda g: stage_b(g)[0], g)
t("C +pair sort (key,val)", lambda g: stage_c(g)[1], g)
prev[0] = 0.0
t("C' key-only pair sort", stage_c_keyonly, g)
prev[0] = 0.0
t("F full bin_gaussians", lambda g: stage_f_full(g)[:6], g)

# ---- epilogue variants: (T, 8, npx) tiled -> (3, H, W)
npx = tile * tile
out_t = jnp.asarray(rng.rand(n_tiles, 8, npx).astype(np.float32))


def epi_v0(o):
    color = o[:, :3, :].reshape(nty, ntx, 3, tile, tile)
    color = color.transpose(2, 0, 3, 1, 4).reshape(3, nty * tile, ntx * tile)
    tf = o[:, 3, :].reshape(nty, ntx, tile, tile)
    tf = tf.transpose(0, 2, 1, 3).reshape(nty * tile, ntx * tile)
    return color, tf


def epi_v1(o):
    # move 4 channels at once, one transpose
    x = o[:, :4, :].reshape(nty, ntx, 4, tile, tile)
    x = x.transpose(2, 0, 3, 1, 4).reshape(4, nty * tile, ntx * tile)
    return x[:3], x[3]


print("== epilogue variants ==")
prev[0] = 0.0
t("epi v0 (color+t separate)", epi_v0, out_t)
prev[0] = 0.0
t("epi v1 (4ch once)", epi_v1, out_t)

# gout assembly (bwd input): (3,H,W)+(H,W) -> (T, 8, npx)
gc = jnp.asarray(rng.rand(3, hw, hw).astype(np.float32))
gt = jnp.asarray(rng.rand(hw, hw).astype(np.float32))


def gout_v0(gc, gt):
    gc_tiles = gc.reshape(3, nty, tile, ntx, tile).transpose(
        1, 3, 0, 2, 4).reshape(nty * ntx, 3, npx)
    gt_tiles = gt.reshape(nty, tile, ntx, tile).transpose(
        0, 2, 1, 3).reshape(nty * ntx, 1, npx)
    return jnp.concatenate(
        [gc_tiles, gt_tiles, jnp.zeros((nty * ntx, 4, npx), gc.dtype)],
        axis=1)


prev[0] = 0.0
t("gout v0", gout_v0, gc, gt)
