"""Stage-by-stage device timing of the rasterizer at bench config.

Accounts the full fwd+bwd time (bench.py: 50k gaussians, 512x512,
max_span=3, max_pairs=262144) into: preprocess fwd / fwd+bwd, binning,
pair-feature gather, composite fwd kernel, composite bwd kernel, and
backward glue (pair-grad un-sort gather). Run with the TPU idle.
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
    NFEAT, composite_bwd, composite_fwd)
from sings_tpu.ops.rasterizer.tiles import bin_gaussians
from sings_tpu.ops.sh import rgb2sh
from sings_tpu.ops.timing import device_time

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
bg = jnp.zeros(3)


def t(name, fn, *args):
    ms = device_time(fn, args, k1=1, k2=6, repeats=2) * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)
    return ms


# --- stage inputs (computed once, jitted) ---
def pre(means, scales, opac, shs):
    return preprocess(means, scales, quats, opac, shs, cam, sh_degree=3)


g2d = jax.jit(pre)(means, scales, opac, shs)
binning = jax.jit(lambda g: bin_gaussians(
    g, tile=tile, n_tiles_x=ntx, n_tiles_y=nty, max_span=max_span,
    align=chunk, max_pairs=max_pairs))(g2d)
feats, valid = jax.jit(lambda b, g: api._gather_feats(
    b, g.means2d, g.conics, g.colors, g.opacities, chunk))(binning, g2d)
fwd_out = jax.jit(lambda f, o: composite_fwd(
    f, o, tile=tile, chunk=chunk, n_tiles_x=ntx, n_tiles_y=nty))(
        feats, binning.tile_offsets)
gout = jnp.ones((ntx * nty, 8, tile * tile), jnp.float32)
grad_cap = int(binning.pair_slot_capacity)

# --- timings ---
t("preprocess fwd", lambda *a: pre(*a).colors, means, scales, opac, shs)


def pre_loss(means, scales, opac, shs):
    g = pre(means, scales, opac, shs)
    return (jnp.sum(g.means2d) + jnp.sum(g.conics) + jnp.sum(g.colors)
            + jnp.sum(g.opacities) + jnp.sum(g.depths))


t("preprocess fwd+bwd", jax.grad(pre_loss, argnums=(0, 1, 2, 3)),
  means, scales, opac, shs)

t("binning", lambda g: bin_gaussians(
    g, tile=tile, n_tiles_x=ntx, n_tiles_y=nty, max_span=max_span,
    align=chunk, max_pairs=max_pairs).main_slot, g2d)

t("feats gather", lambda b, g: api._gather_feats(
    b, g.means2d, g.conics, g.colors, g.opacities, chunk)[0],
  binning, g2d)

t("composite fwd kernel", lambda f, o: composite_fwd(
    f, o, tile=tile, chunk=chunk, n_tiles_x=ntx, n_tiles_y=nty),
  feats, binning.tile_offsets)

t("composite bwd kernel", lambda f, o, go, fo, g: composite_bwd(
    f, o, go, fo, g, tile=tile, chunk=chunk, n_tiles_x=ntx, n_tiles_y=nty,
    grad_cap=grad_cap),
  feats, binning.tile_offsets, binning.grad_offsets, fwd_out, gout)

pair_grads = jnp.asarray(rng.randn(grad_cap, 9).astype(np.float32))


def glue(pg, main_slot, tail_slot, tail_of_gauss):
    mw = main_slot.shape[1]
    out = pg[main_slot.reshape(-1)].reshape(n, mw, 9).sum(axis=1)
    tc, tw = tail_slot.shape
    if tw > 0:
        pgt = pg[tail_slot.reshape(-1)].reshape(tc, tw, 9)
        tail_sums = jnp.concatenate(
            [pgt.sum(axis=1), jnp.zeros((1, 9), pgt.dtype)], axis=0)
        out = out + tail_sums[tail_of_gauss]
    return out


t("bwd glue (main + tail gather-merge)", glue, pair_grads,
  binning.main_slot, binning.tail_slot, binning.tail_of_gauss)


# --- end to end ---
def loss(means, scales, opac, shs):
    out = api.rasterize(means, scales, quats, opac, shs, cam, sh_degree=3,
                        bg=bg, backend="pallas", tile=tile, chunk=chunk,
                        max_span=max_span, max_pairs=max_pairs)
    return jnp.sum(out["render"] ** 2)


t("full fwd", loss, means, scales, opac, shs)
tb = t("full fwd+bwd", jax.grad(loss, argnums=(0, 1, 2, 3)),
       means, scales, opac, shs)
print(f"=> {hw * hw / tb * 1e3 / 1e6:.1f} Mpix/s", flush=True)
