"""Cumulative-prefix device timing of the full rasterizer pipeline.

profile_raster_stages.py times each stage in isolation, which misses
XLA glue (transposes, pads, tile reshuffles, custom-vjp residual
materialization). Here each measurement jits a PREFIX of the real
pipeline; consecutive differences attribute the in-context cost of each
stage. Run with the TPU idle.
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

args = (means, scales, opac, shs)
prev = [0.0]


def t(name, fn):
    ms = device_time(fn, args, k1=1, k2=6, repeats=2) * 1e3
    print(f"{name}: {ms:.2f} ms  (+{ms - prev[0]:.2f})", flush=True)
    prev[0] = ms
    return ms


def pre(means, scales, opac, shs):
    return preprocess(means, scales, quats, opac, shs, cam, sh_degree=3)


def binned(*a):
    return bin_gaussians(
        pre(*a), tile=tile, n_tiles_x=ntx, n_tiles_y=nty,
        max_span=max_span, align=chunk, max_pairs=max_pairs)


def gathered(*a):
    g = pre(*a)
    b = binned(*a)
    return api._gather_feats(b, g.means2d, g.conics, g.colors,
                             g.opacities, chunk)[0], b


def fwd_kernel(*a):
    f, b = gathered(*a)
    return composite_fwd(f, b.tile_offsets, tile=tile, chunk=chunk,
                         n_tiles_x=ntx, n_tiles_y=nty)


def full_fwd(*a):
    out = api.rasterize(*a[:2], quats, a[2], a[3], cam, sh_degree=3,
                        bg=bg, backend="pallas", tile=tile, chunk=chunk,
                        max_span=max_span, max_pairs=max_pairs)
    return out["render"]


# ---- forward prefixes
print(f"== fwd prefixes (n={n}, {hw}x{hw}, chunk={chunk}) ==")
t("A preprocess", lambda *a: pre(*a).colors)
t("B +binning", lambda *a: binned(*a).main_slot)
t("C +gather_feats(+T,pad)", lambda *a: gathered(*a)[0])
t("D +fwd kernel", fwd_kernel)
t("E full fwd (epilogue)", full_fwd)

# ---- backward prefixes: share the fwd, add bwd stages
g2d_c = jax.jit(pre)(*args)
b_c = jax.jit(binned)(*args)
f_c = jax.jit(lambda *a: gathered(*a)[0])(*args)
fwd_c = jax.jit(fwd_kernel)(*args)
gout = jnp.ones((ntx * nty, 8, tile * tile), jnp.float32)
grad_cap = int(b_c.pair_slot_capacity)

prev[0] = 0.0
print("== bwd stages (isolated, real inputs) ==")
args2 = (f_c, b_c.tile_offsets, b_c.grad_offsets, fwd_c, gout)
ms_k = device_time(
    lambda f, o, go, fo, g: composite_bwd(
        f, o, go, fo, g, tile=tile, chunk=chunk, n_tiles_x=ntx,
        n_tiles_y=nty, grad_cap=grad_cap), args2, k1=1, k2=6,
    repeats=2) * 1e3
print(f"bwd kernel alone: {ms_k:.2f} ms", flush=True)

ms_kt = device_time(
    lambda f, o, go, fo, g: composite_bwd(
        f, o, go, fo, g, tile=tile, chunk=chunk, n_tiles_x=ntx,
        n_tiles_y=nty, grad_cap=grad_cap)[:9].T,
    args2, k1=1, k2=6, repeats=2) * 1e3
print(f"bwd kernel + transpose: {ms_kt:.2f} ms", flush=True)

ms_kg = device_time(
    lambda f, o, go, fo, g: composite_bwd(
        f, o, go, fo, g, tile=tile, chunk=chunk, n_tiles_x=ntx,
        n_tiles_y=nty, grad_cap=grad_cap
    )[:9].T[jnp.clip(b_c.main_slot, 0).reshape(-1)],
    args2, k1=1, k2=6, repeats=2) * 1e3
print(f"bwd kernel + transpose + main gather: {ms_kg:.2f} ms", flush=True)

# gout prologue (image -> tiles) + fwd epilogue (tiles -> image), XLA
from sings_tpu.ops.rasterizer.relayout import (
    retile_image_xla, untile_image_xla)

img4 = jnp.ones((4, hw, hw), jnp.float32)
ms_rt = device_time(
    lambda x: retile_image_xla(x, tile=tile, ntx=ntx, nty=nty),
    (img4,), k1=2, k2=20, repeats=2) * 1e3
print(f"gout prologue (retile, XLA): {ms_rt:.2f} ms", flush=True)
ms_ut = device_time(
    lambda x: untile_image_xla(x, tile=tile, ntx=ntx, nty=nty),
    (fwd_c,), k1=2, k2=20, repeats=2) * 1e3
print(f"fwd epilogue (untile, XLA): {ms_ut:.2f} ms", flush=True)

# ---- full fwd+bwd
prev[0] = 0.0
print("== end to end ==")


def loss(*a):
    return jnp.sum(full_fwd(*a) ** 2)


tot = device_time(jax.grad(loss, argnums=(0, 1, 2, 3)), args,
                  k1=1, k2=6, repeats=2) * 1e3
print(f"full fwd+bwd: {tot:.2f} ms => {hw*hw/tot/1e3:.1f} Mpix/s",
      flush=True)
