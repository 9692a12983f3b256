"""Pallas relayout kernels between tile-major kernel buffers and images.

The composite kernels exchange per-tile blocks (T, 8, npx) with XLA
(pallas_kernels.py); the losses consume images (C, H, W). The XLA
transposes for that relayout are hostile patterns (5D transpose whose
lane dim is the 16-px tile width) and measured ~0.9 ms EACH way at the
bench scene — comparable to the composite kernels themselves. These
kernels do the relayout as one VMEM-local transpose per tile-row with
full-width (ntx*tile) lane writes.

untile_image:  (T, 8, npx)  -> (8, nty*tile, ntx*tile)
retile_image:  (C<=8, nty*tile, ntx*tile) -> (T, 8, npx), rows C..7 zero

Replaces the reference CUDA rasterizer's implicit layout (it writes
images directly because CUDA threads scatter to arbitrary addresses;
TPU vector stores cannot, so the tile-major buffer + relayout pass is
the TPU-shaped equivalent).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


# Mosaic cannot reshape across the lane dim ((1, npx) <-> (tile, tile)
# is an "unsupported shape cast"), so both kernels route every
# lane<->sublane move through the 2D transpose unit plus sublane-only
# reshapes, with static loops for the per-tile lane-offset stores /
# lane concatenation.
def _untile_kernel(in_ref, out_ref, *, tile, ntx):
    for c in range(8):
        a = in_ref[:, c, :]                      # (ntx, npx)
        a = jnp.transpose(a, (1, 0))             # (npx, ntx)
        a = a.reshape(tile, tile, ntx)           # (r, x, tx)
        a = jnp.transpose(a, (0, 2, 1))          # (r, tx, x)
        for tx in range(ntx):
            out_ref[c, :, tx * tile:(tx + 1) * tile] = a[:, tx, :]


def _retile_kernel(in_ref, out_ref, *, tile, ntx, c_in):
    npx = tile * tile
    for c in range(8):
        if c >= c_in:
            out_ref[:, c, :] = jnp.zeros((ntx, npx), out_ref.dtype)
            continue
        x = in_ref[c]                            # (tile, ntx*tile)
        x = jnp.transpose(x, (1, 0))             # (W, tile) [(tx,x), r]
        x = x.reshape(ntx, tile, tile)           # (tx, x, r)
        x = jnp.transpose(x, (0, 2, 1))          # (tx, r, x)
        # merge (r, x) -> npx lanes via static lane concat (a plain
        # reshape would be a sublane->lane merge, unsupported)
        v = jnp.concatenate([x[:, r, :] for r in range(tile)], axis=1)
        out_ref[:, c, :] = v


@functools.partial(jax.jit,
                   static_argnames=("tile", "ntx", "nty", "interpret"))
def untile_image(tiled, *, tile, ntx, nty, interpret=False):
    """(nty*ntx, 8, tile*tile) tile-major -> (8, nty*tile, ntx*tile)."""
    npx = tile * tile
    return pl.pallas_call(
        functools.partial(_untile_kernel, tile=tile, ntx=ntx),
        grid=(nty,),
        in_specs=[pl.BlockSpec((ntx, 8, npx), lambda ty: (ty, 0, 0))],
        out_specs=pl.BlockSpec((8, tile, ntx * tile), lambda ty: (0, ty, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (8, nty * tile, ntx * tile), tiled.dtype),
        interpret=interpret,
    )(tiled)


@functools.partial(jax.jit,
                   static_argnames=("tile", "ntx", "nty", "interpret"))
def retile_image(image, *, tile, ntx, nty, interpret=False):
    """(C<=8, nty*tile, ntx*tile) -> (nty*ntx, 8, tile*tile); the 8-C
    trailing channel rows of the output are zero-filled."""
    c_in = image.shape[0]
    assert c_in <= 8, c_in
    npx = tile * tile
    return pl.pallas_call(
        functools.partial(_retile_kernel, tile=tile, ntx=ntx, c_in=c_in),
        grid=(nty,),
        in_specs=[pl.BlockSpec(
            (c_in, tile, ntx * tile), lambda ty: (0, ty, 0))],
        out_specs=pl.BlockSpec((ntx, 8, npx), lambda ty: (ty, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (nty * ntx, 8, npx), image.dtype),
        interpret=interpret,
    )(image)


# pure-XLA references (the layouts api.py used before these kernels);
# kept for tests and as the interpret-unfriendly-backend fallback
def untile_image_xla(tiled, *, tile, ntx, nty):
    c = tiled.shape[1]
    x = tiled.reshape(nty, ntx, c, tile, tile)
    return x.transpose(2, 0, 3, 1, 4).reshape(c, nty * tile, ntx * tile)


def retile_image_xla(image, *, tile, ntx, nty):
    c = image.shape[0]
    x = image.reshape(c, nty, tile, ntx, tile)
    x = x.transpose(1, 3, 0, 2, 4).reshape(nty * ntx, c, tile * tile)
    if c < 8:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:1] + (8 - c, tile * tile), x.dtype)],
            axis=1)
    return x
