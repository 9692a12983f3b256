"""Public differentiable rasterizer API.

rasterize() = pure-JAX preprocess (autodiff) + tiled Pallas composite
(custom VJP). Numerics match the reference's external CUDA
diff-gaussian-rasterization (see common.py / pallas_kernels.py headers
for the convention-by-convention mapping).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..graphics import Camera
from .common import Gaussians2D, preprocess
from .pallas_kernels import (
    NFEAT, composite_bwd, composite_bwd_panel, composite_fwd,
    composite_fwd_panel,
)
from .reference import composite_dense
from .tiles import bin_gaussians


class RasterConfig(NamedTuple):
    """Static kernel configuration (hashable: used as nondiff arg)."""

    height: int
    width: int
    tile: int = 16
    chunk: int = 128
    max_span: int = 5
    max_pairs: int | None = None
    main_width: int = 6
    tail_capacity: int | None = None
    cull: bool = True
    pair_cap: int | None = None
    # chunk cumsum inside the composite kernels: False = triangular
    # matmul on the MXU, True = log2(chunk) masked pltpu.rolls on the
    # VPU (see pallas_kernels._incl_cumsum_roll; measured A/B in
    # docs/PERF.md before the default was chosen)
    scan_roll: bool = False
    # "tiled": (T, 8, npx) tile-major kernel output + XLA relayout to
    # image layout; "panel": kernels walk 128px-wide tile panels and
    # emit image-layout planes directly (no relayout, cross-tile
    # chunk-0 prefetch — see pallas_kernels.py panel section)
    layout: str = "tiled"
    # static gate for the TRACED valid_rows argument (pair-balanced
    # strip ownership, tiles.py valid_tiles_y); False = argument unused
    row_limit: bool = False
    interpret: bool = False

    @property
    def panel_width(self) -> int:
        return max(1, 128 // self.tile)


def _pad_tiles(cfg: RasterConfig):
    ntx = -(-cfg.width // cfg.tile)
    nty = -(-cfg.height // cfg.tile)
    return ntx, nty


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _composite_tiled(cfg, means2d, conics, colors, opacities, depths,
                     radii_f, mask_f, valid_rows_f):
    out, _res = _composite_fwd(cfg, means2d, conics, colors, opacities,
                               depths, radii_f, mask_f, valid_rows_f)
    return out


def _gather_feats(binning, means2d, conics, colors, opacities, chunk):
    """Sorted-order pair features (NFEAT, PK + chunk), zero-padded tail
    (see pallas_kernels module docstring)."""
    n = means2d.shape[0]
    idx = jnp.clip(binning.sorted_gauss, 0)
    valid = binning.sorted_gauss >= 0
    feat = jnp.concatenate(
        [means2d, conics, colors, opacities[:, None],
         jnp.zeros((n, NFEAT - 9), means2d.dtype)], axis=1
    )
    feats = (feat[idx] * valid[:, None]).T
    return jnp.pad(feats, ((0, 0), (0, chunk))), valid


def _composite_fwd(cfg, means2d, conics, colors, opacities, depths,
                   radii_f, mask_f, valid_rows_f):
    ntx, nty = _pad_tiles(cfg)
    g2d = Gaussians2D(
        means2d=means2d, depths=depths, conics=conics, colors=colors,
        opacities=opacities, radii=radii_f.astype(jnp.int32),
        mask=mask_f > 0.5,
    )
    vty = None
    if cfg.row_limit:
        vty = jnp.ceil(valid_rows_f / cfg.tile).astype(jnp.int32)
    binning = bin_gaussians(
        g2d, tile=cfg.tile, n_tiles_x=ntx, n_tiles_y=nty,
        max_span=cfg.max_span, align=cfg.chunk, max_pairs=cfg.max_pairs,
        main_width=cfg.main_width, tail_capacity=cfg.tail_capacity,
        cull=cfg.cull, pair_cap=cfg.pair_cap, valid_tiles_y=vty,
    )
    feats, valid = _gather_feats(binning, means2d, conics, colors,
                                 opacities, cfg.chunk)
    if cfg.layout == "panel":
        out = composite_fwd_panel(
            feats, binning.tile_offsets, tile=cfg.tile, chunk=cfg.chunk,
            n_tiles_x=ntx, n_tiles_y=nty, pw=cfg.panel_width,
            interpret=cfg.interpret, scan_roll=cfg.scan_roll,
        )
        # (4, Hp, Wp) image-layout planes: a slice, no relayout
        color = out[:3, : cfg.height, : cfg.width]
        t_final = out[3, : cfg.height, : cfg.width]
    else:
        out = composite_fwd(
            feats, binning.tile_offsets, tile=cfg.tile, chunk=cfg.chunk,
            n_tiles_x=ntx, n_tiles_y=nty, interpret=cfg.interpret,
            scan_roll=cfg.scan_roll,
        )
        # (T, 8, npx) -> (3, H, W) color and (H, W) transmittance (XLA
        # transposes; the panel layout above removes them)
        color = out[:, :3, :].reshape(nty, ntx, 3, cfg.tile, cfg.tile)
        color = color.transpose(2, 0, 3, 1, 4).reshape(
            3, nty * cfg.tile, ntx * cfg.tile
        )[:, : cfg.height, : cfg.width]
        t_final = out[:, 3, :].reshape(nty, ntx, cfg.tile, cfg.tile)
        t_final = t_final.transpose(0, 2, 1, 3).reshape(
            nty * cfg.tile, ntx * cfg.tile
        )[: cfg.height, : cfg.width]
    res = (feats, binning.tile_offsets, binning.grad_offsets, out,
           binning.main_slot, binning.tail_slot, binning.tail_of_gauss,
           binning.pair_slot_capacity, means2d.shape[0])
    return (color, t_final), res


def _composite_bwd(cfg, res, cot):
    g_color, g_t = cot
    (feats, offsets, grad_offsets, fwd_out, main_slot, tail_slot,
     tail_of_gauss, grad_cap, n) = res
    ntx, nty = _pad_tiles(cfg)
    npx = cfg.tile * cfg.tile

    if cfg.layout == "panel":
        hp, wp = fwd_out.shape[1], fwd_out.shape[2]
        gout = jnp.zeros((4, hp, wp), g_color.dtype)
        gout = gout.at[:3, : cfg.height, : cfg.width].set(g_color)
        gout = gout.at[3, : cfg.height, : cfg.width].set(g_t)
        pair_grads = composite_bwd_panel(
            feats, offsets, grad_offsets, fwd_out, gout, tile=cfg.tile,
            chunk=cfg.chunk, n_tiles_x=ntx, n_tiles_y=nty,
            pw=cfg.panel_width, grad_cap=grad_cap,
            interpret=cfg.interpret, scan_roll=cfg.scan_roll,
        )
    else:
        hp, wp = nty * cfg.tile, ntx * cfg.tile
        gc = jnp.zeros((3, hp, wp), g_color.dtype)
        gc = gc.at[:, : cfg.height, : cfg.width].set(g_color)
        gt = jnp.zeros((hp, wp), g_t.dtype)
        gt = gt.at[: cfg.height, : cfg.width].set(g_t)

        gc_tiles = gc.reshape(3, nty, cfg.tile, ntx, cfg.tile).transpose(
            1, 3, 0, 2, 4
        ).reshape(nty * ntx, 3, npx)
        gt_tiles = gt.reshape(nty, cfg.tile, ntx, cfg.tile).transpose(
            0, 2, 1, 3
        ).reshape(nty * ntx, 1, npx)
        gout = jnp.concatenate(
            [gc_tiles, gt_tiles,
             jnp.zeros((nty * ntx, 4, npx), gc.dtype)], axis=1
        )

        pair_grads = composite_bwd(
            feats, offsets, grad_offsets, fwd_out, gout, tile=cfg.tile,
            chunk=cfg.chunk, n_tiles_x=ntx, n_tiles_y=nty, grad_cap=grad_cap,
            interpret=cfg.interpret, scan_roll=cfg.scan_roll,
        )
    # keep only the 9 used gradient rows and un-sort with narrow row
    # gathers (no float scatter; the glue is gather-row-count-bound,
    # hence the prefix + compacted-tail tables instead of a dense
    # (N, max_span^2) one — see tiles.py). The reserved spare slot the
    # invalid pairs gather from is zero-filled by the kernel itself.
    n_used = 9
    pair_grads = pair_grads[:n_used].T  # (grad_cap, 9)
    mw = main_slot.shape[1]
    pg = pair_grads[main_slot.reshape(-1)].reshape(n, mw, n_used).sum(axis=1)
    tc, tw = tail_slot.shape
    if tw > 0:
        pgt = pair_grads[tail_slot.reshape(-1)].reshape(tc, tw, n_used)
        # gather-merge via the per-gaussian tail-row index (row tc is a
        # zero pad) — a float scatter-add here measured 2x slower in the
        # fused backward (see tiles.py docstring)
        tail_sums = jnp.concatenate(
            [pgt.sum(axis=1), jnp.zeros((1, n_used), pgt.dtype)], axis=0)
        pg = pg + tail_sums[tail_of_gauss]

    d_means2d = pg[:, 0:2]
    d_conics = pg[:, 2:5]
    d_colors = pg[:, 5:8]
    d_opac = pg[:, 8]
    zeros_n = jnp.zeros((n,), pg.dtype)
    return (d_means2d, d_conics, d_colors, d_opac, zeros_n, zeros_n,
            zeros_n, jnp.zeros((), pg.dtype))


_composite_tiled.defvjp(_composite_fwd, _composite_bwd)


def rasterize(
    means3d: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    opacities: jax.Array,
    features: jax.Array,
    camera: Camera,
    *,
    sh_degree: int = 0,
    bg: jax.Array | None = None,
    scale_modifier: float = 1.0,
    alive: jax.Array | None = None,
    screen_probe: jax.Array | None = None,
    backend: str = "pallas",
    tile: int = 16,
    chunk: int = 128,
    max_span: int = 5,
    max_pairs: int | None = None,
    main_width: int = 6,
    tail_capacity: int | None = None,
    cull: bool = True,
    pair_cap: int | None = None,
    scan_roll: bool = False,
    layout: str = "tiled",
    valid_rows: jax.Array | float | None = None,
    interpret: bool = False,
) -> dict:
    """Differentiable gaussian splatting to an image.

    Mirrors the reference render() contract (gs_renderer_single.py:45-107)
    and returns {'render' (3,H,W) UNCLAMPED — training/eval consume the
    raw render like the reference autograd path; only PNG export and
    LPIPS inputs clip to [0,1]), 'radii', 'visibility_filter',
    'transmittance', 'means2d'}.

    screen_probe: optional (N, 2) zeros; its gradient equals the CUDA
    viewspace_points.grad (NDC-convention screen gradients used by
    density control: d pixel * 0.5 * {W, H}).

    valid_rows: optional TRACED pixel-row count this render OWNS
    (pair-balanced strip sharding, docs/SCALING.md): tile rows beyond
    it bin no pairs (their walks exit immediately) and render bg;
    rows below are bit-identical to the unrestricted render.
    """
    if bg is None:
        bg = jnp.zeros(3, means3d.dtype)
    g2d = preprocess(
        means3d, scales, quats, opacities, features, camera,
        sh_degree=sh_degree, scale_modifier=scale_modifier, alive=alive,
        tile=tile,
    )
    means2d = g2d.means2d
    if screen_probe is not None:
        probe_scale = jnp.array(
            [0.5 * camera.width, 0.5 * camera.height], means3d.dtype
        )
        means2d = means2d + screen_probe * probe_scale

    if backend == "pallas":
        cfg = RasterConfig(
            height=camera.height, width=camera.width, tile=tile, chunk=chunk,
            max_span=max_span, max_pairs=max_pairs, main_width=main_width,
            tail_capacity=tail_capacity, cull=cull, pair_cap=pair_cap,
            scan_roll=scan_roll, layout=layout,
            row_limit=valid_rows is not None, interpret=interpret,
        )
        valid_rows_f = jnp.asarray(
            camera.height if valid_rows is None else valid_rows,
            means3d.dtype)
        color, t_final = _composite_tiled(
            cfg, means2d, g2d.conics, g2d.colors, g2d.opacities, g2d.depths,
            g2d.radii.astype(means3d.dtype), g2d.mask.astype(means3d.dtype),
            valid_rows_f,
        )
        image = color + t_final[None] * bg[:, None, None]
    elif backend == "reference":
        g2d = g2d._replace(means2d=means2d)
        image, t_final = composite_dense(g2d, camera.height, camera.width, bg)
    else:
        raise ValueError(f"unknown backend {backend}")

    return {
        "render": image,
        "radii": g2d.radii,
        "visibility_filter": g2d.radii > 0,
        "transmittance": t_final,
        "means2d": means2d,
    }
