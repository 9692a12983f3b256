"""Multi-chip sharding for avatar training (jax.sharding + shard_map).

The reference has no distribution at all (SURVEY.md section 2.3). The
TPU-native scaling axes for this workload are:

  dp   — independent frames (and avatar cases) across devices; the
         reference trains batch=1, we batch n_dp frames per step and
         psum parameter gradients over ICI.
  gs   — the gaussian primitive axis for field decoding + LBS
         (embarrassingly parallel, all_gather the posed gaussians), and
         the image-tile axis for rasterization: each gs-rank renders a
         horizontal strip of the image through a principal-point-shifted
         camera, so tile binning and the Pallas composite stay fully
         local to the device and strips meet only at the ICI all_gather.

Parameters are replicated (triplane+MLP+xyz is ~10-100 MB — tiny);
gradients all-reduce with a single psum over both axes, which XLA
overlaps with the backward walk.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.graphics import Camera


def make_mesh(n_devices: int | None = None, dp: int | None = None):
    """Build a (dp, gs) device mesh from the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None:
        dp = max(1, n // 2) if n > 1 else 1
        while n % dp:
            dp -= 1
    gs = n // dp
    arr = np.array(devs).reshape(dp, gs)
    return Mesh(arr, axis_names=("dp", "gs"))


def camera_strip(camera: Camera, y0: int, h: int) -> Camera:
    """Sub-camera rendering image rows [y0, y0+h).

    Screen-space pixel y' = y - y0 corresponds to shifting the NDC-to-
    pixel mapping: y_pix = ((ndc+1)*H' - 1)/2 must equal y_full - y0.
    We fold the shift into the projection matrix row that produces
    ndc_y: ndc'_y = (2*(y_full) - 2*y0 + 1 - H')/H' ... algebraically
    ndc'_y = a * ndc_y + b with a = H/h and
    b = (H - h - 2*y0) / h, applied to the clip-space row (scaled by w).
    """
    hh = camera.height
    a = hh / h
    b = (hh - h - 2.0 * y0) / h
    proj = camera.proj
    # clip_y' = a*clip_y + b*clip_w  (row-vector convention: columns)
    new_col_y = a * proj[:, 1] + b * proj[:, 3]
    proj = proj.at[:, 1].set(new_col_y)
    # keep the physical focal length: focal_y = h / (2 * tan') == H / (2 * tan)
    return Camera(
        view=camera.view, proj=proj, cam_center=camera.cam_center,
        height=h, width=camera.width,
        tan_fovx=camera.tan_fovx, tan_fovy=camera.tan_fovy * h / hh,
        # `is None` (not `or`): fields may be traced scalars
        clamp_tan_fovx=(camera.tan_fovx if camera.clamp_tan_fovx is None
                        else camera.clamp_tan_fovx),
        clamp_tan_fovy=(camera.tan_fovy if camera.clamp_tan_fovy is None
                        else camera.clamp_tan_fovy),
    )


def make_sharded_step(mesh: Mesh, loss_strip_fn, n_strips: int):
    """Wrap a per-strip loss into a dp x gs sharded gradient step.

    loss_strip_fn(params, batch_frame, strip_idx) -> scalar loss for
    one frame restricted to one image strip. The wrapper:
      * shards frames over "dp" (leading batch axis),
      * assigns each gs-rank its strip,
      * sums losses and psums gradients over both axes.
    Returns f(params, batch) -> (loss, grads) with batch leading dim =
    dp size.
    """
    from jax import shard_map

    def per_device(params, batch):
        frame = jax.tree.map(lambda x: x[0], batch)  # local shard is (1, ...)
        strip = jax.lax.axis_index("gs")

        def local_loss(p):
            return loss_strip_fn(p, frame, strip)

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.pmean(loss, ("dp", "gs"))
        grads = jax.lax.pmean(grads, ("dp", "gs"))
        return loss, grads

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return sharded


def replicate(tree: Any, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(tree: Any, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P("dp")))


def balanced_strip_bounds(row_weight, n_gs: int, tile: int = 16,
                          pad_mult: float = 1.0):
    """Tile-aligned strip boundaries equalizing per-rank work.

    row_weight: (H,) nonnegative per-pixel-row work proxy (mask row
    sums at trainer init, or per-tile-row pair counts). Greedy cuts at
    the k/n_gs quantiles of the cumulative weight, constrained so
    every strip owns >= 1 tile row and boundaries stay tile-aligned.
    Returns (bounds np.int32 (n_gs + 1,) pixel rows, strip_h_max int)
    with strip_h_max rounded up to the tile (optionally scaled by
    pad_mult headroom for later rebalances without a recompile).
    docs/SCALING.md mitigation 2."""
    import numpy as _onp

    row_weight = _onp.asarray(row_weight, _onp.float64)
    h = len(row_weight)
    assert h % tile == 0, "image height must be tile-aligned"
    nt = h // tile
    assert nt >= n_gs, "fewer tile rows than ranks"
    per_tile = row_weight.reshape(nt, tile).sum(axis=1) + 1e-9
    cum = _onp.concatenate([[0.0], _onp.cumsum(per_tile)])
    total = cum[-1]
    cuts = [0]
    for k in range(1, n_gs):
        target = total * k / n_gs
        r = int(_onp.searchsorted(cum, target))
        # the tile-row cut whose cumulative weight is closest to the
        # quantile, constrained to leave >= 1 tile row per strip
        best = min((max(r - 1, 1), r),
                   key=lambda c: abs(cum[min(c, nt)] - target))
        cuts.append(int(_onp.clip(best, cuts[-1] + 1, nt - (n_gs - k))))
    cuts.append(nt)
    bounds = _onp.asarray(cuts, _onp.int64) * tile
    heights = _onp.diff(bounds)
    strip_h_max = int(-(-int(heights.max() * pad_mult) // tile) * tile)
    return bounds.astype(_onp.int32), min(strip_h_max, h)
