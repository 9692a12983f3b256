"""Sharded avatar training step over a (dp, gs) device mesh.

Composition (see shard.py for the axis semantics):
  * frames sharded over dp (multi-frame batching the reference lacks);
  * per dp-rank: gaussian decode + LBS sharded over gs with an
    all_gather of the posed gaussians;
  * rasterization tile-sharded over gs: each rank renders its image
    strip through a principal-point-shifted camera (binning + Pallas
    composite stay device-local);
  * photometric loss evaluated on local strips, parameter gradients
    pmean'd over (dp, gs) — one fused all-reduce that XLA overlaps with
    the backward pass.

The sharded loss is the photometric L1 + scale regularizer subset; the
full single-chip objective (SSIM windows and the region laplacians span
strip boundaries) stays on the single-chip path for now.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..model.avatar import AvatarConfig, avatar_forward
from ..ops.graphics import Camera
from ..ops.rasterizer.api import rasterize
from .shard import camera_strip


def make_sharded_train_step(
    mesh,
    avatar_cfg: AvatarConfig,
    template,
    camera: Camera,
    tx: optax.GradientTransformation,
    raster_kw: dict,
):
    """Build step(params, buffers, opt_state, cache, batch, rng) where
    batch arrays lead with the dp-sharded frame axis."""
    n_strips = mesh.shape["gs"]
    assert camera.height % n_strips == 0, "height must split over gs"
    strip_h = camera.height // n_strips
    strip_cams = [camera_strip(camera, i * strip_h, strip_h)
                  for i in range(n_strips)]

    def frame_loss(params, buffers, cache, frame, rng, strip_idx):
        out = avatar_forward(
            params, buffers, avatar_cfg, template, cache,
            dataset_idx=frame["idx"], smpl_scale=frame.get("smpl_scale"),
        )
        bg = jax.random.uniform(rng, (3,))

        def render_with(cam):
            def fn(_):
                pkg = rasterize(
                    out["xyz"], out["scales"], out["rotq"],
                    out["opacity"][:, 0], out["shs"], cam, sh_degree=3,
                    bg=bg, alive=buffers.alive > 0.5, backend="pallas",
                    **raster_kw)
                return jnp.clip(pkg["render"], 0.0, 1.0)
            return fn

        render = jax.lax.switch(
            strip_idx, [render_with(c) for c in strip_cams], None)

        y0 = strip_idx * strip_h
        gt = jax.lax.dynamic_slice_in_dim(frame["rgb"], y0, strip_h, axis=1)
        mask = jax.lax.dynamic_slice_in_dim(frame["mask"], y0, strip_h,
                                            axis=0)
        gt = gt * mask[None] + bg[:, None, None] * (1 - mask[None])
        # masked L1 with global normalization (psum'd mask area) —
        # equals the single-device masked_l1 over the full image
        mask_area = jax.lax.psum(mask.sum(), "gs")
        l1 = jax.lax.psum(jnp.abs(render - gt).sum(), "gs") / jnp.maximum(
            mask_area, 1.0)
        # exact distributed SSIM via halo exchange over ICI
        from .halo import strip_ssim

        ssim_val = strip_ssim(render, gt, "gs")
        frac = mask_area / (frame["rgb"].shape[-1]
                            * frame["rgb"].shape[-2])
        loss_ssim = (1.0 - ssim_val) * frac

        alive = buffers.alive
        mean_s = (out["scales"][:, 0] * alive).sum() / alive.sum()
        reg = 0.005 * jnp.sqrt(
            jnp.sum(((out["scales"][:, 0] - mean_s) * alive) ** 2) + 1e-24)
        # reg is computed redundantly on every gs rank; the caller psums
        # gradients over gs, so scale it down to count once
        reg = reg / jax.lax.axis_size("gs")
        return 0.8 * l1 + 0.2 * loss_ssim + reg

    def per_device(params, buffers, cache, batch, rng):
        frame = jax.tree.map(lambda x: x[0], batch)
        strip = jax.lax.axis_index("gs")
        rngs = jax.random.fold_in(rng, jax.lax.axis_index("dp"))

        loss, grads = jax.value_and_grad(
            lambda p: frame_loss(p, buffers, cache, frame, rngs, strip)
        )(params)
        # the photometric terms are already globally reduced over "gs"
        # inside frame_loss (psum/halo): the loss is gs-replicated and
        # each rank holds the PARTIAL gradient of the full loss -> sum
        # over gs, average over dp frames
        loss = jax.lax.pmean(loss, "dp")
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(jax.lax.psum(g, "gs"), "dp"), grads)
        return loss, grads

    sharded_grads = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(), P("dp"), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )

    @jax.jit
    def step(params, buffers, opt_state, cache, batch, rng):
        loss, grads = sharded_grads(params, buffers, cache, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
