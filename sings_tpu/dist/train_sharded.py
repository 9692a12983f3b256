"""Sharded avatar training step over a (dp, gs) device mesh.

Composition (see shard.py for the axis semantics):
  * frames sharded over dp (multi-frame batching the reference lacks);
  * per dp-rank: gaussian decode + LBS sharded over gs — each rank
    decodes capacity/gs gaussians (triplane sample, decoder MLPs, LBS)
    and the posed gaussians meet in one tiled all_gather whose
    transpose (psum_scatter) routes pixel gradients back to the owning
    rank;
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
    assert avatar_cfg.capacity % n_strips == 0, "capacity must split over gs"
    strip_h = camera.height // n_strips
    gauss_shard = avatar_cfg.capacity // n_strips
    strip_cams = [camera_strip(camera, i * strip_h, strip_h)
                  for i in range(n_strips)]

    def frame_loss(params, buffers, cache, frame, rng, strip_idx):
        # gaussian decode + LBS on this rank's capacity/gs shard only
        # (strip_idx doubles as the gs rank); per-gaussian leaves are
        # sliced, the tiny SMPL template forward is recomputed per rank
        start = strip_idx * gauss_shard

        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, start, gauss_shard)

        p_loc = params._replace(xyz=sl(params.xyz))
        b_loc = buffers._replace(
            alive=sl(buffers.alive),
            scaling_multiplier=sl(buffers.scaling_multiplier),
            opacity_offset=sl(buffers.opacity_offset),
            lbs_weights=sl(buffers.lbs_weights),
            vertex_label=sl(buffers.vertex_label),
            anchor_normals=sl(buffers.anchor_normals),
            max_radii2d=sl(buffers.max_radii2d),
            xyz_grad_accum=sl(buffers.xyz_grad_accum),
            grad_denom=sl(buffers.grad_denom),
        )
        out_loc = avatar_forward(
            p_loc, b_loc, avatar_cfg, template, cache,
            dataset_idx=frame["idx"], smpl_scale=frame.get("smpl_scale"),
            eval_mode=True,
        )
        out = {
            k: jax.lax.all_gather(out_loc[k], "gs", axis=0, tiled=True)
            for k in ("xyz", "scales", "rotq", "shs", "opacity")
        }
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

        # GRADIENT-SAFETY RULE (shard_map with check_rep=False): the
        # transpose of psum is psum, so differentiating through a psum
        # of a param-dependent value overcounts its gradient by the
        # axis size. The per-rank loss below is therefore the LOCAL
        # contribution (rank-sum == global frame loss); the only
        # collectives touching param-dependent values inside grad are
        # all_gather (transpose: psum_scatter) and the SSIM halo
        # ppermutes — both exact. psum on `mask` is fine: it is data
        # with no parameter path.
        mask_area = jax.lax.psum(mask.sum(), "gs")
        l1_local = jnp.abs(render - gt).sum() / jnp.maximum(mask_area, 1.0)
        # exact distributed SSIM via halo exchange over ICI
        from .halo import strip_ssim_local

        n_gs = jax.lax.axis_size("gs")
        ssim_local = strip_ssim_local(render, gt, "gs")
        frac = mask_area / (frame["rgb"].shape[-1]
                            * frame["rgb"].shape[-2])
        # sum_r (1/n - ssim_local_r) * frac == (1 - ssim_full) * frac
        loss_ssim_local = (1.0 / n_gs - ssim_local) * frac

        alive = buffers.alive
        mean_s = (out["scales"][:, 0] * alive).sum() / alive.sum()
        reg = 0.005 * jnp.sqrt(
            jnp.sum(((out["scales"][:, 0] - mean_s) * alive) ** 2) + 1e-24)
        # reg is computed redundantly on every rank from the gathered
        # scales; /n makes the rank-sum count it once (its gradient
        # routes through the all_gather transpose, which is exact)
        reg = reg / n_gs
        return 0.8 * l1_local + 0.2 * loss_ssim_local + reg

    def per_device(params, buffers, cache, batch, rng):
        frame = jax.tree.map(lambda x: x[0], batch)
        strip = jax.lax.axis_index("gs")
        rngs = jax.random.fold_in(rng, jax.lax.axis_index("dp"))

        loss_local, grads = jax.value_and_grad(
            lambda p: frame_loss(p, buffers, cache, frame, rngs, strip)
        )(params)
        # per-rank values are LOCAL contributions -> sum over gs
        # (outside the grad), average over dp frames
        loss = jax.lax.pmean(jax.lax.psum(loss_local, "gs"), "dp")
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

    step.grads_fn = jax.jit(sharded_grads)  # exposed for tests/debugging
    return step
