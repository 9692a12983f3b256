"""Sharded avatar training step over a (dp, gs) device mesh.

FULL-objective multi-chip version of train/step.py's train_step_body
(the reference has no distribution at all — SURVEY.md section 2.3).
Composition (see shard.py for the axis semantics):

  * frames sharded over dp (multi-frame batching the reference lacks);
  * per dp-rank, the gs axis shards the heavy stages:
      - gaussian decode + LBS on capacity/gs slices (triplane sample,
        decoder MLPs, skinning); posed gaussians meet in one tiled
        all_gather;
      - rasterization over image strips through principal-point-shifted
        cameras (binning + Pallas composite stay device-local);
      - masked L1 on local strips; SSIM via the exact halo exchange
        (dist/halo.py); LPIPS patches round-robined over ranks on the
        all_gathered render;
  * the per-gaussian regularizers (l2-norm family, KNN edge, region
    laplacians, mesh-edge) are element-wise/gather passes over the
    gaussian axis — cheap relative to decode+raster — and are computed
    replicated on the gathered arrays, divided by the gs size so the
    rank-sum counts them once (follow-up: row-shard the laplacian/KNN
    tables);
  * density-control statistics (screen-probe gradients, max radii) are
    reduced over the mesh with the same conventions as the single-chip
    step (probe gradients rescaled to the full-image NDC convention);
  * gradients meet in one pmean(psum(., gs), dp) that XLA overlaps with
    the backward pass; the non-finite step guard matches step.py.

GRADIENT-SAFETY RULE (shard_map with check_vma=False): the transpose of
psum is psum, so differentiating through a psum/pmean of a
param-dependent value overcounts its gradient by the axis size. The
per-rank loss below is therefore a LOCAL contribution whose rank-sum is
the global objective; the only collectives touching param-dependent
values inside jax.grad are all_gather (transpose: psum_scatter) and the
SSIM halo ppermutes — both exact. psum on data (masks) is safe.

At mesh (1, 1) this step reproduces train/step.py's train_step_body
bit-for-bit up to collective no-ops (tests/test_dist.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..losses.lpips import lpips_distance
from ..losses.photometric import masked_l1, sample_patches
from ..losses.regularizers import (
    gaussians_edge_loss_rows, l2_norm_loss, mesh_edge_loss,
)
from ..model.avatar import AvatarConfig, avatar_forward
from ..ops.graphics import Camera
from ..ops.rasterizer.api import rasterize
from ..train.step import StepConfig, _gate_grad, sh_degree_mask
from .halo import strip_ssim_local, strip_ssim_local_bounded
from .shard import camera_strip

_GATHER_KEYS = ("xyz", "scales", "rotq", "shs", "opacity",
                "xyz_canon", "xyz_offsets", "xyz_anchor_canon")


def _slice_gaussian_state(params, buffers, start, shard):
    def sl(x):
        return jax.lax.dynamic_slice_in_dim(x, start, shard)

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
    return p_loc, b_loc


def make_frame_loss(
    avatar_cfg: AvatarConfig,
    step_cfg: StepConfig,
    template,
    height: int,
    width: int,
    n_gs: int,
    lpips_params,
    raster_kw: dict,
    strip_bounds=None,
    strip_h_max: int | None = None,
):
    """Shared per-(frame, gs-rank) loss of the sharded steps.

    Returns frame_loss(params, probe, buffers, cache, camera, frame,
    k_bg, k_photo, step, active_sh_degree, region_lap_pos,
    region_lap_color, lap_pos_w, lap_color_w, strip_idx) -> (local_loss,
    aux) whose rank-sum over the "gs" axis is the full single-chip
    objective. `camera` is the FULL-image camera; its array fields may
    be traced (per-case cameras), height/width must equal the static
    ints passed here.

    strip_bounds / strip_h_max: pair-balanced strips (docs/SCALING.md
    mitigation 2). bounds is an (n_gs + 1,) tile-aligned pixel-row
    array (bounds[0] = 0, bounds[-1] = height); every rank rasterizes
    a STATIC strip_h_max-row window at its bound but OWNS only
    bounds[i+1] - bounds[i] rows — rasterize(valid_rows=...) bins zero
    pairs beyond the owned range, so the per-rank walk cost tracks the
    rank's pair share instead of its row share. None = equal strips
    (the balanced machinery is bypassed entirely)."""
    w = step_cfg.weights
    balanced = strip_bounds is not None
    if balanced:
        bounds = jnp.asarray(np.asarray(strip_bounds), jnp.int32)
        assert bounds.shape == (n_gs + 1,)
        strip_h = int(strip_h_max)
    else:
        assert height % n_gs == 0, "height must split over gs"
        strip_h = height // n_gs
    assert avatar_cfg.capacity % n_gs == 0, "capacity must split over gs"
    gauss_shard = avatar_cfg.capacity // n_gs
    pw = w.photometric
    npatch = pw.num_patches
    patches_per_rank = -(-npatch // n_gs)

    def lpips_fn(a, b):
        return lpips_distance(lpips_params, a, b)

    lpips = lpips_fn if (lpips_params is not None and pw.lpips > 0) else None

    def frame_loss(params, probe, buffers, cache, camera, frame, k_bg,
                   k_photo, step, active_sh_degree, region_lap_pos,
                   region_lap_color, lap_pos_w, lap_color_w, strip_idx):
        bg = jax.random.uniform(k_bg, (3,))
        opt_geo = step >= step_cfg.opt_geo_from
        opt_app = step >= step_cfg.opt_app_from
        deg_mask = sh_degree_mask(active_sh_degree)

        # ---- decode this rank's capacity/gs gaussian shard only
        p_loc, b_loc = _slice_gaussian_state(
            params, buffers, strip_idx * gauss_shard, gauss_shard)
        out_loc = avatar_forward(
            p_loc, b_loc, avatar_cfg, template, cache,
            smpl_scale=frame.get("smpl_scale"), dataset_idx=frame["idx"],
        )
        for k in ("xyz_canon", "xyz_offsets", "scales", "scales_canon"):
            out_loc[k] = _gate_grad(out_loc[k], opt_geo)
        for k in ("shs", "opacity"):
            out_loc[k] = _gate_grad(out_loc[k], opt_app)
        out_loc["shs"] = out_loc["shs"] * deg_mask[None, :, None]

        out = {
            k: jax.lax.all_gather(out_loc[k], "gs", axis=0, tiled=True)
            for k in _GATHER_KEYS
        }

        # ---- rasterize this rank's image strip (full gaussian set);
        # one strip camera with a traced row offset — no per-rank
        # program variants to compile (camera_strip is y0-linear)
        if balanced:
            y0 = bounds[strip_idx]
            h_own = bounds[strip_idx + 1] - y0
            cam_loc = camera_strip(camera, y0, strip_h)
            pkg = rasterize(
                out["xyz"], out["scales"], out["rotq"],
                out["opacity"][:, 0], out["shs"], cam_loc, sh_degree=3,
                bg=bg, alive=buffers.alive > 0.5, screen_probe=probe,
                backend="pallas",
                valid_rows=h_own.astype(jnp.float32), **raster_kw)
            # owned-row mask: padding rows beyond h_own belong to the
            # next rank (they rendered bg — zero pairs were binned)
            rm = (jnp.arange(strip_h) < h_own).astype(
                pkg["render"].dtype)
        else:
            y0 = strip_idx * strip_h
            h_own = strip_h
            cam_loc = camera_strip(camera, y0, strip_h)
            pkg = rasterize(
                out["xyz"], out["scales"], out["rotq"],
                out["opacity"][:, 0], out["shs"], cam_loc, sh_degree=3,
                bg=bg, alive=buffers.alive > 0.5, screen_probe=probe,
                backend="pallas", **raster_kw)
            rm = None
        # raw render like train/step.py — clamping kills the corrective
        # photometric gradient outside [0,1] (reference parity)
        render = pkg["render"]

        # ---- photometric: local strip contributions
        mask = frame["mask"]
        gt_full = frame["rgb"] * mask[None] + bg[:, None, None] * (
            1.0 - mask[None])
        if balanced:
            # windows may extend past the image bottom: pad, then slice
            gt = jax.lax.dynamic_slice_in_dim(
                jnp.pad(gt_full, ((0, 0), (0, strip_h), (0, 0))),
                y0, strip_h, axis=1)
            ms = jax.lax.dynamic_slice_in_dim(
                jnp.pad(mask, ((0, strip_h), (0, 0))), y0, strip_h,
                axis=0) * rm[:, None]
        else:
            gt = jax.lax.dynamic_slice_in_dim(gt_full, y0, strip_h, axis=1)
            ms = jax.lax.dynamic_slice_in_dim(mask, y0, strip_h, axis=0)
        mask_area = jnp.maximum(mask.sum(), 1.0)

        photo_d = {}
        photo = 0.0
        if pw.l1 > 0:
            diff = jnp.abs(render - gt)
            if balanced:
                diff = diff * rm[None, :, None]
            photo_d["l1"] = pw.l1 * diff.sum() / mask_area
            photo = photo + photo_d["l1"]
        if pw.ssim > 0:
            frac = mask.sum() / (height * width)
            # rank-sum of (1/n - local) * frac == (1 - ssim_full) * frac
            local_ssim = (
                strip_ssim_local_bounded(render, gt, "gs", h_own,
                                         float(height * width))
                if balanced else strip_ssim_local(render, gt, "gs"))
            photo_d["ssim"] = pw.ssim * (1.0 / n_gs - local_ssim) * frac
            photo = photo + photo_d["ssim"]
        if w.silhouette != 0:
            # local strip contribution of mean (1 - T - mask)^2; the
            # gs rank-sum of local sums / (H*W) equals the full-image
            # mean (train/step.py silhouette term)
            sil = 1.0 - pkg["transmittance"]
            sq = (sil - ms) ** 2
            if balanced:
                sq = sq * rm[:, None]
            l_sil = jnp.sum(sq) / (height * width)
            photo_d["sil"] = w.silhouette * l_sil
            photo = photo + photo_d["sil"]
        if lpips is not None or pw.grad_pyramid > 0:
            # LPIPS / grad-pyramid patches need the full image: gather
            # the strips (exact transpose), sample the same patches on
            # every rank (replicated mask + key), evaluate round-robin
            render_full = jax.lax.all_gather(render, "gs", axis=1,
                                             tiled=True)
            if balanced:
                # reassemble variable-height owned regions from the
                # gathered h_max windows: row r belongs to the rank
                # whose bounds bracket it (one gather row per image
                # row — each source row used at most once, so the
                # transpose is an exact scatter)
                rows = jnp.arange(height)
                owner = jnp.clip(
                    jnp.searchsorted(bounds, rows, side="right") - 1,
                    0, n_gs - 1)
                src = owner * strip_h + (rows - bounds[owner])
                render_full = render_full[:, src, :]
            k_noise, k_patch = jax.random.split(k_photo)
            noise = jax.random.uniform(k_noise, render_full.shape,
                                       render_full.dtype)
            m3 = mask[None]
            pred_bg = render_full * m3 + noise * (1.0 - m3)
            gt_bg = gt_full * m3 + noise * (1.0 - m3)
            pred_p, gt_p = sample_patches(
                k_patch, mask, (pred_bg, gt_bg),
                num_patches=npatch, patch_size=pw.patch_size,
            )
            j = jnp.arange(patches_per_rank)
            mine = strip_idx + j * n_gs
            wj = (mine < npatch).astype(render_full.dtype)
            pidx = jnp.where(mine < npatch, mine, 0)
            if lpips is not None:
                d = lpips(pred_p[pidx].clip(max=1.0), gt_p[pidx])
                photo_d["lpips_patch"] = pw.lpips * (d * wj).sum() / npatch
                photo = photo + photo_d["lpips_patch"]
            if pw.grad_pyramid > 0:
                from ..losses.photometric import grad_pyramid_distance

                gp = jax.vmap(
                    lambda a, b: grad_pyramid_distance(
                        a[None].clip(max=1.0), b[None],
                        pw.grad_pyramid_levels)
                )(pred_p[pidx], gt_p[pidx])
                photo_d["grad_pyr"] = pw.grad_pyramid * (
                    gp * wj).sum() / npatch
                photo = photo + photo_d["grad_pyr"]

        # ---- per-gaussian regularizers over the gathered arrays.
        # The O(N*D) table passes (region laplacians via the
        # ShardedRegionLaplacian row split) and the O(N^2/blocks) KNN
        # matmuls (gaussians_edge_loss_rows query split) are LOCAL row
        # contributions whose gs rank-sum is the global term — no
        # replicated heavy work (VERDICT r1 item 6). Gradients route
        # back through the all_gather transpose (psum_scatter — exact).
        # l2-norm and mesh-edge stay replicated / n_gs: both are a few
        # elementwise reductions (l2's sqrt needs the GLOBAL sum, so a
        # row split would need a param-dependent psum inside grad,
        # which the GRADIENT-SAFETY RULE above forbids) and cost ~none.
        alive = buffers.alive
        zero = jnp.float32(0.0)
        use_op_norm = step >= step_cfg.opacity_norm_from
        reg_with_op = l2_norm_loss(w.l2, out["xyz_offsets"], out["scales"],
                                   out["opacity"], alive)
        reg_no_op = l2_norm_loss(w.l2, out["xyz_offsets"], out["scales"],
                                 None, alive)
        reg = jnp.where(use_op_norm, reg_with_op, reg_no_op) / n_gs

        edge = zero if w.mesh_edge == 0 else w.mesh_edge * mesh_edge_loss(
            jax.lax.stop_gradient(out["xyz_canon"]), buffers.edges,
            buffers.edge_valid) / n_gs
        connect = zero if w.gaussian_connect == 0 else (
            w.gaussian_connect * gaussians_edge_loss_rows(
                jax.lax.stop_gradient(out["xyz_canon"]), out["scales"],
                alive, row_start=strip_idx * gauss_shard,
                rows=gauss_shard, k=step_cfg.knn_k))

        pos_terms = []
        if w.lap_position_strength != 0:
            pos_terms.append((out["xyz_anchor_canon"], lap_pos_w, None))
        if w.hand_lap_weight * w.hand_strength != 0:
            pos_terms.append((out["xyz_canon"],
                              jnp.ones_like(lap_pos_w), [6, 7]))
        color_on = w.lap_color_strength != 0
        if color_on and step_cfg.lap_shared:
            # one fused table stream for pos+hands+color (see
            # train/step.py lap_shared)
            pos_terms.append((out["shs"][:, 0], lap_color_w, None))
        fused = region_lap_pos.loss_fused(pos_terms) if pos_terms else []
        lap_pos = (fused.pop(0) if w.lap_position_strength != 0 else zero)
        hand_raw = fused.pop(0) if w.hand_lap_weight * w.hand_strength \
            != 0 else zero
        if color_on:
            lap_color = (fused.pop(0) if step_cfg.lap_shared
                         else region_lap_color.loss_fused(
                             [(out["shs"][:, 0], lap_color_w, None)])[0])
        else:
            lap_color = zero
        ramp = jnp.clip(
            (step - w.lap_impose_from) / max(w.lap_impose_from, 1), 0, 1)
        alpha = w.lap_position_strength * ramp * jnp.where(
            step > w.lap_double_after, 2.0, 1.0)
        lap_pos_loss = alpha * lap_pos
        lap_color_loss = w.lap_color_strength * lap_color
        hand_lap = w.hand_lap_weight * w.hand_strength * hand_raw

        total = (photo + reg + edge + connect + lap_pos_loss
                 + lap_color_loss + hand_lap)
        aux = {
            "loss": total,
            "photo": photo,
            "reg_l2": reg,
            "mesh_edge": edge,
            "connect": connect,
            "lap_pos": lap_pos_loss,
            "lap_color": lap_color_loss,
            "radii": pkg["radii"],
            "visible": pkg["visibility_filter"],
            **{f"photo_{k}": v for k, v in photo_d.items()},
        }
        return total, aux

    return frame_loss


def make_sharded_train_step(
    mesh,
    avatar_cfg: AvatarConfig,
    step_cfg: StepConfig,
    template,
    camera: Camera,
    tx: optax.GradientTransformation,
    lpips_params,
    raster_kw: dict,
    strip_bounds=None,
    strip_h_max: int | None = None,
):
    """Build step(params, buffers, opt_state, cache, batch, rng, step,
    active_sh_degree, region_lap_pos, region_lap_color, lap_pos_w,
    lap_color_w) -> (params, buffers, opt_state, metrics), where batch
    arrays lead with the dp-sharded frame axis. All non-batch inputs and
    outputs are replicated.

    strip_bounds/strip_h_max: pair-balanced strip rows (see
    make_frame_loss); baked into the compiled step — rebuild the step
    to rebalance (e.g. after density events)."""
    n_gs = mesh.shape["gs"]
    frame_loss = make_frame_loss(
        avatar_cfg, step_cfg, template, camera.height, camera.width, n_gs,
        lpips_params, raster_kw, strip_bounds=strip_bounds,
        strip_h_max=strip_h_max)
    strip_h_used = (int(strip_h_max) if strip_bounds is not None
                    else camera.height // n_gs)

    def _core(params, buffers, cache, batch, rng, step, active_sh_degree,
              region_lap_pos, region_lap_color, lap_pos_w, lap_color_w):
        frame = jax.tree.map(lambda x: x[0], batch)
        strip_idx = jax.lax.axis_index("gs")
        rng_d = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        k_bg, k_photo = jax.random.split(rng_d)

        probe0 = jnp.zeros((avatar_cfg.capacity, 2))
        (loss_local, aux), (grads, probe_grad) = jax.value_and_grad(
            lambda p, pr: frame_loss(
                p, pr, buffers, cache, camera, frame, k_bg, k_photo, step,
                active_sh_degree, region_lap_pos, region_lap_color,
                lap_pos_w, lap_color_w, strip_idx),
            argnums=(0, 1), has_aux=True,
        )(params, probe0)

        # per-rank loss values are LOCAL contributions -> sum over gs
        # (OUTSIDE the grad), average over dp frames
        loss = jax.lax.pmean(jax.lax.psum(loss_local, "gs"), "dp")
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(jax.lax.psum(g, "gs"), "dp"), grads)
        return loss, grads, aux, probe_grad

    def per_device(params, buffers, opt_state, cache, batch, rng, step,
                   active_sh_degree, region_lap_pos, region_lap_color,
                   lap_pos_w, lap_color_w):
        loss, grads, aux, probe_grad = _core(
            params, buffers, cache, batch, rng, step, active_sh_degree,
            region_lap_pos, region_lap_color, lap_pos_w, lap_color_w)

        # non-finite guard (step.py): skip the whole update if any
        # gradient is poisoned
        finite = jnp.isfinite(loss)
        for g in jax.tree.leaves(grads):
            finite &= jnp.all(jnp.isfinite(g))

        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda new, old: jax.tree.map(  # noqa: E731
            lambda a, b: jnp.where(finite, a, b), new, old)
        params = keep(new_params, params)
        opt_state = keep(new_opt_state, opt_state)

        # density-control statistics: probe gradients back to the
        # full-image NDC convention (rasterize scaled by the STRIP
        # window height -> multiply y by H / strip_h), summed over
        # strips and frames
        probe_g = jax.lax.psum(probe_grad, "gs") * jnp.asarray(
            [1.0, camera.height / float(strip_h_used)])
        visible = jax.lax.pmax(
            aux.pop("visible").astype(jnp.float32), "gs") > 0.5
        radii = jax.lax.pmax(aux.pop("radii").astype(jnp.float32), "gs")
        acc = visible & finite
        max_r = jnp.where(acc, jnp.maximum(buffers.max_radii2d, radii),
                          buffers.max_radii2d)
        grad_add = jnp.where(acc, jnp.linalg.norm(probe_g, axis=-1), 0.0)
        denom_add = acc.astype(jnp.float32)
        buffers = buffers._replace(
            max_radii2d=jax.lax.pmax(max_r, "dp"),
            xyz_grad_accum=buffers.xyz_grad_accum + jax.lax.psum(
                grad_add, "dp"),
            grad_denom=buffers.grad_denom + jax.lax.psum(denom_add, "dp"),
        )

        metrics = {
            k: jax.lax.pmean(jax.lax.psum(v, "gs"), "dp")
            for k, v in aux.items()
        }
        metrics["skipped"] = jax.lax.pmean(
            (~finite).astype(jnp.float32), ("dp", "gs"))
        return params, buffers, opt_state, metrics

    sharded = shard_map(
        per_device, mesh=mesh,
        # region-laplacian tables are ShardedRegionLaplacian pytrees
        # stacked on a leading gs axis -> one row range per rank
        in_specs=(P(), P(), P(), P(), P("dp"), P(), P(), P(),
                  P("gs"), P("gs"), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, buffers, opt_state, cache, batch, rng, step_idx,
             active_sh_degree, region_lap_pos, region_lap_color,
             lap_pos_w, lap_color_w):
        return sharded(params, buffers, opt_state, cache, batch, rng,
                       jnp.asarray(step_idx), jnp.asarray(active_sh_degree),
                       region_lap_pos, region_lap_color, lap_pos_w,
                       lap_color_w)

    # (loss, grads) view for tests/debugging
    step.grads_fn = jax.jit(shard_map(
        lambda p, b, c, batch, rng, s, a, rlp, rlc, wp, wc: _core(
            p, b, c, batch, rng, s, a, rlp, rlc, wp, wc)[:2],
        mesh=mesh,
        in_specs=(P(), P(), P(), P("dp"), P(), P(), P(),
                  P("gs"), P("gs"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    return step
