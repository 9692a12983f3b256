"""The jitted training step: forward -> render -> losses -> update.

One XLA program covers the entire training schedule — every
schedule-dependent behavior of the reference trainer
(gs_trainer.py:201-413) is expressed with traced scalars instead of
python branches, so the step compiles exactly once:

  * decoder warmup (opt_geo/opt_app windows): gradients are gated with
    where(flag, x, stop_gradient(x)) — value-identical, gradient-masked;
  * SH degree annealing: degree-3 evaluation with a coefficient mask
    that zeroes bands above the active degree;
  * laplacian ramp / doubling, and the post-densify opacity norm term:
    traced multipliers.

Density-control statistics (screen-space gradient norms, max radii) are
harvested from the same backward pass via the screen_probe passthrough
(api.rasterize) exactly like the CUDA path's retain_grad trick.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..losses.lpips import LPIPSParams, lpips_distance
from ..losses.photometric import PhotometricWeights, photometric_loss
from ..losses.regularizers import (
    L2NormConfig, RegionLaplacian, gaussians_edge_loss,
    gaussians_edge_loss_from_stat, l2_norm_loss, mesh_edge_loss,
)
from ..model.avatar import (
    AvatarBuffers, AvatarConfig, AvatarParams, avatar_forward,
)
from ..ops.graphics import Camera
from ..ops.rasterizer.api import rasterize


class LossWeights(NamedTuple):
    photometric: PhotometricWeights = PhotometricWeights()
    l2: L2NormConfig = L2NormConfig()
    # alpha-vs-mask supervision: mean (1 - T_final - mask)^2 over the
    # image. Not in the reference (its only coverage signal is the
    # photometric term against the random-bg composite); targets the
    # boundary-ring error measured dominant in the r3 error budget
    # (interior PSNR 21.0 vs masked 16.9, silhouette area 0.974) —
    # deviation documented in PARITY.md. 0 = off (parity).
    silhouette: float = 0.0
    mesh_edge: float = 1e4
    gaussian_connect: float = 5e3
    lap_position_strength: float = 1000.0
    lap_color_strength: float = 5.0
    lap_impose_from: int = 1000
    lap_double_after: int = 8000
    hand_lap_weight: float = 1e-5
    hand_strength: float = 1000.0


class StepConfig(NamedTuple):
    weights: LossWeights
    opt_geo_from: int
    opt_app_from: int
    opacity_norm_from: int        # max(prune_until, densify_until)
    knn_k: int = 9
    # "dense": blocked O(N^2) matrix every step.
    # "window": Morton-curve candidates, O(N*W), ~85% recall (opt-in).
    # "chunk": exact dense statistic computed ONCE per scan chunk and
    #   held constant across its inner_steps (the statistic is
    #   stop-gradient'd and canonical positions move negligibly within
    #   a chunk) — amortizes the ~31 ms @128k dense KNN by inner_steps.
    #   Single-step dispatches (edge_stat unavailable) fall back to
    #   dense. See losses.regularizers.{edge_stat,gaussians_edge_loss}.
    knn_backend: str = "dense"
    # True when region_lap_pos and region_lap_color are the SAME
    # laplacian (the trainer always passes one object twice): the
    # color term then joins the pos+hands fused apply — one matvec
    # (one band/table stream fwd + bwd) instead of two. Identity
    # cannot be detected under jit (both are tracers), hence a static
    # flag.
    lap_shared: bool = False


def sh_degree_mask(active_degree: jax.Array) -> jax.Array:
    """(16,) mask zeroing SH bands above the active degree."""
    band = jnp.asarray([0] + [1] * 3 + [2] * 5 + [3] * 7)
    return (band <= active_degree).astype(jnp.float32)


def _gate_grad(x, flag):
    """Value-identical; gradient flows only where flag is true."""
    return jnp.where(flag, x, jax.lax.stop_gradient(x))


def make_train_step(
    avatar_cfg: AvatarConfig,
    step_cfg: StepConfig,
    template,
    camera: Camera,
    tx: optax.GradientTransformation,
    lpips_params: LPIPSParams | None,
    raster_kw: dict,
):
    """Build the train step body (unjitted; callers jit it directly or
    chain it with make_train_scan).

    The RegionLaplacian pytree is passed per call (its *contents* change
    after topology updates but its shapes stay fixed — no recompile).
    """
    w = step_cfg.weights

    def lpips_fn(a, b):
        return lpips_distance(lpips_params, a, b)

    lpips = lpips_fn if lpips_params is not None else None

    def train_step_body(
        params: AvatarParams,
        buffers: AvatarBuffers,
        opt_state,
        cache,               # CanonicalCache (betas usually frozen)
        batch: dict,         # rgb (3,H,W), mask (H,W), idx ()
        rng: jax.Array,
        step: jax.Array,
        active_sh_degree: jax.Array,
        region_lap_pos: RegionLaplacian,
        region_lap_color: RegionLaplacian,
        lap_pos_w: jax.Array,     # (R,) region weights
        lap_color_w: jax.Array,
        edge_stat: jax.Array | None = None,  # (capacity,) precomputed
        # chunk-head KNN statistic (knn_backend="chunk"); None = compute
        # per-step with the configured backend
    ):
        k_bg, k_photo = jax.random.split(rng)
        bg = jax.random.uniform(k_bg, (3,))
        opt_geo = step >= step_cfg.opt_geo_from
        opt_app = step >= step_cfg.opt_app_from
        deg_mask = sh_degree_mask(active_sh_degree)

        def loss_fn(params, probe):
            out = avatar_forward(
                params, buffers, avatar_cfg, template, cache,
                smpl_scale=batch.get("smpl_scale"),
                dataset_idx=batch["idx"],
            )
            # decoder warmup gates (value-identical outside the window)
            for k in ("xyz_canon", "xyz_offsets", "scales", "scales_canon"):
                out[k] = _gate_grad(out[k], opt_geo)
            for k in ("shs", "opacity"):
                out[k] = _gate_grad(out[k], opt_app)

            shs = out["shs"] * deg_mask[None, :, None]
            pkg = rasterize(
                out["xyz"], out["scales"], out["rotq"],
                out["opacity"][:, 0], shs, camera,
                sh_degree=3, bg=bg, alive=buffers.alive > 0.5,
                screen_probe=probe, backend="pallas", **raster_kw,
            )
            # NO clamp: the reference trains l1/ssim on the raw render
            # (loss.py:53-68; lpips patches alone are clip(max=1), done
            # inside photometric_loss). Clamping here zeroed the
            # corrective gradient once a channel left [0,1] and made
            # color runaway ABSORBING — SH dc diverged to +-20 over a
            # full recipe (round-2 run 1; see ROUND2.md).
            render = pkg["render"]

            photo, photo_d = photometric_loss(
                k_photo, render, batch["rgb"], batch["mask"], bg,
                w.photometric, lpips,
            )
            if w.silhouette != 0:
                sil = 1.0 - pkg["transmittance"]
                l_sil = jnp.mean((sil - batch["mask"]) ** 2)
                photo = photo + w.silhouette * l_sil
                photo_d = dict(photo_d, sil=w.silhouette * l_sil)

            alive = buffers.alive
            # Zero-weight terms are dropped at TRACE time: `0.0 * x`
            # cannot be folded by XLA (0*inf is nan), so without the
            # python gate a disabled term still costs its full subtree.
            zero = jnp.float32(0.0)
            # reference: the opacity norm term joins only after density
            # control ends (gs_trainer.py:356-360)
            use_op_norm = step >= step_cfg.opacity_norm_from
            reg_with_op = l2_norm_loss(w.l2, out["xyz_offsets"],
                                       out["scales"], out["opacity"], alive)
            reg_no_op = l2_norm_loss(w.l2, out["xyz_offsets"], out["scales"],
                                     None, alive)
            reg = jnp.where(use_op_norm, reg_with_op, reg_no_op)

            edge = zero if w.mesh_edge == 0 else w.mesh_edge * mesh_edge_loss(
                jax.lax.stop_gradient(out["xyz_canon"]), buffers.edges,
                buffers.edge_valid)
            if w.gaussian_connect == 0:
                connect = zero
            elif edge_stat is not None:
                connect = w.gaussian_connect * gaussians_edge_loss_from_stat(
                    edge_stat, out["scales"], alive)
            else:
                connect = w.gaussian_connect * gaussians_edge_loss(
                    jax.lax.stop_gradient(out["xyz_canon"]),
                    out["scales"], alive, k=step_cfg.knn_k,
                    backend=("dense" if step_cfg.knn_backend == "chunk"
                             else step_cfg.knn_backend))

            # position + hand laplacians share region_lap_pos's table:
            # fuse them into one neighbor gather / band matvec
            # (loss_fused). With lap_shared the color term joins too —
            # one table stream instead of two.
            pos_terms = []
            if w.lap_position_strength != 0:
                pos_terms.append((out["xyz_anchor_canon"], lap_pos_w, None))
            if w.hand_lap_weight * w.hand_strength != 0:
                pos_terms.append((out["xyz_canon"],
                                  jnp.ones_like(lap_pos_w), [6, 7]))
            color_on = w.lap_color_strength != 0
            if color_on and step_cfg.lap_shared:
                pos_terms.append((out["shs"][:, 0], lap_color_w, None))
            fused = (region_lap_pos.loss_fused(pos_terms) if pos_terms
                     else [])
            lap_pos = (fused.pop(0) if w.lap_position_strength != 0
                       else zero)
            hand_raw = fused.pop(0) if w.hand_lap_weight * w.hand_strength \
                != 0 else zero
            if color_on:
                lap_color = (fused.pop(0) if step_cfg.lap_shared
                             else region_lap_color.loss(
                                 out["shs"][:, 0], lap_color_w))
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
                "render": render,
                **{f"photo_{k}": v for k, v in photo_d.items()},
            }
            return total, aux

        probe0 = jnp.zeros((avatar_cfg.capacity, 2))
        (loss, aux), (grads, probe_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, probe0)

        # non-finite guard: a loss spike that overflows to inf/nan (e.g.
        # right after a large densification) must not poison the
        # parameters or the Adam moments — the whole update is skipped
        # for that step. Costs one fused reduction; reported as
        # metrics['skipped'].
        finite = jnp.isfinite(loss)
        for g in jax.tree.leaves(grads):
            finite &= jnp.all(jnp.isfinite(g))

        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda new, old: jax.tree.map(  # noqa: E731
            lambda a, b: jnp.where(finite, a, b), new, old)
        params = keep(new_params, params)
        opt_state = keep(new_opt_state, opt_state)

        # density-control statistics (gs_trainer.py:486-492,
        # sings_hybrid.py:1013-1015)
        visible = aux.pop("visible")
        radii = aux.pop("radii").astype(jnp.float32)
        acc = visible & finite
        buffers = buffers._replace(
            max_radii2d=jnp.where(
                acc, jnp.maximum(buffers.max_radii2d, radii),
                buffers.max_radii2d),
            xyz_grad_accum=buffers.xyz_grad_accum + jnp.where(
                acc, jnp.linalg.norm(probe_grad, axis=-1), 0.0),
            grad_denom=buffers.grad_denom + acc.astype(jnp.float32),
        )
        render = aux.pop("render")
        metrics = {k: v for k, v in aux.items()}
        metrics["skipped"] = (~finite).astype(jnp.float32)
        return params, buffers, opt_state, metrics, render

    return train_step_body


def make_train_scan(train_step_inner, stat_fn=None):
    """Chain several training steps in one dispatch via lax.scan.

    Host<->device dispatch latency (tens of ms on tunneled TPU
    backends, and nonzero everywhere) would otherwise bound the step
    rate; scanning K steps amortizes it K-fold. Density control and
    periodic host work happen between scan chunks, so callers pick K to
    align with the next schedule boundary.

    train_step_inner must be the UNJITTED step body with signature
    (params, buffers, opt_state, cache, batch, rng, step, sh_deg,
     lap_pos, lap_color, lap_pos_w, lap_color_w) -> (params, buffers,
     opt_state, metrics, render).

    stat_fn (optional): (params, buffers) -> (capacity,) KNN edge
    statistic, evaluated ONCE at the chunk head and held constant for
    every step in the chunk (knn_backend="chunk" amortization).
    """
    @functools.partial(jax.jit, static_argnums=(), donate_argnums=(0, 1, 2))
    def scan_steps(params, buffers, opt_state, cache, batches, rngs,
                   step0, active_sh_degree, region_lap_pos,
                   region_lap_color, lap_pos_w, lap_color_w):
        es = stat_fn(params, buffers) if stat_fn is not None else None

        def body(carry, x):
            params, buffers, opt_state, i = carry
            batch, rng = x
            params, buffers, opt_state, metrics, _ = train_step_inner(
                params, buffers, opt_state, cache, batch, rng,
                step0 + i, active_sh_degree, region_lap_pos,
                region_lap_color, lap_pos_w, lap_color_w, edge_stat=es)
            return (params, buffers, opt_state, i + 1), metrics

        (params, buffers, opt_state, _), metrics = jax.lax.scan(
            body, (params, buffers, opt_state, jnp.int32(0)),
            (batches, rngs))
        # every metric is a scalar per step — (K,) arrays, negligible;
        # the per-term breakdown is what lets a loss spike/plateau be
        # attributed from the run log alone (round-3 lesson: a bare
        # total hid whether a 4x rise was photometric or regularizer)
        return (params, buffers, opt_state, metrics["loss"],
                metrics["skipped"], metrics)

    return scan_steps
