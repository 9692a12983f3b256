"""Multi-avatar ("case") batch training over a (case, gs) device mesh.

The reference's "batch training" is a sequential shell loop of
single-case trainings (scripts/run_batch/train_batch.sh:33-38). The
TPU-native redesign trains C independent avatars SIMULTANEOUSLY: every
per-case quantity (params, buffers, optimizer state, canonical-pose
cache, camera, region laplacians, frames) is stacked on a leading case
axis and sharded over the mesh's "case" axis, while each case's
gaussian decode + strip rasterization splits over "gs" exactly like the
single-case sharded step (train_sharded.make_frame_loss — shared code).
Gradients psum over "gs" only; cases never communicate, so the case
axis rides DCN across hosts for free while gs stays on ICI.

Constraints: all cases share one AvatarConfig/StepConfig (same
capacity, same recipe) and one image resolution; heterogeneous kits
must be padded by the caller. Per-case region-laplacian tables must be
built with identical pad sizes (build_region_laplacian pad_to).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import numpy as np

from ..model.avatar import AvatarConfig
from ..ops.graphics import Camera
from ..train.step import StepConfig
from .train_sharded import make_frame_loss


def make_case_mesh(n_cases: int, gs: int = 1) -> Mesh:
    devs = jax.devices()
    assert len(devs) >= n_cases * gs, (
        f"need {n_cases * gs} devices, have {len(devs)}")
    arr = np.array(devs[: n_cases * gs]).reshape(n_cases, gs)
    return Mesh(arr, axis_names=("case", "gs"))


def stack_cases(trees):
    """Stack a list of per-case pytrees on a new leading case axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def camera_arrays(camera: Camera) -> dict:
    """Traceable array fields of a camera (height/width stay static)."""
    f32 = jnp.float32
    return {
        "view": jnp.asarray(camera.view, f32),
        "proj": jnp.asarray(camera.proj, f32),
        "cam_center": jnp.asarray(camera.cam_center, f32),
        "tan_fovx": jnp.asarray(camera.tan_fovx, f32),
        "tan_fovy": jnp.asarray(camera.tan_fovy, f32),
    }


def shard_cases(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P("case")))


def make_case_train_step(
    mesh: Mesh,
    avatar_cfg: AvatarConfig,
    step_cfg: StepConfig,
    template,
    height: int,
    width: int,
    tx: optax.GradientTransformation,
    lpips_params,
    raster_kw: dict,
):
    """Build step(params, buffers, opt_states, caches, cam_arrays,
    batch, rng, step, active_sh_degree, region_lap_pos, region_lap_color,
    lap_pos_w, lap_color_w) -> (params, buffers, opt_states, metrics).

    Every argument except (rng, step, active_sh_degree, lap_*_w) leads
    with the case axis (use stack_cases / jax.vmap(tx.init)); outputs
    keep it, metrics are per-case. The template and the lap weight
    vectors are shared across cases.
    """
    n_gs = mesh.shape["gs"]
    frame_loss = make_frame_loss(
        avatar_cfg, step_cfg, template, height, width, n_gs,
        lpips_params, raster_kw)

    def per_device(params, buffers, opt_state, cache, cam, batch, rng,
                   step, active_sh_degree, region_lap_pos, region_lap_color,
                   lap_pos_w, lap_color_w):
        # per-case inputs arrive with a local leading case axis of 1
        sq = lambda t: jax.tree.map(lambda x: x[0], t)  # noqa: E731
        params, buffers, opt_state, cache = (
            sq(params), sq(buffers), sq(opt_state), sq(cache))
        cam, frame = sq(cam), sq(batch)
        region_lap_pos, region_lap_color = sq(region_lap_pos), sq(
            region_lap_color)
        camera = Camera(
            view=cam["view"], proj=cam["proj"],
            cam_center=cam["cam_center"], height=height, width=width,
            tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
        )

        strip_idx = jax.lax.axis_index("gs")
        rng_c = jax.random.fold_in(rng, jax.lax.axis_index("case"))
        k_bg, k_photo = jax.random.split(rng_c)

        probe0 = jnp.zeros((avatar_cfg.capacity, 2))
        (loss_local, aux), (grads, probe_grad) = jax.value_and_grad(
            lambda p, pr: frame_loss(
                p, pr, buffers, cache, camera, frame, k_bg, k_photo, step,
                active_sh_degree, region_lap_pos, region_lap_color,
                lap_pos_w, lap_color_w, strip_idx),
            argnums=(0, 1), has_aux=True,
        )(params, probe0)

        # cases are independent: reduce over "gs" only
        loss = jax.lax.psum(loss_local, "gs")
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "gs"), grads)

        finite = jnp.isfinite(loss)
        for g in jax.tree.leaves(grads):
            finite &= jnp.all(jnp.isfinite(g))

        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda new, old: jax.tree.map(  # noqa: E731
            lambda a, b: jnp.where(finite, a, b), new, old)
        params = keep(new_params, params)
        opt_state = keep(new_opt_state, opt_state)

        # density-control statistics (same conventions as the
        # single-case sharded step, per case)
        probe_g = jax.lax.psum(probe_grad, "gs") * jnp.asarray(
            [1.0, float(n_gs)])
        visible = jax.lax.pmax(
            aux.pop("visible").astype(jnp.float32), "gs") > 0.5
        radii = jax.lax.pmax(aux.pop("radii").astype(jnp.float32), "gs")
        acc = visible & finite
        buffers = buffers._replace(
            max_radii2d=jnp.where(
                acc, jnp.maximum(buffers.max_radii2d, radii),
                buffers.max_radii2d),
            xyz_grad_accum=buffers.xyz_grad_accum + jnp.where(
                acc, jnp.linalg.norm(probe_g, axis=-1), 0.0),
            grad_denom=buffers.grad_denom + acc.astype(jnp.float32),
        )

        metrics = {k: jax.lax.psum(v, "gs") for k, v in aux.items()}
        metrics["loss"] = loss
        metrics["skipped"] = (~finite).astype(jnp.float32)

        ex = lambda t: jax.tree.map(lambda x: x[None], t)  # noqa: E731
        return ex(params), ex(buffers), ex(opt_state), ex(metrics)

    C = P("case")
    CG = P("case", "gs")  # stacked ShardedRegionLaplacian tables
    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(C, C, C, C, C, C, P(), P(), P(), CG, CG, P(), P()),
        out_specs=(C, C, C, C),
        check_vma=False,
    )

    @jax.jit
    def step(params, buffers, opt_states, caches, cam_arrays, batch, rng,
             step_idx, active_sh_degree, region_lap_pos, region_lap_color,
             lap_pos_w, lap_color_w):
        return sharded(params, buffers, opt_states, caches, cam_arrays,
                       batch, rng, jnp.asarray(step_idx),
                       jnp.asarray(active_sh_degree), region_lap_pos,
                       region_lap_color, lap_pos_w, lap_color_w)

    return step
