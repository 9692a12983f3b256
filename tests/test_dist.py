"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sings_tpu.dist.shard import camera_strip, make_mesh
from sings_tpu.ops.graphics import make_camera
from sings_tpu.ops.rasterizer.api import rasterize

import pytest

pytestmark = pytest.mark.slow  # multi-minute mesh/e2e suite (--runslow)


def make_scene(n=40, hw=64):
    rng = np.random.RandomState(0)
    cam = make_camera(np.eye(4), height=hw, width=hw, fovx=0.9, fovy=0.9)
    means = jnp.asarray(np.stack([
        rng.uniform(-0.6, 0.6, n), rng.uniform(-0.6, 0.6, n),
        rng.uniform(2.0, 6.0, n)], -1).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.02, 0.12, (n, 3)).astype(np.float32))
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opac = jnp.asarray(rng.uniform(0.3, 1.0, n).astype(np.float32))
    rgb = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    return cam, means, scales, quats, opac, rgb


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["gs"] == 8


def test_camera_strip_matches_full_render():
    cam, means, scales, quats, opac, rgb = make_scene()
    kw = dict(tile=16, chunk=8, max_span=8, interpret=True)
    bg = jnp.asarray([0.2, 0.4, 0.6])
    full = rasterize(means, scales, quats, opac, rgb, cam, bg=bg,
                     backend="pallas", **kw)["render"]
    strips = []
    for i in range(4):
        sc = camera_strip(cam, i * 16, 16)
        strips.append(
            rasterize(means, scales, quats, opac, rgb, sc, bg=bg,
                      backend="pallas", **kw)["render"])
    tiled = jnp.concatenate(strips, axis=1)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               atol=2e-4)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def _sharded_setup():
    import __graft_entry__ as ge
    from sings_tpu.losses.lpips import init_random
    from sings_tpu.losses.photometric import PhotometricWeights
    from sings_tpu.train.step import LossWeights, StepConfig

    tpl, dt, cache, cfg, state, camera = ge._tiny_setup()
    # max_span=8 >= the tile grid: no center-cropping, so strip and
    # full renders see identical per-tile pair lists. main_width=64
    # (= max_span^2) makes the backward glue exact — the default
    # narrow prefix + tail table drops overflowed-tail gradients
    # (tiles.py contract), which hits the full image and the strips
    # asymmetrically and would skew the gs=1 vs gs=4 comparison.
    kw = dict(ge._raster_kw(), max_span=8, main_width=64)
    _, region_lap, lap_w = ge._dryrun_pieces(state, camera)
    step_cfg = StepConfig(
        weights=LossWeights(photometric=PhotometricWeights(
            lpips=1.0, num_patches=4, patch_size=32, grad_pyramid=0.2),
            silhouette=0.5),
        opt_geo_from=0, opt_app_from=0, opacity_norm_from=0,
    )
    lpips_params = init_random(jax.random.PRNGKey(7))
    return (dt, cache, cfg, state, camera, kw, step_cfg, lpips_params,
            region_lap, lap_w)


def _srl(region_lap, n_gs):
    from sings_tpu.losses.regularizers import shard_region_laplacian

    return shard_region_laplacian(region_lap, n_gs)


def _make_batch(camera, dp):
    h, w = camera.height, camera.width
    return {
        "rgb": jnp.tile(jnp.zeros((1, 3, h, w)).at[:, 1].set(0.4), (dp, 1, 1, 1)),
        "mask": jnp.ones((dp, h, w)),
        "idx": jnp.zeros((dp,), jnp.int32),
        "smpl_scale": jnp.ones((dp, 1)),
    }


def test_sharded_mesh11_matches_single_chip_step():
    """At mesh (1,1) the full-objective sharded step reproduces
    train/step.py's train_step_body: same loss components, same density
    stats, and — with sgd(1.0), where param deltas equal -gradients —
    the same gradients for every leaf (incl. the LPIPS patch path)."""
    import optax

    from sings_tpu.dist.shard import make_mesh, replicate, shard_batch
    from sings_tpu.dist.train_sharded import make_sharded_train_step
    from sings_tpu.train.step import make_train_step

    (dt, cache, cfg, state, camera, kw, step_cfg, lpips_params,
     region_lap, lap_w) = _sharded_setup()
    tx = optax.sgd(1.0)
    rng = jax.random.PRNGKey(3)
    batch = _make_batch(camera, 1)

    # single-chip reference (the sharded step folds rng by dp index)
    body = jax.jit(make_train_step(cfg, step_cfg, dt, camera, tx,
                                   lpips_params, kw))
    frame = jax.tree.map(lambda x: x[0], batch)
    p1, b1, o1, m1, _ = body(
        state.params, state.buffers, tx.init(state.params), cache, frame,
        jax.random.fold_in(rng, 0), jnp.asarray(0), jnp.asarray(0),
        region_lap, region_lap, lap_w, lap_w)

    mesh = make_mesh(1)
    step = make_sharded_train_step(mesh, cfg, step_cfg, dt, camera, tx,
                                   lpips_params, kw)
    with mesh:
        p2, b2, o2, m2 = step(
            replicate(state.params, mesh), replicate(state.buffers, mesh),
            tx.init(state.params), replicate(cache, mesh),
            shard_batch(batch, mesh), rng, 0, 0,
            _srl(region_lap, 1), _srl(region_lap, 1),
            replicate(lap_w, mesh), replicate(lap_w, mesh))

    for k in ("loss", "photo", "reg_l2", "connect", "lap_pos", "lap_color",
              "photo_l1", "photo_ssim", "photo_lpips_patch", "photo_sil",
              "photo_grad_pyr", "skipped"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]), rtol=2e-4,
                                   atol=1e-7, err_msg=k)
    # param deltas == -grads under sgd(1.0): compare every leaf
    for (path, a1), a2, a0 in zip(
            jax.tree_util.tree_flatten_with_path(p1)[0],
            jax.tree.leaves(p2), jax.tree.leaves(state.params)):
        g1 = np.asarray(a0) - np.asarray(a1)
        g2 = np.asarray(a0) - np.asarray(a2)
        assert not np.isnan(g1).any(), f"NaN grads {path}"
        scale = max(np.abs(g1).max(), 1e-12)
        np.testing.assert_allclose(
            g2, g1, rtol=1e-3, atol=1e-4 * scale,
            err_msg=jax.tree_util.keystr(path))
    # density-control stats (probe-gradient path)
    np.testing.assert_allclose(np.asarray(b2.xyz_grad_accum),
                               np.asarray(b1.xyz_grad_accum),
                               rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(np.asarray(b2.max_radii2d),
                               np.asarray(b1.max_radii2d), atol=1e-4)


def test_sharded_step_gs4_dp2():
    """Full mesh (2,4): loss value matches (1,1) within decomposition
    noise, nothing skipped, update is deterministic."""
    import optax

    from sings_tpu.dist.shard import make_mesh, replicate, shard_batch
    from sings_tpu.dist.train_sharded import make_sharded_train_step

    (dt, cache, cfg, state, camera, kw, step_cfg, lpips_params,
     region_lap, lap_w) = _sharded_setup()
    tx = optax.adam(1e-3)
    rng = jax.random.PRNGKey(3)

    def run(dp, gs):
        mesh = make_mesh(dp * gs, dp=dp)
        step = make_sharded_train_step(mesh, cfg, step_cfg, dt, camera, tx,
                                       lpips_params, kw)
        batch = _make_batch(camera, dp)
        with mesh:
            p, b, o, m = step(
                replicate(state.params, mesh), replicate(state.buffers, mesh),
                tx.init(state.params), replicate(cache, mesh),
                shard_batch(batch, mesh), rng, 0, 0,
                _srl(region_lap, gs), _srl(region_lap, gs),
                replicate(lap_w, mesh), replicate(lap_w, mesh))
        return jax.tree.map(np.asarray, (p, m))

    p11, m11 = run(1, 1)
    p24, m24 = run(2, 4)
    p24b, m24b = run(2, 4)
    # identical frames in the batch -> dp only changes rng folding of
    # the background color; compare loss loosely, determinism tightly
    assert np.isfinite(m24["loss"])
    assert m24["skipped"] == 0.0
    np.testing.assert_allclose(m24["loss"], m11["loss"], rtol=0.2)
    np.testing.assert_allclose(m24b["loss"], m24["loss"], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p24), jax.tree.leaves(p24b)):
        np.testing.assert_array_equal(a, b)


def test_sharded_gs4_grads_match_gs1():
    """gs=4 gradients == gs=1 gradients (dp=1, same frame/rng).

    max_span=8 keeps the strip and full tile decompositions identical
    pair-for-pair; remaining differences are reduction reassociation
    plus T_EPS early-exit flips for deeply-occluded gaussians, so small
    leaves get a scale-aware tolerance."""
    from sings_tpu.dist.shard import make_mesh, replicate, shard_batch
    from sings_tpu.dist.train_sharded import make_sharded_train_step
    import optax

    (dt, cache, cfg, state, camera, kw, step_cfg, lpips_params,
     region_lap, lap_w) = _sharded_setup()
    tx = optax.sgd(1.0)
    rng = jax.random.PRNGKey(3)
    batch = _make_batch(camera, 1)

    def grads(gs):
        mesh = make_mesh(gs, dp=1)
        step = make_sharded_train_step(mesh, cfg, step_cfg, dt, camera, tx,
                                       lpips_params, kw)
        with mesh:
            loss, g = step.grads_fn(
                replicate(state.params, mesh), replicate(state.buffers, mesh),
                replicate(cache, mesh), shard_batch(batch, mesh), rng,
                jnp.asarray(0), jnp.asarray(0),
                _srl(region_lap, gs), _srl(region_lap, gs),
                replicate(lap_w, mesh), replicate(lap_w, mesh))
        return float(loss), jax.tree.map(np.asarray, g)

    l1_, g1 = grads(1)
    l4_, g4 = grads(4)
    np.testing.assert_allclose(l4_, l1_, rtol=5e-4)
    for (path, b), a in zip(jax.tree_util.tree_flatten_with_path(g1)[0],
                            jax.tree.leaves(g4)):
        b = np.asarray(b)
        assert not np.isnan(b).any(), f"NaN grads {path}"
        scale = max(np.abs(b).max(), 1e-12)
        # loose: T_EPS decomposition sensitivity (see docstring)
        np.testing.assert_allclose(
            a, b, rtol=0.05, atol=0.05 * scale,
            err_msg=jax.tree_util.keystr(path))


def _perturb(params, eps=0.02):
    return jax.tree.map(
        lambda x: x * (1.0 + eps) + 0.001
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)


def test_case_step_matches_single_chip_per_case():
    """(case=2, gs=1) mesh: each case's update equals the single-chip
    step run on that case's params with the case-folded rng."""
    import optax

    from sings_tpu.dist.train_cases import (
        camera_arrays, make_case_mesh, make_case_train_step, shard_cases,
        stack_cases)
    from sings_tpu.train.step import make_train_step

    (dt, cache, cfg, state, camera, kw, step_cfg, lpips_params,
     region_lap, lap_w) = _sharded_setup()
    tx = optax.sgd(1.0)
    rng = jax.random.PRNGKey(5)
    frame = jax.tree.map(lambda x: x[0], _make_batch(camera, 1))
    cases_params = [state.params, _perturb(state.params)]

    body = jax.jit(make_train_step(cfg, step_cfg, dt, camera, tx,
                                   lpips_params, kw))
    refs = []
    for c, p in enumerate(cases_params):
        p1, b1, o1, m1, _ = body(
            p, state.buffers, tx.init(p), cache, frame,
            jax.random.fold_in(rng, c), jnp.asarray(0), jnp.asarray(0),
            region_lap, region_lap, lap_w, lap_w)
        refs.append((p1, b1, m1))

    mesh = make_case_mesh(2, 1)
    step = make_case_train_step(mesh, cfg, step_cfg, dt, camera.height,
                                camera.width, tx, lpips_params, kw)
    sp = stack_cases(cases_params)
    with mesh:
        p2, b2, o2, m2 = step(
            shard_cases(sp, mesh),
            shard_cases(stack_cases([state.buffers] * 2), mesh),
            shard_cases(jax.vmap(tx.init)(sp), mesh),
            shard_cases(stack_cases([cache] * 2), mesh),
            shard_cases(stack_cases([camera_arrays(camera)] * 2), mesh),
            shard_cases(stack_cases([frame] * 2), mesh),
            rng, 0, 0,
            shard_cases(stack_cases([_srl(region_lap, 1)] * 2), mesh),
            shard_cases(stack_cases([_srl(region_lap, 1)] * 2), mesh),
            lap_w, lap_w)

    for c in range(2):
        p1, b1, m1 = refs[c]
        for k in ("loss", "photo", "reg_l2", "connect", "lap_pos",
                  "lap_color", "skipped"):
            np.testing.assert_allclose(
                float(np.asarray(m2[k])[c]), float(m1[k]), rtol=2e-4,
                atol=1e-7, err_msg=f"case {c}: {k}")
        for (path, a1), a2 in zip(
                jax.tree_util.tree_flatten_with_path(p1)[0],
                jax.tree.leaves(p2)):
            a1, a2 = np.asarray(a1), np.asarray(a2)[c]
            scale = max(np.abs(a1).max(), 1e-12)
            np.testing.assert_allclose(
                a2, a1, rtol=1e-3, atol=1e-4 * scale,
                err_msg=f"case {c}: {jax.tree_util.keystr(path)}")
        # probe-grad norms span 1e-8..1e-5 within one case; tiny
        # elements carry f32 reduction-order noise up to ~1% of
        # themselves run-to-run (XLA:CPU threading), so the atol is the
        # same relative-to-tensor-max floor the params assertion uses
        # (a fixed 1e-9 atol flaked on single 1e-8-magnitude elements)
        ga1 = np.asarray(b1.xyz_grad_accum)
        np.testing.assert_allclose(
            np.asarray(b2.xyz_grad_accum)[c], ga1, rtol=3e-3,
            atol=1e-4 * max(float(np.abs(ga1).max()), 1e-12))


def test_case_step_with_gs_axis():
    """(case=2, gs=4) mesh: strips + per-case states, finite losses,
    deterministic across reruns."""
    import optax

    from sings_tpu.dist.train_cases import (
        camera_arrays, make_case_mesh, make_case_train_step, shard_cases,
        stack_cases)

    (dt, cache, cfg, state, camera, kw, step_cfg, lpips_params,
     region_lap, lap_w) = _sharded_setup()
    tx = optax.adam(1e-3)
    rng = jax.random.PRNGKey(5)
    frame = jax.tree.map(lambda x: x[0], _make_batch(camera, 1))
    sp = stack_cases([state.params, _perturb(state.params)])

    mesh = make_case_mesh(2, 4)
    step = make_case_train_step(mesh, cfg, step_cfg, dt, camera.height,
                                camera.width, tx, lpips_params, kw)

    def run():
        with mesh:
            return jax.tree.map(np.asarray, step(
                shard_cases(sp, mesh),
                shard_cases(stack_cases([state.buffers] * 2), mesh),
                shard_cases(jax.vmap(tx.init)(sp), mesh),
                shard_cases(stack_cases([cache] * 2), mesh),
                shard_cases(stack_cases([camera_arrays(camera)] * 2), mesh),
                shard_cases(stack_cases([frame] * 2), mesh),
                rng, 0, 0,
                shard_cases(stack_cases([_srl(region_lap, 4)] * 2), mesh),
                shard_cases(stack_cases([_srl(region_lap, 4)] * 2), mesh),
                lap_w, lap_w))

    p, b, o, m = run()
    assert m["loss"].shape == (2,)
    assert np.isfinite(m["loss"]).all()
    assert (m["skipped"] == 0).all()
    # different params + different rng folding -> cases differ
    assert m["loss"][0] != m["loss"][1]
    p2, _, _, m2 = run()
    np.testing.assert_array_equal(m2["loss"], m["loss"])
    for a, b_ in zip(jax.tree.leaves(p), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b_)


def test_trainer_on_mesh_smoke(tmp_path):
    """Full Trainer wired to a (dp=2, gs=4) mesh: a few optimizer
    updates on the bundled kit run end-to-end (decode+render sharded),
    losses stay finite, checkpointing works."""
    import os

    from sings_tpu.config.core import load_config
    from sings_tpu.config.defaults import DEFAULTS
    from sings_tpu.train.trainer import Trainer

    kit = "/root/reference/examples/training_kits/f_2"
    if not os.path.isdir(kit):
        pytest.skip("bundled kit missing")
    cfg = load_config(DEFAULTS, None, [
        f"output_path={tmp_path}", "exp_name=mesh_smoke",
        "dataset.downscale=8", "dataset.max_frames=8",
        "train.num_steps=3", "train.init_steps=5",
        "train.val_interval=100000", "train.viz_interval=100000",
        "train.save_ckpt_interval=100000",
        "human.n_subdivision=0", "human.sh_degree=0",
        "human.loss.lpips_w=0.0", "human.loss.patch_size=16",
        "human.kplanes.resolution=[16,16,16]",
        "human.kplanes.output_coordinate_dim=8",
        "human.kplanes.multires=[1,2]",
        "human.density_control.max_n_gaussians=4000",
        "human.density_control.min_n_gaussians=100",
        "tpu.smpl_model_dir=/nonexistent",
        "tpu.auto_fit_synthetic=False",
        "tpu.mesh.dp=2", "tpu.mesh.gs=4",
    ])
    trainer = Trainer(cfg)
    assert trainer.mesh is not None and trainer.mesh_dp == 2
    result = trainer.train()
    assert trainer.step == 3
    assert np.isfinite(result["psnr"])
    ckpt = os.path.join(trainer.logdir_ckpt, "human_final.npz")
    assert os.path.exists(ckpt)


def test_strip_ssim_matches_full():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from sings_tpu.dist.halo import strip_ssim
    from sings_tpu.dist.shard import make_mesh
    from sings_tpu.ops.ssim import ssim

    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.rand(3, 64, 32).astype(np.float32))
    gt = jnp.asarray(rng.rand(3, 64, 32).astype(np.float32))
    full = float(ssim(pred, gt))

    mesh = make_mesh(4, dp=1)  # gs=4 strips of 16 rows
    fn = shard_map(
        lambda p, g: strip_ssim(p, g, "gs"),
        mesh=mesh, in_specs=(P(None, "gs", None), P(None, "gs", None)),
        out_specs=P(), check_vma=False)
    with mesh:
        dist = float(fn(pred, gt))
    np.testing.assert_allclose(dist, full, rtol=1e-5)


def test_balanced_strips_grads_match_gs1():
    """Pair-balanced strips (unequal bounds + valid_rows ownership +
    bounded SSIM halo): gs=2 with bounds [0, 48, 64] must reproduce the
    gs=1 objective and gradients (same contract as the equal-strip
    test above)."""
    import optax

    from sings_tpu.dist.shard import make_mesh, replicate, shard_batch
    from sings_tpu.dist.train_sharded import make_sharded_train_step

    (dt, cache, cfg, state, camera, kw, step_cfg, lpips_params,
     region_lap, lap_w) = _sharded_setup()
    tx = optax.sgd(1.0)
    rng = jax.random.PRNGKey(3)
    batch = _make_batch(camera, 1)

    def grads(gs, bounds=None, h_max=None):
        mesh = make_mesh(gs, dp=1)
        step = make_sharded_train_step(
            mesh, cfg, step_cfg, dt, camera, tx, lpips_params, kw,
            strip_bounds=bounds, strip_h_max=h_max)
        with mesh:
            loss, g = step.grads_fn(
                replicate(state.params, mesh), replicate(state.buffers, mesh),
                replicate(cache, mesh), shard_batch(batch, mesh), rng,
                jnp.asarray(0), jnp.asarray(0),
                _srl(region_lap, gs), _srl(region_lap, gs),
                replicate(lap_w, mesh), replicate(lap_w, mesh))
        return float(loss), jax.tree.map(np.asarray, g)

    l1_, g1 = grads(1)
    l2_, g2 = grads(2, bounds=np.asarray([0, 48, 64], np.int32), h_max=48)
    np.testing.assert_allclose(l2_, l1_, rtol=5e-4)
    for (path, b), a in zip(jax.tree_util.tree_flatten_with_path(g1)[0],
                            jax.tree.leaves(g2)):
        b = np.asarray(b)
        assert not np.isnan(b).any(), f"NaN grads {path}"
        scale = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(
            a, b, rtol=0.05, atol=0.05 * scale,
            err_msg=jax.tree_util.keystr(path))


def test_balanced_strip_bounds_helper():
    from sings_tpu.dist.shard import balanced_strip_bounds

    w = np.exp(-((np.arange(512) - 256) / 60.0) ** 2)
    b, hm = balanced_strip_bounds(w, 4, tile=16)
    assert b[0] == 0 and b[-1] == 512
    assert (np.diff(b) >= 16).all() and (b % 16 == 0).all()
    assert hm == np.diff(b).max()
    shares = [w[b[i]:b[i + 1]].sum() / w.sum() for i in range(4)]
    assert max(shares) < 0.35  # equal strips would give ~0.45+
    # uniform weights degrade to equal strips
    b2, hm2 = balanced_strip_bounds(np.ones(512), 4, tile=16)
    np.testing.assert_array_equal(b2, [0, 128, 256, 384, 512])


def test_bounded_halo_ssim_matches_full():
    """strip_ssim_local_bounded over unequal owned heights rank-sums to
    the full-image SSIM."""
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from sings_tpu.dist.halo import strip_ssim_local_bounded
    from sings_tpu.dist.shard import make_mesh
    from sings_tpu.ops.ssim import ssim as full_ssim

    rng = np.random.RandomState(0)
    h, wd = 64, 48
    a_full = jnp.asarray(rng.rand(3, h, wd).astype(np.float32))
    b_full = jnp.asarray(rng.rand(3, h, wd).astype(np.float32))
    bounds = np.asarray([0, 48, 64], np.int32)
    h_max = 48
    mesh = make_mesh(2, dp=1)

    # build each rank's window (owned rows + padding garbage)
    def window(x, k):
        y0 = bounds[k]
        win = jnp.zeros((3, h_max, wd)) + 0.777  # garbage padding
        own = x[:, y0:bounds[k + 1]]
        return win.at[:, : own.shape[1]].set(own)

    wins_a = jnp.stack([window(a_full, k) for k in range(2)])
    wins_b = jnp.stack([window(b_full, k) for k in range(2)])
    h_own = jnp.asarray(np.diff(bounds).astype(np.int32))

    @partial(shard_map, mesh=mesh, in_specs=(P("gs"), P("gs"), P("gs")),
             out_specs=P(), check_vma=False)
    def run(wa, wb, ho):
        local = strip_ssim_local_bounded(
            wa[0], wb[0], "gs", ho[0, 0], float(h * wd))
        return jax.lax.psum(jax.lax.pmean(local, "dp"), "gs")[None]

    got = float(run(wins_a, wins_b, h_own[:, None])[0])
    want = float(full_ssim(a_full, b_full))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
