"""End-to-end training smoke: a few steps on the bundled reference kit
with the synthetic body template, downscaled images, CPU interpret-mode
rasterizer. Verifies the full pipeline (data -> avatar -> pallas render
-> losses -> optax update -> checkpoint round-trip) and that the loss
decreases.
"""
import os

import numpy as np
import pytest

from sings_tpu.config.core import load_config
from sings_tpu.config.defaults import DEFAULTS

KIT = "/root/reference/examples/training_kits/f_2"

import pytest

pytestmark = pytest.mark.slow  # multi-minute mesh/e2e suite (--runslow)


def make_cfg(tmp_path, steps=6):
    overrides = [
        f"output_path={tmp_path}",
        "exp_name=smoke",
        "dataset.downscale=8",
        "dataset.max_frames=8",
        f"train.num_steps={steps}",
        "train.init_steps=20",
        "train.val_interval=100000",
        "train.viz_interval=100000",
        "train.save_ckpt_interval=100000",
        "human.n_subdivision=0",
        "human.sh_degree=0",
        "human.optim_pose=True",
        "human.optim_trans=True",
        "human.disable_posedirs=True",
        "human.body_template=smplh",
        "human.loss.lpips_w=0.0",
        "human.loss.patch_size=16",
        "human.kplanes.resolution=[16,16,16]",
        "human.kplanes.output_coordinate_dim=8",
        "human.kplanes.multires=[1,2]",
        "human.density_control.max_n_gaussians=4000",
        "human.density_control.min_n_gaussians=100",
        "tpu.smpl_model_dir=/nonexistent",
        "tpu.inner_steps=1",  # per-step hooks in these tests
        "tpu.auto_fit_synthetic=False",  # keep smoke tests fast
    ]
    return load_config(DEFAULTS, None, overrides)


@pytest.mark.skipif(not os.path.isdir(KIT), reason="bundled kit missing")
def test_train_smoke(tmp_path):
    from sings_tpu.train.trainer import Trainer

    cfg = make_cfg(str(tmp_path), steps=6)
    # exercise the test-time val-pose refinement path (2 steps; the
    # extra psnr_masked_refined metric must appear and be finite)
    cfg.tpu.val_pose_refine_steps = 2
    trainer = Trainer(cfg)
    assert trainer.tpl.name == "synthetic"
    assert trainer.camera.width == 64 and trainer.camera.height == 112

    losses = []
    orig_step = trainer.train_step

    def wrapped(*a, **k):
        out = orig_step(*a, **k)
        losses.append(float(out[3]["loss"]))
        return out

    trainer.train_step = wrapped
    result = trainer.train()
    assert np.isfinite(losses).all()
    assert "psnr" in result and np.isfinite(result["psnr"])
    assert "psnr_masked_refined" in result \
        and np.isfinite(result["psnr_masked_refined"])
    # gauge-aligned val metric (train-frame-only drift correction)
    assert "psnr_masked_aligned" in result \
        and np.isfinite(result["psnr_masked_aligned"])
    # checkpoint written and loadable
    ckpt = os.path.join(trainer.logdir_ckpt, "human_final.npz")
    assert os.path.exists(ckpt)
    trainer2 = Trainer(cfg)  # auto-resumes from the final checkpoint
    assert trainer2.step == trainer.step

    # export paths work
    trainer.visualize("smoke")
    ply = os.path.join(trainer.logdir, "meshes", "human_pcd_smoke_splat.ply")
    assert os.path.getsize(ply) > 1000
    from sings_tpu.export.ply import load_ply

    back = load_ply(ply)
    n_alive = int(np.asarray(trainer.buffers.alive).sum())
    assert back["xyz"].shape == (n_alive, 3)


@pytest.mark.skipif(not os.path.isdir(KIT), reason="bundled kit missing")
def test_ckpt_capacity_mismatch_falls_back(tmp_path):
    """A checkpoint written at a different gaussian capacity must be
    ignored with a warning (train-from-scratch), not crash mid-step —
    reference parity: sings_hybrid.py:201-237 graceful fallback."""
    from sings_tpu.train.trainer import Trainer

    cfg = make_cfg(str(tmp_path), steps=2)
    trainer = Trainer(cfg)
    trainer.train()
    assert trainer.step == 2

    cfg2 = make_cfg(str(tmp_path), steps=2)
    cfg2.human.density_control.max_n_gaussians = 2000  # capacity changes
    trainer2 = Trainer(cfg2)  # auto-resume finds the old ckpt -> ignored
    assert trainer2.step == 0
    assert trainer2.avatar_cfg.capacity != trainer.avatar_cfg.capacity

    # eval/animate with an incompatible ckpt must fail loudly instead
    cfg3 = make_cfg(str(tmp_path), steps=2)
    cfg3.human.density_control.max_n_gaussians = 2000
    cfg3.eval = True
    with pytest.raises(RuntimeError, match="incompatible"):
        Trainer(cfg3, mode="eval")


@pytest.mark.skipif(not os.path.isdir(KIT), reason="bundled kit missing")
def test_loss_decreases_overfit_one_frame(tmp_path):
    """Longer single-frame overfit: the photometric loss must drop."""
    from sings_tpu.train.trainer import Trainer

    cfg = make_cfg(str(tmp_path), steps=30)
    cfg.dataset.max_frames = 3
    cfg.human.opt_geo_from = 0
    cfg.human.opt_app_from = 0
    cfg.human.loss.laplacian.position_strength = 1.0
    cfg.human.loss.mesh_edge = 0.0
    cfg.human.loss.gaussian_connect = 0.0
    trainer = Trainer(cfg)

    photos = []
    orig_step = trainer.train_step

    def wrapped(*a, **k):
        out = orig_step(*a, **k)
        photos.append(float(out[3]["photo"]))
        return out

    trainer.train_step = wrapped
    trainer.train()
    first = np.mean(photos[:5])
    last = np.mean(photos[-5:])
    assert last < first, (first, last)


@pytest.mark.skipif(not os.path.isdir(KIT), reason="bundled kit missing")
def test_nonfinite_step_is_skipped(tmp_path):
    """A batch that produces non-finite gradients (NaN pixels) must not
    change params or Adam state (step.py non-finite guard)."""
    import jax.numpy as jnp
    import jax

    from sings_tpu.train.trainer import Trainer

    cfg = make_cfg(str(tmp_path), steps=2)
    trainer = Trainer(cfg)
    frame = trainer.kit.train_split[0]
    batch = {
        "rgb": trainer.images[frame] * jnp.nan,
        "mask": trainer.masks[frame],
        "idx": jnp.asarray(frame),
        "smpl_scale": jnp.ones(1),
    }
    p0 = jax.tree.map(np.asarray, trainer.params)
    body = jax.jit(trainer.train_step_body)
    p, bu, opt, metrics, _ = body(
        trainer.params, trainer.buffers, trainer.opt_state, trainer.cache,
        batch, jax.random.PRNGKey(0), jnp.asarray(0), jnp.asarray(0),
        trainer.region_lap, trainer.region_lap,
        trainer.lap_pos_w, trainer.lap_color_w)
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p0)):
        np.testing.assert_array_equal(np.asarray(a), b)
    # a good batch on the same jitted body still updates
    batch["rgb"] = trainer.images[frame]
    p, bu, opt, metrics, _ = body(
        trainer.params, trainer.buffers, trainer.opt_state, trainer.cache,
        batch, jax.random.PRNGKey(0), jnp.asarray(0), jnp.asarray(0),
        trainer.region_lap, trainer.region_lap,
        trainer.lap_pos_w, trainer.lap_color_w)
    assert float(metrics["skipped"]) == 0.0
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.skipif(not os.path.isdir(KIT), reason="bundled kit missing")
def test_multi_step_scan_path(tmp_path):
    """inner_steps>1 fuses steps via lax.scan; must stay finite and
    advance the step counter correctly across event boundaries."""
    from sings_tpu.train.trainer import Trainer

    cfg = make_cfg(str(tmp_path), steps=12)
    cfg.tpu.inner_steps = 5
    trainer = Trainer(cfg)
    result = trainer.train()
    assert trainer.step == 12
    assert np.isfinite(result["psnr"])


@pytest.mark.skipif(not os.path.isdir(KIT), reason="bundled kit missing")
def test_banded_laplacian_backend(tmp_path):
    """Forced banded laplacian backend trains identically-shaped steps
    with finite losses (auto only enables it at >=32k capacity)."""
    from sings_tpu.train.trainer import Trainer

    cfg = make_cfg(str(tmp_path), steps=4)
    cfg.tpu.laplacian_backend = "banded"
    trainer = Trainer(cfg)
    from sings_tpu.losses.regularizers import BandedRegionLaplacian

    assert isinstance(trainer.region_lap, BandedRegionLaplacian)
    result = trainer.train()
    assert np.isfinite(result["psnr"])


@pytest.mark.skipif(not os.path.isdir(KIT), reason="bundled kit missing")
def test_banded_width_stable_across_rebuilds(tmp_path):
    """Repeated laplacian rebuilds (one per density event) must keep the
    band width — a compiled-shape input to the train step — constant.
    The r4 quality run hit a compounding-pad bug (the 12% headroom was
    derived from the PADDED width) that recompiled the full train step
    at every densify: widths 463 -> 519 -> 582 -> 652."""
    from sings_tpu.train.trainer import Trainer

    cfg = make_cfg(str(tmp_path), steps=2)
    cfg.tpu.laplacian_backend = "banded"
    trainer = Trainer(cfg)
    widths = [trainer.region_lap.band.shape[1]]
    for _ in range(3):
        trainer._rebuild_laplacians()
        widths.append(trainer.region_lap.band.shape[1])
    assert len(set(widths)) == 1, widths
