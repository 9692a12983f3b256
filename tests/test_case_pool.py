"""Simultaneous multi-case training pool (train/trainer_cases.py)."""
import os

import numpy as np
import pytest

KIT = "/root/reference/examples/training_kits/f_2"

BASE = [
    "dataset.downscale=8",
    "train.num_steps=3", "train.init_steps=5",
    "train.val_interval=2", "train.viz_interval=100000",
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
]

import pytest

pytestmark = pytest.mark.slow  # multi-minute mesh/e2e suite (--runslow)


def test_case_pool_two_cases(tmp_path):
    """(case=2, gs=4) pool on the bundled kit: per-frame params padded
    to the longest case, lockstep steps run, an event step (validate)
    executes per case, cases diverge (per-case rng), checkpoints and
    results land in each case's logdir."""
    if not os.path.isdir(KIT):
        pytest.skip("bundled kit missing")
    from sings_tpu.config.core import load_config
    from sings_tpu.config.defaults import DEFAULTS
    from sings_tpu.train.trainer_cases import CasePool

    cfgs = [
        load_config(DEFAULTS, None, BASE + [
            f"output_path={tmp_path}", f"exp_name=case{i}",
            f"dataset.max_frames={mf}",
        ])
        for i, mf in enumerate((8, 6))
    ]
    pool = CasePool(cfgs, gs=4)
    ta, tb = pool.trainers
    # shorter case padded to the longer one's frame axis
    assert ta.params.body_pose.shape == tb.params.body_pose.shape
    assert ta.params.body_pose.shape[0] == 8
    assert len(tb.kit.images) == 6  # data itself is not padded

    results = pool.train()
    assert pool.step == 3
    assert len(results) == 2  # same kit name deduped with #i
    for t in pool.trainers:
        assert os.path.exists(
            os.path.join(t.logdir_ckpt, "human_final.npz"))
        assert os.path.exists(
            os.path.join(t.logdir, "results_train.json"))
    # different frame draws + per-case rng folding -> cases diverge
    # (xyz gets photometric gradients from step 0; decoders are gated
    # until opt_geo_from/opt_app_from)
    assert not np.allclose(np.asarray(ta.params.xyz),
                           np.asarray(tb.params.xyz))
    for t in pool.trainers:
        for leaf in __import__("jax").tree.leaves(t.params):
            assert np.isfinite(np.asarray(leaf)).all()
