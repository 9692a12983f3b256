"""Kit contract writers/validator (preprocess/fit.py): round-trip
through the real kit loader, reference-format checks, and validation
against the bundled reference kit."""
import os

import numpy as np
import pytest

from sings_tpu.data.kit import load_smpl_param
from sings_tpu.preprocess.fit import (
    validate_kit, write_cameras_npz, write_poses_npz,
)

REF_KIT = "/root/reference/examples/training_kits/f_2"


def _write_frames(kit_dir, f=6, h=8, w=8):
    import cv2

    os.makedirs(os.path.join(kit_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(kit_dir, "masks"), exist_ok=True)
    for i in range(f):
        img = np.full((h, w, 3), 128, np.uint8)
        cv2.imwrite(os.path.join(kit_dir, "images", f"{i:06d}.png"), img)
        cv2.imwrite(os.path.join(kit_dir, "masks", f"{i:06d}.png"),
                    img[..., 0])


def test_writers_roundtrip_through_kit_loader(tmp_path):
    kit = str(tmp_path)
    f = 6
    rng = np.random.RandomState(0)
    betas_per_frame = rng.randn(f, 10).astype(np.float32)
    go = rng.randn(f, 3).astype(np.float32)
    bp = rng.randn(f, 69).astype(np.float32)
    tr = rng.randn(f, 3).astype(np.float32)

    path = write_poses_npz(kit, betas_per_frame, go, bp, tr)
    smpl = load_smpl_param(path)
    # mean-betas rule (fit_for_sings.py:259)
    np.testing.assert_allclose(smpl["betas"], betas_per_frame.mean(0),
                               atol=1e-6)
    np.testing.assert_allclose(smpl["body_pose"], bp)
    np.testing.assert_allclose(smpl["global_orient"], go)
    np.testing.assert_allclose(smpl["transl"], tr)

    write_cameras_npz(kit, height=8, width=8, focal=5000.0)
    cams = dict(np.load(os.path.join(kit, "score_demo_video",
                                     "cameras.npz")))
    assert cams["intrinsic"].shape == (3, 3)
    assert cams["intrinsic"][0, 0] == 5000.0
    assert cams["intrinsic"][0, 2] == 4.0  # default center = W/2
    np.testing.assert_allclose(cams["extrinsic"], np.eye(4))

    _write_frames(kit, f=f)
    info = validate_kit(kit)
    assert info["num_frames"] == f and not info["optimized_poses"]

    # optimized poses take precedence in validation
    write_poses_npz(kit, betas_per_frame, go, bp, tr, optimized=True)
    assert validate_kit(kit)["optimized_poses"]


def test_validate_kit_reports_problems(tmp_path):
    kit = str(tmp_path)
    _write_frames(kit, f=4)
    os.remove(os.path.join(kit, "masks", "000003.png"))
    with pytest.raises(ValueError) as e:
        validate_kit(kit)
    msg = str(e.value)
    assert "4 images vs 3 masks" in msg
    assert "poses.npz" in msg and "cameras.npz" in msg


def test_validate_kit_pose_frame_shortfall(tmp_path):
    kit = str(tmp_path)
    f = 5
    _write_frames(kit, f=f)
    rng = np.random.RandomState(1)
    write_poses_npz(kit, rng.randn(10), rng.randn(f - 2, 3),
                    rng.randn(f - 2, 69), rng.randn(f - 2, 3))
    write_cameras_npz(kit, height=8, width=8, focal=100.0)
    with pytest.raises(ValueError, match="pose frames"):
        validate_kit(kit)


@pytest.mark.skipif(not os.path.isdir(REF_KIT),
                    reason="bundled kit missing")
def test_bundled_reference_kit_validates():
    info = validate_kit(REF_KIT)
    assert info["num_frames"] > 0


def test_patch_phalp_smpl_cache(tmp_path):
    """Port of preprocess/patches/fix_phalp_smpl.py:1-15."""
    from sings_tpu.preprocess.fit import patch_phalp_smpl_cache

    src = tmp_path / "SMPL_NEUTRAL.pkl"
    src.write_bytes(b"pkl")
    tgt = patch_phalp_smpl_cache(str(src), cache_dir=str(tmp_path / "c"))
    assert open(tgt, "rb").read() == b"pkl"
    assert tgt.endswith("phalp/3D/models/smpl/SMPL_NEUTRAL.pkl")
