import os

import jax.numpy as jnp
import numpy as np

from sings_tpu.config.core import Config, load_config, parse_dotlist, save_config
from sings_tpu.config.defaults import DEFAULTS, parse_region_weights
from sings_tpu.data.kit import get_data_splits
from sings_tpu.export.ply import (
    load_ply, save_ellipsoid_mesh, save_ply, save_splat,
)
from sings_tpu.export.video import create_video


def test_config_merge_order(tmp_path):
    yaml_path = tmp_path / "r.yaml"
    yaml_path.write_text("train:\n  num_steps: 5\nhuman:\n  sh_degree: 1\n")
    cfg = load_config(DEFAULTS, str(yaml_path),
                      ["train.num_steps=7", "human.kplanes.multires=[1,2]"])
    assert cfg.train.num_steps == 7          # cli beats yaml
    assert cfg.human.sh_degree == 1          # yaml beats defaults
    assert cfg.human.kplanes.multires == [1, 2]
    assert cfg.human.kplanes.resolution == [64, 64, 64]  # default preserved


def test_dotlist_typing():
    d = parse_dotlist(["a.b=3", "a.c=0.5", "x=hello", "y=[1,2]", "z=True"])
    assert d["a"]["b"] == 3 and d["a"]["c"] == 0.5
    assert d["x"] == "hello" and d["y"] == [1, 2] and d["z"] is True


def test_config_roundtrip(tmp_path):
    cfg = load_config(DEFAULTS, None, ["exp_name=rt"])
    p = str(tmp_path / "c.yaml")
    save_config(cfg, p)
    cfg2 = load_config(DEFAULTS, p, [])
    assert cfg2.exp_name == "rt"
    assert cfg2.human.loss.l1_w == cfg.human.loss.l1_w


def test_region_weights():
    w = parse_region_weights({"head-neck": 2.0, **{k: 1.0 for k in [
        "spine", "leftUpArm", "rightUpArm", "leftDownArm", "rightDownArm",
        "leftHand", "rightHand", "hips", "leftUpLeg", "rightUpLeg",
        "leftDownLeg", "rightDownLeg", "leftFoot", "rightFoot"]}}, {})
    assert w[0] == 2.0 and w.shape == (15,)


def test_data_splits_match_reference_rule():
    # 78 frames (f_2 after skip-2): reference yields val every ~10th
    train, val = get_data_splits(78)
    assert len(train) + len(val) == 78
    assert set(train).isdisjoint(val)
    assert len(val) in (7, 8)
    # offset by half window
    assert val[0] == (78 // (78 // 10)) // 2


def _fake_out(n=50):
    rng = np.random.RandomState(0)
    return {
        "xyz": rng.randn(n, 3).astype(np.float32),
        "xyz_canon": rng.randn(n, 3).astype(np.float32),
        "shs": rng.randn(n, 16, 3).astype(np.float32) * 0.1,
        "opacity": rng.rand(n, 1).astype(np.float32),
        "scales": np.abs(rng.randn(n, 3)).astype(np.float32) * 0.01 + 1e-3,
        "scales_canon": np.abs(rng.randn(n, 3)).astype(np.float32) * 0.01
        + 1e-3,
        "rotq": np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32),
        "rotq_canon": np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32),
    }


def test_ply_roundtrip(tmp_path):
    out = _fake_out()
    p = str(tmp_path / "a.ply")
    save_ply(out, p, pose="canonical")
    back = load_ply(p)
    np.testing.assert_allclose(back["xyz"], out["xyz_canon"], atol=1e-5)
    np.testing.assert_allclose(back["opacity"][:, 0], out["opacity"][:, 0],
                               atol=1e-4)
    np.testing.assert_allclose(back["scales"], out["scales_canon"],
                               rtol=1e-4)
    np.testing.assert_allclose(back["shs"], out["shs"], atol=1e-5)


def test_splat_and_ellipsoid(tmp_path):
    out = _fake_out(20)
    sp = str(tmp_path / "a.splat")
    save_splat(out, sp)
    assert os.path.getsize(sp) == 20 * 32
    ep = str(tmp_path / "e.ply")
    save_ellipsoid_mesh(out, ep)
    assert os.path.getsize(ep) > 1000


def test_video_writer(tmp_path):
    from PIL import Image

    d = tmp_path / "frames"
    d.mkdir()
    for i in range(5):
        Image.fromarray(
            (np.random.RandomState(i).rand(32, 32, 3) * 255).astype(np.uint8)
        ).save(d / f"{i:03d}.png")
    out = str(tmp_path / "v.mp4")
    ok = create_video(str(d), out, fps=5)
    assert ok and os.path.getsize(out) > 500
