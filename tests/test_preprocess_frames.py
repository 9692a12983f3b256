"""Frame extraction: interval skip, naming, crop+resize contract."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from sings_tpu.preprocess.frames import extract_frames


def _write_video(path, n_frames=12, hw=64, fps=10):
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(path, fourcc, fps, (hw, hw))
    assert vw.isOpened()
    for i in range(n_frames):
        frame = np.full((hw, hw, 3), i * 20 % 255, np.uint8)
        frame[:8, :8] = (255, 0, 0)
        vw.write(frame)
    vw.release()


def test_extract_every_frame(tmp_path):
    vid = str(tmp_path / "v.mp4")
    _write_video(vid, n_frames=12)
    n = extract_frames(vid, str(tmp_path / "kit"))
    assert n == 12
    imgs = sorted(os.listdir(tmp_path / "kit" / "images"))
    assert imgs[0] == "000000.png" and imgs[-1] == "000011.png"
    first = cv2.imread(str(tmp_path / "kit" / "images" / "000000.png"))
    assert first.shape == (64, 64, 3)


def test_extract_interval_and_crop(tmp_path):
    vid = str(tmp_path / "v.mp4")
    _write_video(vid, n_frames=12)
    n = extract_frames(vid, str(tmp_path / "kit"), frame_interval=3,
                       img_center=(32, 32), crop_hw=(32, 32), resize_to=48)
    assert n == 4  # frames 0, 3, 6, 9
    img = cv2.imread(str(tmp_path / "kit" / "images" / "000000.png"))
    assert img.shape == (48, 48, 3)


def test_missing_video_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        extract_frames(str(tmp_path / "nope.mp4"), str(tmp_path / "kit"))
