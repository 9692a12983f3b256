"""Mask-stage prompt construction + SAM2 flow (fake predictor).

Prompt parity: preprocess/utils/get_masks_for_sings.py:42-66 (resize
box), :100-131 (check_poses grouping), :163-200 (point selection); the
bundled kit's real alphapose-results.json is the fixture.
"""
import os

import numpy as np
import pytest

from sings_tpu.preprocess.masks import (
    build_point_prompt, check_poses, postprocess_mask, resize_bbox,
    run_sam2_video,
)

KIT = "/root/reference/examples/training_kits/f_2"
APJ = os.path.join(KIT, "alphapose-results.json")


def test_check_poses_groups_bundled_kit():
    if not os.path.exists(APJ):
        pytest.skip("bundled kit not present")
    prompt = check_poses(APJ)
    assert len(prompt) == 1  # single person
    (frames,) = prompt.values()
    assert len(frames) == 80
    assert frames[0]["image_id"] == "0.jpg"
    assert len(frames[0]["keypoints"]) == 26 * 3  # halpe-26


def test_build_point_prompt_selection():
    if not os.path.exists(APJ):
        pytest.skip("bundled kit not present")
    (frames,) = check_poses(APJ).values()
    pose = frames[0]
    pts, labels = build_point_prompt(pose)
    kp = np.asarray(pose["keypoints"]).reshape(-1, 3)[:, :2]
    # 15 body points + 2 heels + 3 synthetic torso points, all positive
    assert pts.shape == (20, 2) and np.all(labels == 1)
    np.testing.assert_allclose(pts[:15], kp[5:20])
    np.testing.assert_allclose(pts[15:17], kp[-2:])
    np.testing.assert_allclose(pts[17], (kp[17] + kp[18]) / 2)
    np.testing.assert_allclose(pts[18], (kp[4] + kp[17]) / 2)
    np.testing.assert_allclose(pts[19], (kp[5] + kp[17]) / 2)


def test_resize_bbox_clamps_and_scales():
    box = resize_bbox((100, 200, 300, 400), 1080, 1080, 1.2)
    # center (200, 300), size 200x200 -> 240x240
    assert tuple(box) == (80, 180, 320, 420)
    box = resize_bbox((0, 0, 1080, 1080), 1080, 1080, 1.2)
    assert tuple(box) == (0, 0, 1080, 1080)  # clamped


def test_postprocess_mask_erodes_to_uint8():
    m = np.zeros((1, 9, 9), bool)
    m[0, 2:7, 2:7] = True
    out = postprocess_mask(m, erode_size=3)
    assert out.dtype == np.uint8 and set(np.unique(out)) <= {0, 255}
    assert out[4, 4] == 255 and out[2, 2] == 0  # border eroded


class _FakePredictor:
    """Implements the SAM2 video-predictor protocol used by the stage."""

    def __init__(self, n_frames, h, w):
        self.n, self.h, self.w = n_frames, h, w
        self.prompts = []

    def init_state(self, video_path):
        return {"dir": video_path}

    def add_new_points_or_box(self, inference_state, frame_idx, obj_id,
                              points, labels):
        self.prompts.append((frame_idx, obj_id, np.asarray(points)))
        return frame_idx, [obj_id], None

    def propagate_in_video(self, state):
        for i in range(self.n):
            mask = np.zeros((1, self.h, self.w), np.float32) - 1.0
            mask[:, 4:-4, 4:-4] = 1.0
            yield i, [1], [mask]


def test_run_sam2_video_full_flow(tmp_path):
    import cv2

    if not os.path.exists(APJ):
        pytest.skip("bundled kit not present")
    vdir = tmp_path / "images"
    vdir.mkdir()
    for i in range(3):
        cv2.imwrite(str(vdir / f"{i:06d}.png"),
                    np.full((16, 16, 3), 128, np.uint8))
    pred = _FakePredictor(3, 16, 16)
    out = run_sam2_video(str(vdir), APJ, predictor=pred, cleanup_jpg=True)
    # reference off-by-one: only_first_frame prompts frames 0 AND 1
    assert [p[0] for p in pred.prompts] == [0, 1]
    masks = sorted(os.listdir(out))
    assert masks == ["000000.png", "000001.png", "000002.png"]
    m = cv2.imread(os.path.join(out, masks[0]), cv2.IMREAD_GRAYSCALE)
    assert m.max() == 255 and m[0, 0] == 0
    assert not list(vdir.glob("*.jpg"))  # temp jpgs removed
