"""AMASS / custom motion ingestion (reference AnimDataset_opt.py:105-126,
motion_utils.py:10-52, constants.py:15-19)."""
from __future__ import annotations

import numpy as np

from ..ops import rotations as R
import jax.numpy as jnp

# map AMASS 156-d smplh pose vector -> 24-joint (72-d) smpl pose
AMASS_SMPLH_TO_SMPL_JOINTS = np.arange(0, 156).reshape((-1, 3))[[
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10,
    11, 12, 13, 14, 15, 16, 17, 18,
    19, 20, 21, 22, 37,
]].reshape(-1)


def manual_alignment(motion_type: str):
    """Per-motion-type world alignment (motion_utils.py:10-26)."""
    if motion_type == "AMASS":
        trans = np.array([0.0, 0.0, 10.0])
        rot = np.array([90.0, 0.0, 0.0]) / 180 * np.pi
        scale = 0.5
    elif motion_type == "custom":
        trans = np.zeros(3)
        rot = np.array([-0.5, 0.0, 0.0]) / 180 * np.pi
        scale = 1.0
    else:
        trans = np.zeros(3)
        rot = np.zeros(3)
        scale = 0.5
    return trans.astype(np.float32), rot.astype(np.float32), float(scale)


def euler_to_matrix(rx, ry, rz):
    """XYZ-order euler angles -> 3x3 (matches transformations.euler_matrix
    default 'sxyz' convention used at AnimDataset_opt.py:51)."""
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    my = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (mx @ my @ mz).astype(np.float32)


def rebase_motion(poses: np.ndarray, transl: np.ndarray):
    """Re-root a motion at its first frame facing the camera
    (motion_utils.rebase_smpl:29-52). poses (N, 72), transl (N, 3).

    Note the reference rotates the *translation* track and pushes z+20
    but leaves the pose global orient untouched — reproduced verbatim.
    """
    global_orient = jnp.asarray(poses[:, :3])
    mats = np.asarray(R.axis_angle_to_matrix(global_orient))
    mat0_inv = np.linalg.inv(mats[0])
    mat_target = np.asarray(
        R.axis_angle_to_matrix(jnp.asarray([np.pi, 0.0, 0.0]))
    )
    t = (mat_target @ mat0_inv @ transl.reshape(-1, 3, 1).astype(np.float32))
    t = t[:, :, 0]
    t = t - t[0]
    t[:, -1] += 20.0
    return poses, t.astype(np.float32)


def load_motion(
    path: str,
    motion_type: str = "custom",
    start: int = 0,
    end: int = -1,
    skip: int = 1,
    rebase: bool = True,
):
    """Load a motion file into {'global_orient','body_pose','transl'}."""
    data = np.load(path)
    if motion_type == "AMASS":
        poses = data["poses"][start:end:skip][:, AMASS_SMPLH_TO_SMPL_JOINTS]
        transl = data["trans"][start:end:skip]
    else:
        poses = data["body_pose"][start:end:skip]
        transl = data["transl"][start:end:skip]
    poses = poses.astype(np.float32)
    transl = transl.astype(np.float32)
    if rebase:
        poses, transl = rebase_motion(poses, transl)
    return {
        "global_orient": poses[:, :3],
        "body_pose": poses[:, 3:],
        "transl": transl.reshape(-1, 3),
    }
