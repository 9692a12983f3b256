"""Animation dataset (reference sings/rec/datasets/AnimDataset_opt.py).

Loads AMASS or custom motions, rebases to the first frame, and serves
fixed-size chunks for the batched animation forward.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..kinematics.amass import euler_to_matrix, load_motion, manual_alignment
from ..ops.graphics import Camera
from .cameras import get_anim_camera


class AnimDataset(NamedTuple):
    smpl: dict               # global_orient/body_pose/transl (F, ...)
    camera: Camera
    ext_trans: np.ndarray    # (3,)
    ext_rotmat: np.ndarray   # (3, 3)
    ext_scale: np.ndarray    # (1,)
    motion_name: str

    @property
    def num_frames(self):
        return self.smpl["body_pose"].shape[0]

    def get_chunk(self, start: int, end: int):
        """Pad-to-size chunk (static shapes): repeats the last frame."""
        end = min(end, self.num_frames)
        idx = np.arange(start, start + (end - start))
        b = len(idx)
        return {
            "global_orient": self.smpl["global_orient"][idx],
            "body_pose": self.smpl["body_pose"][idx],
            "transl": self.smpl["transl"][idx],
            "smpl_scale": np.ones((b, 1), np.float32),
            "ext_tfs": (
                np.tile(self.ext_trans[None], (b, 1)),
                np.tile(self.ext_rotmat[None], (b, 1, 1)),
                np.tile(self.ext_scale[None], (b, 1)),
            ),
        }


def load_anim_dataset(
    motion_src: str,
    motion_type: str = "custom",
    motion_start: int = 0,
    motion_end: int = -1,
    motion_skip: int = 1,
    render_size=(512, 512),
    rebase: bool | None = None,
    fx: float = 5000.0,
    fy: float = 5000.0,
    image_zoom_ratio: float = 1.0,
) -> AnimDataset:
    """Build the animation dataset (AnimDataset_opt.py:27-66).

    rebase: re-root the trajectory at frame 0 and push z+20
        (motion_utils.rebase_smpl). The reference hardcodes True, but
        composing that +20-z shift with the AMASS manual alignment
        (Rx(90deg) AFTER the shift, sings_hybrid.py:546-552) maps the
        body to y ~= -10 — a ~45deg off-axis miss of the fixed
        fx=fy=5000 camera, i.e. the released AMASS path renders empty
        frames (derivable from motion_utils.py:13-15,50-52 alone; the
        repo's own demo motion is type 'custom', whose alignment is
        near-identity and unaffected). Default: reference-verbatim
        True for 'custom', False for 'AMASS' so AMASS motions actually
        land in frame (documented deviation, PARITY.md).
    fx, fy: synthetic camera focals (reference fixes 5000 at 512^2;
        scale them with render_size to keep the subject framed).
    """
    if rebase is None:
        rebase = motion_type != "AMASS"
    smpl = load_motion(motion_src, motion_type, motion_start, motion_end,
                       motion_skip, rebase=rebase)
    trans, rot, scale = manual_alignment(motion_type)
    rotmat = euler_to_matrix(*rot)
    import os

    # image_zoom_ratio < 1 renders a SMALLER image at the SAME fov
    # (AnimDataset_opt.py:87-91 computes fov from the original size,
    # then shrinks render_size): shrink size and focal together
    downscale = 1.0 / image_zoom_ratio
    if downscale > 1:
        render_size = (int(render_size[0] / downscale),
                       int(render_size[1] / downscale))
        fx, fy = fx / downscale, fy / downscale

    return AnimDataset(
        smpl=smpl,
        camera=get_anim_camera(render_size, fx=fx, fy=fy),
        ext_trans=trans,
        ext_rotmat=rotmat,
        ext_scale=np.array([scale], np.float32),
        motion_name=os.path.basename(motion_src).split(".")[0],
    )
