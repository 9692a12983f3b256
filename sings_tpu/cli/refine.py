"""Preprocess refinement entry point (reference
preprocess/utils/ooptimize_smpl(h).py): refine a kit's SMPL fits
against its masks (+ optional sapiens keypoints) and write
poses_optimized.npz next to poses.npz.

Usage:
    python -m sings_tpu.cli.refine --kit /path/to/kit [--steps 300]
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def load_sapiens_keypoints(kit_dir: str, num_frames: int):
    """Read keypoints_coco133/sapiens_*/ *.json if present."""
    roots = sorted(glob.glob(os.path.join(kit_dir, "keypoints_coco133", "*")))
    if not roots:
        return None, None
    files = sorted(glob.glob(os.path.join(roots[0], "*.json")))
    if len(files) < num_frames:
        return None, None
    from ..preprocess.refine import coco133_to_smpl

    kps, valids = [], []
    for fp in files[:num_frames]:
        with open(fp) as fh:
            data = json.load(fh)
        # sapiens json: {"instance_info": [{"keypoints": [[x,y],...]}]}
        try:
            pts = np.asarray(
                data["instance_info"][0]["keypoints"], np.float32)[:133, :2]
        except (KeyError, IndexError, TypeError):
            return None, None
        kp, valid = coco133_to_smpl(pts)
        kps.append(kp)
        valids.append(valid)
    return np.stack(kps), np.stack(valids)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--kit", required=True)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--downscale", type=int, default=4)
    parser.add_argument("--body_template", default="smpl")
    parser.add_argument("--smpl_model_dir",
                        default="/root/reference/data/human_models")
    parser.add_argument("--optimize_betas", action="store_true")
    args = parser.parse_args(argv)

    import jax

    from ._platform import apply_platform_env

    apply_platform_env()
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    from ..data.kit import load_kit
    from ..kinematics.body_model import load_template
    from ..kinematics.template import DeviceTemplate
    from ..preprocess.refine import RefineConfig, refine_smpl

    kit = load_kit(args.kit, skip_first=0, use_optimized_poses=False)
    tpl = load_template(
        os.path.join(args.smpl_model_dir, args.body_template),
        args.body_template, num_betas=len(kit.smpl["betas"]))
    template = DeviceTemplate.from_host(tpl)

    cam_npz = np.load(os.path.join(args.kit, "score_demo_video",
                                   "cameras.npz"))
    K = np.asarray(cam_npz["intrinsic"], np.float32)

    kps, valid = load_sapiens_keypoints(args.kit, len(kit.masks))
    cfg = RefineConfig(steps=args.steps, render_downscale=args.downscale,
                       optimize_betas=args.optimize_betas)
    out = refine_smpl(template, kit.camera, K, kit.smpl, kit.masks,
                      kps, valid, cfg)
    print(f"refine loss {out['losses'][0]:.5f} -> {out['losses'][-1]:.5f}")

    dst = os.path.join(args.kit, "score_demo_video", "poses_optimized.npz")
    try:
        np.savez(dst, betas=out["betas"],
                 global_orient=out["global_orient"],
                 body_pose=out["body_pose"], transl=out["transl"])
        print(f"wrote {dst}")
    except OSError as e:  # read-only kit (e.g. the bundled reference one)
        alt = os.path.join(os.getcwd(), "poses_optimized.npz")
        np.savez(alt, betas=out["betas"],
                 global_orient=out["global_orient"],
                 body_pose=out["body_pose"], transl=out["transl"])
        print(f"kit read-only ({e}); wrote {alt}")
    return out


if __name__ == "__main__":
    main()
