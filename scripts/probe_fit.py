"""Probe the synthetic-template geometric fit (stage A: keypoints).

Runs the keypoint-only skeleton fit on a kit with sapiens keypoints and
dumps per-frame overlays (keypoint targets vs projected SMPL joints,
before/after) + error stats, so fit quality can be judged without a
full training run.

Usage: python scripts/probe_fit.py [kit_dir] [out_dir]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from PIL import Image, ImageDraw

    from sings_tpu.data.kit import load_kit
    from sings_tpu.kinematics.body_model import load_template
    from sings_tpu.kinematics.template import DeviceTemplate
    from sings_tpu.preprocess.refine import (SkeletonFitConfig,
                                             coco133_body_targets,
                                             fit_skeleton,
                                             posed_smpl_joints)

    kit_dir = sys.argv[1] if len(sys.argv) > 1 else "work/kits/f_2"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "work/probe_fit"
    os.makedirs(out_dir, exist_ok=True)

    kit = load_kit(kit_dir)
    assert kit.keypoints is not None, "kit has no keypoints_coco133"
    f = kit.masks.shape[0]
    print(f"kit {kit.name}: {f} frames, {kit.camera.width}x"
          f"{kit.camera.height}, keypoints {kit.keypoints.shape}")

    tpl = load_template("", "smplh", num_betas=len(kit.smpl["betas"]),
                        n_subdivision=0)
    print(f"template: {tpl.name} V={tpl.num_verts} betas={tpl.num_betas} "
          f"(bone {tpl.n_bone_betas})")
    dt = DeviceTemplate.from_host(tpl)

    K = np.array(
        [[kit.camera.width / (2 * kit.camera.tan_fovx), 0,
          kit.camera.width / 2],
         [0, kit.camera.height / (2 * kit.camera.tan_fovy),
          kit.camera.height / 2],
         [0, 0, 1]], np.float32)

    targets, weights = coco133_body_targets(kit.keypoints,
                                            kit.keypoint_scores)
    print(f"targets: {weights.sum():.0f} weighted joints "
          f"({weights.mean():.2f} avg/joint-frame)")

    init = {
        "betas": np.zeros(tpl.num_betas, np.float32),
        "global_orient": kit.smpl["global_orient"],
        "body_pose": kit.smpl["body_pose"],
        "transl": kit.smpl["transl"],
    }
    beta_mask = np.zeros(tpl.num_betas, np.float32)
    beta_mask[0] = 1.0                      # global scale
    if tpl.n_bone_betas:
        beta_mask[-tpl.n_bone_betas:] = 1.0  # skeleton proportions
    cfg = SkeletonFitConfig()
    res = fit_skeleton(dt, K, init, targets, weights, cfg,
                       beta_mask=beta_mask)
    print(f"loss {res['losses'][0]:.4f} -> {res['losses'][-1]:.4f}")
    print(f"px_err {res['px_err'][0]:.2f} -> {res['px_err'][-1]:.2f}")
    print("betas:", np.round(res["betas"], 3))

    # overlays: joints before (red) / after (green) vs targets (blue)
    import jax.numpy as jnp

    def project(params):
        j = posed_smpl_joints(dt, {k: jnp.asarray(v)
                                   for k, v in params.items()})
        j = np.asarray(j)
        uvw = j @ K.T
        return uvw[..., :2] / uvw[..., 2:]

    uv0 = project(init)
    uv1 = project({k: res[k] for k in init})
    for i in range(0, f, max(f // 6, 1)):
        im = (kit.images[i].transpose(1, 2, 0) * 255).astype(np.uint8)
        img = Image.fromarray(im)
        dr = ImageDraw.Draw(img)
        for j in range(24):
            if weights[i, j] > 0:
                x, y = targets[i, j]
                dr.ellipse([x - 4, y - 4, x + 4, y + 4], outline=(0, 0, 255),
                           width=2)
            x, y = uv0[i, j]
            dr.ellipse([x - 2, y - 2, x + 2, y + 2], fill=(255, 0, 0))
            x, y = uv1[i, j]
            dr.ellipse([x - 2, y - 2, x + 2, y + 2], fill=(0, 255, 0))
        img.save(os.path.join(out_dir, f"kp_{i:03d}.png"))
    np.savez(os.path.join(out_dir, "skeleton_fit.npz"),
             **{k: res[k] for k in init})
    print(f"overlays + fit -> {out_dir}")


if __name__ == "__main__":
    main()
