"""Probe stage B of the synthetic-template fit (silhouette+keypoints).

Runs the full two-stage fit exactly as trainer._fit_synthetic_body
does, then renders fitted silhouettes for every frame and reports mask
IoU before/after + overlay PNGs. Run on the TPU (one process).

Usage: python scripts/probe_fit_b.py [kit_dir] [out_dir]
"""
import os
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    from PIL import Image

    from sings_tpu.data.kit import load_kit
    from sings_tpu.kinematics.body_model import load_template
    from sings_tpu.kinematics.template import DeviceTemplate, smpl_forward
    from sings_tpu.ops.graphics import make_camera
    from sings_tpu.preprocess.refine import (RefineConfig,
                                             SkeletonFitConfig,
                                             _silhouette,
                                             coco133_body_targets,
                                             fit_skeleton, refine_smpl)

    kit_dir = sys.argv[1] if len(sys.argv) > 1 else "work/kits/f_2"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "work/probe_fit_b"
    os.makedirs(out_dir, exist_ok=True)

    kit = load_kit(kit_dir)
    f = kit.masks.shape[0]
    tpl = load_template("", "smplh", num_betas=len(kit.smpl["betas"]),
                        n_subdivision=2)
    dt = DeviceTemplate.from_host(tpl)
    print(f"kit {kit.name}: {f} frames; template V={tpl.num_verts} "
          f"betas={tpl.num_betas}", flush=True)

    K = np.array(
        [[kit.camera.width / (2 * kit.camera.tan_fovx), 0,
          kit.camera.width / 2],
         [0, kit.camera.height / (2 * kit.camera.tan_fovy),
          kit.camera.height / 2],
         [0, 0, 1]], np.float32)
    d = max(1, min(kit.camera.height, kit.camera.width) // 256)
    Kd = K.copy()
    Kd[:2] /= d
    masks_lr = kit.masks[:, ::d, ::d]
    cam_lr = make_camera(np.eye(4, dtype=np.float32), masks_lr.shape[1],
                         masks_lr.shape[2], K=Kd)
    raster_kw = (dict(tile=16, chunk=128, max_span=3)
                 if jax.default_backend() != "cpu"
                 else dict(tile=16, chunk=8, max_span=3, interpret=True))
    rcfg = RefineConfig(steps=400, lr=0.01, render_downscale=d,
                        w_keypoints=1.0, w_prior=0.02,
                        splat_scale=0.012, optimize_betas=True)

    @jax.jit
    def silhouettes(params):
        def one(i):
            out = smpl_forward(
                dt, params["betas"].reshape(1, -1),
                params["body_pose"][i].reshape(1, -1),
                params["global_orient"][i].reshape(1, 3),
                disable_posedirs=True)
            verts = out.verts[0] + params["transl"][i][None]
            return _silhouette(verts, cam_lr, rcfg, raster_kw)

        return jax.lax.map(one, jnp.arange(f))

    def iou(params):
        sils = np.asarray(silhouettes(
            {k: jnp.asarray(v) for k, v in params.items()}))
        inter = ((sils > 0.5) & (masks_lr > 0.5)).sum((1, 2))
        union = ((sils > 0.5) | (masks_lr > 0.5)).sum((1, 2))
        return sils, inter / np.maximum(union, 1)

    init = {
        "betas": np.zeros(tpl.num_betas, np.float32),
        "global_orient": kit.smpl["global_orient"],
        "body_pose": kit.smpl["body_pose"],
        "transl": kit.smpl["transl"],
    }
    _, iou0 = iou(init)
    print(f"IoU init: mean {iou0.mean():.3f} min {iou0.min():.3f}",
          flush=True)

    kp_t, kp_w = coco133_body_targets(kit.keypoints, kit.keypoint_scores)
    beta_mask = np.zeros(tpl.num_betas, np.float32)
    beta_mask[0] = 1.0
    beta_mask[-tpl.n_bone_betas:] = 1.0
    res_a = fit_skeleton(dt, K, init, kp_t, kp_w, SkeletonFitConfig(),
                         beta_mask=beta_mask)
    print(f"stage A px {res_a['px_err'][0]:.2f} -> "
          f"{res_a['px_err'][-1]:.2f}", flush=True)
    init_a = {k: res_a[k] for k in init}
    _, iou_a = iou(init_a)
    print(f"IoU stage A: mean {iou_a.mean():.3f} min {iou_a.min():.3f}",
          flush=True)

    res_b = refine_smpl(dt, kit.camera, K, init_a, kit.masks,
                        keypoints2d=kp_t, keypoint_valid=kp_w,
                        cfg=rcfg, raster_kw=raster_kw)
    print(f"stage B loss {res_b['losses'][0]:.4f} -> "
          f"{res_b['losses'][-1]:.4f}", flush=True)
    fit = {k: res_b[k] for k in init}
    sils, iou_b = iou(fit)
    print(f"IoU stage B: mean {iou_b.mean():.3f} min {iou_b.min():.3f}",
          flush=True)
    print("betas:", np.round(res_b["betas"], 3), flush=True)

    # keypoint retention after stage B
    from sings_tpu.preprocess.refine import posed_smpl_joints
    joints = np.asarray(posed_smpl_joints(
        dt, {k: jnp.asarray(v) for k, v in fit.items()}))
    uvw = joints @ K.T
    uv = uvw[..., :2] / uvw[..., 2:]
    e = np.sqrt(((uv - kp_t) ** 2).sum(-1))
    print(f"px err after B: {(e * kp_w).sum() / kp_w.sum():.2f}",
          flush=True)

    for i in range(0, f, max(f // 6, 1)):
        m = masks_lr[i]
        s = sils[i]
        rgb = np.stack([m, s, np.zeros_like(m)], -1)  # red=mask green=sil
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"sil_{i:03d}.png"))
    np.savez(os.path.join(out_dir, "fit.npz"), **fit)
    print(f"-> {out_dir}", flush=True)


if __name__ == "__main__":
    main()
