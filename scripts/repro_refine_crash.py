"""Minimal repro of the TPU worker crash in trainer._fit_synthetic_body.

Reproduces the exact refine_smpl call the trainer makes at init
(trainer.py:331-372): subdivided synthetic template (n~25.6k verts),
224x128 render, batch_frames=8 vmap, jitted lax.scan of steps.

Usage: python scripts/repro_refine_crash.py [steps] [--no-cull]
"""
import os
import sys

os.makedirs("/root/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from sings_tpu.config.core import load_config
from sings_tpu.config.defaults import DEFAULTS
from sings_tpu.data.kit import load_kit
from sings_tpu.kinematics.body_model import load_template
from sings_tpu.kinematics.template import DeviceTemplate
from sings_tpu.preprocess.refine import RefineConfig, refine_smpl

steps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 5

cfg = load_config(DEFAULTS, "configs/human_complex.yaml", [
    "dataset.root_dir=" + os.environ.get("KIT_ROOT", "/root/reference/examples/training_kits"),
    "output_path=/tmp/x",
    "human.body_template=smplh"])
kit = load_kit(os.path.join(os.environ.get("KIT_ROOT", "/root/reference/examples/training_kits"), "f_2"),
               downscale=int(cfg.dataset.get("downscale", 1) or 1))
tpl = load_template(
    os.path.join(cfg.tpu.smpl_model_dir, cfg.human.body_template),
    cfg.human.body_template, num_betas=len(kit.smpl["betas"]),
    n_subdivision=cfg.human.n_subdivision,
    synthetic_res=float(os.environ.get("SYN_RES", cfg.tpu.get("synthetic_res", 1.0))))
print("tpl", tpl.name, tpl.num_verts, "cam", kit.camera.height,
      kit.camera.width, flush=True)

cam = kit.camera
d = max(1, min(cam.height, cam.width) // 128)
init = {
    "betas": np.zeros(tpl.num_betas, np.float32),
    "global_orient": kit.smpl["global_orient"],
    "body_pose": kit.smpl["body_pose"],
    "transl": kit.smpl["transl"],
}
K = np.array(
    [[cam.width / (2 * cam.tan_fovx), 0, cam.width / 2],
     [0, cam.height / (2 * cam.tan_fovy), cam.height / 2],
     [0, 0, 1]], np.float32)
rcfg = RefineConfig(steps=steps, lr=0.02, render_downscale=d,
                    w_keypoints=0.0, w_prior=0.02, optimize_betas=True)
raster_kw = dict(tile=16, chunk=128, max_span=3)
if "--no-cull" in sys.argv:
    raster_kw["cull"] = False
for a in sys.argv:
    if a.startswith("--max-pairs="):
        raster_kw["max_pairs"] = int(a.split("=")[1])
print("running refine steps=", steps, "kw=", raster_kw, flush=True)

if "--fwd-only" in sys.argv:
    # probe: does the forward path alone fault?
    import jax.numpy as jnp

    from sings_tpu.kinematics.template import smpl_forward
    from sings_tpu.ops.graphics import make_camera
    from sings_tpu.preprocess.refine import _silhouette

    dt = DeviceTemplate.from_host(tpl)
    # splat_scale defaults to None (auto); _silhouette needs a concrete
    # value — refine_smpl resolves it internally, we must do it here
    from sings_tpu.preprocess.refine import auto_splat_scale
    rcfg = rcfg._replace(splat_scale=auto_splat_scale(dt))
    masks_lr = kit.masks[:, ::d, ::d]
    Kd = K.copy()
    Kd[:2] /= d
    cam_lr = make_camera(np.eye(4, dtype=np.float32), masks_lr.shape[1],
                         masks_lr.shape[2], K=Kd)

    import jax

    @jax.jit
    def fwd(i):
        out = smpl_forward(dt, jnp.zeros((1, tpl.num_betas)),
                           jnp.asarray(init["body_pose"][i]).reshape(1, -1),
                           jnp.asarray(init["global_orient"][i]).reshape(1, 3),
                           disable_posedirs=dt.posedirs is None)
        verts = out.verts[0] + jnp.asarray(init["transl"][i])[None]
        return jax.vmap(
            lambda _: _silhouette(verts, cam_lr, rcfg, raster_kw).sum()
        )(jnp.arange(8)).sum()

    for i in range(min(steps, 3)):
        print("fwd", i, float(fwd(jnp.int32(i))), flush=True)
    print("OK: fwd-only done", flush=True)
    sys.exit(0)

kp_kw = {}
if "--kp" in sys.argv or "--face" in sys.argv:
    from sings_tpu.preprocess.refine import (coco133_body_targets,
                                             face_anchor_targets)

    kp_t, kp_w = coco133_body_targets(kit.keypoints, kit.keypoint_scores)
    kp_kw = dict(keypoints2d=kp_t, keypoint_valid=kp_w)
    rcfg = rcfg._replace(w_keypoints=0.5)
    if "--face" in sys.argv:
        face_t, face_w = face_anchor_targets(kit.keypoints,
                                             kit.keypoint_scores)
        from sings_tpu.preprocess.refine import FACE_ANCHOR_INIT
        kp_kw.update(face_targets=face_t, face_weights=face_w,
                     face_offsets=FACE_ANCHOR_INIT)
        rcfg = rcfg._replace(w_face=0.5)

res = refine_smpl(DeviceTemplate.from_host(tpl), cam, K, init, kit.masks,
                  cfg=rcfg, raster_kw=raster_kw, **kp_kw)
print("OK: loss", res["losses"][0], "->", res["losses"][-1], flush=True)
