"""Host-looped mirror of trainer._fit_synthetic_body stage B.

The r3b quality run crashed the TPU worker inside the jitted stage-B
scan at the new synthetic_res=2.0 shapes (102k verts), while the plain
repro (no stage A, no keypoint/face terms, 2 steps) is clean. This
variant reproduces the trainer's exact fit (stage A first, keypoints +
face anchors, optimize_betas) but drives stage B as a HOST loop with a
per-step readback, so the crash step and the parameter state right
before it are observable.

Usage: python scripts/repro_refine_crash_b.py [steps]
"""
import os
import sys

os.makedirs("/root/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
import optax

from sings_tpu.config.core import load_config
from sings_tpu.config.defaults import DEFAULTS
from sings_tpu.data.kit import load_kit
from sings_tpu.kinematics.body_model import load_template
from sings_tpu.kinematics.template import DeviceTemplate, smpl_forward
from sings_tpu.ops.graphics import make_camera
from sings_tpu.preprocess.refine import (
    RefineConfig, SkeletonFitConfig, _silhouette, coco133_body_targets,
    face_anchor_targets, fit_skeleton, posed_smpl_joints, project_px,
    _huber_px)

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300

root = "/root/reference/examples/training_kits"
cfg = load_config(DEFAULTS, "configs/human_complex.yaml",
                  [f"dataset.root_dir={root}", "output_path=/tmp/x"])
kit = load_kit(os.path.join(root, "f_2"))
tpl = load_template(
    os.path.join(cfg.tpu.smpl_model_dir, cfg.human.body_template),
    cfg.human.body_template, num_betas=len(kit.smpl["betas"]),
    n_subdivision=cfg.human.n_subdivision,
    synthetic_res=float(cfg.tpu.get("synthetic_res", 1.0)))
print("tpl", tpl.name, tpl.num_verts, flush=True)
dt = DeviceTemplate.from_host(tpl)
cam = kit.camera
nb = tpl.num_betas
d = max(1, min(cam.height, cam.width) // 128)
K = np.array(
    [[cam.width / (2 * cam.tan_fovx), 0, cam.width / 2],
     [0, cam.height / (2 * cam.tan_fovy), cam.height / 2],
     [0, 0, 1]], np.float32)

init = {
    "betas": np.zeros(nb, np.float32),
    "global_orient": kit.smpl["global_orient"],
    "body_pose": kit.smpl["body_pose"],
    "transl": kit.smpl["transl"],
}
kp_t, kp_w = coco133_body_targets(kit.keypoints, kit.keypoint_scores)
face_t, face_w = face_anchor_targets(kit.keypoints, kit.keypoint_scores)
beta_mask = np.zeros(nb, np.float32)
beta_mask[0] = 1.0
if tpl.n_bone_betas:
    beta_mask[-tpl.n_bone_betas:] = 1.0
res_a = fit_skeleton(dt, K, init, kp_t, kp_w,
                     SkeletonFitConfig(steps=500), beta_mask=beta_mask,
                     face_targets=face_t, face_weights=face_w)
print("stage A px", res_a["px_err"][0], "->", res_a["px_err"][-1],
      flush=True)
init = {k: res_a[k] for k in init}
face_o = res_a["face_offsets"]

rcfg = RefineConfig(steps=steps, lr=0.01, render_downscale=d,
                    w_keypoints=0.5, w_face=0.5, w_prior=0.05,
                    optimize_betas=True)
# splat_scale None (auto) is only resolved inside refine_smpl; this
# script calls _silhouette directly and needs a concrete value
from sings_tpu.preprocess.refine import auto_splat_scale  # noqa: E402

rcfg = rcfg._replace(splat_scale=auto_splat_scale(dt))
raster_kw = dict(tile=16, chunk=128, max_span=3)

masks_lr = kit.masks[:, ::d, ::d]
Kd = K.copy()
Kd[:2] /= d
cam_lr = make_camera(np.eye(4, dtype=np.float32), masks_lr.shape[1],
                     masks_lr.shape[2], K=Kd)
masks_d = jnp.asarray(masks_lr)
Kj = jnp.asarray(K)
kpj = jnp.asarray(kp_t)
kpv = jnp.asarray(kp_w)
ft = jnp.asarray(face_t)
fw = jnp.asarray(face_w)
fo = jnp.asarray(face_o)
f = init["body_pose"].shape[0]
nbatch = min(rcfg.batch_frames, f)

params = {k: jnp.asarray(v) for k, v in init.items()}
prior = jax.tree.map(jnp.copy, params)


def sil_loss(params, i):
    out = smpl_forward(
        dt, params["betas"].reshape(1, -1),
        params["body_pose"][i].reshape(1, -1),
        params["global_orient"][i].reshape(1, 3),
        disable_posedirs=dt.posedirs is None)
    verts = out.verts[0] + params["transl"][i][None]
    sil = _silhouette(verts, cam_lr, rcfg, raster_kw)
    return jnp.mean((sil - masks_d[i]) ** 2)


def total_loss(params, step_i):
    joints, head_rot = posed_smpl_joints(dt, params, return_head_rot=True)
    uv = project_px(joints, Kj)
    e = jnp.sqrt(jnp.sum((uv - kpj) ** 2, axis=-1) + 1e-8)
    l_kp = (_huber_px(e, 10.0) * kpv).sum() / jnp.maximum(kpv.sum(), 1.0)
    anchors = (joints[:, 15][:, None, :]
               + jnp.einsum("fxy,ay->fax", head_rot, fo))
    fe = jnp.sqrt(jnp.sum(
        (project_px(anchors, Kj) - ft) ** 2, axis=-1) + 1e-8)
    l_face = (_huber_px(fe, 10.0) * fw).sum() / jnp.maximum(fw.sum(), 1.0)
    idx = (step_i * nbatch + jnp.arange(nbatch)) % f
    sils = jax.vmap(lambda i: sil_loss(params, i))(idx)
    l_prior = sum(jnp.mean((params[k] - prior[k]) ** 2)
                  for k in ("body_pose", "transl"))
    l_orient = jnp.mean(
        (params["global_orient"] - prior["global_orient"]) ** 2)
    return (rcfg.w_keypoints * l_kp + rcfg.w_face * l_face
            + rcfg.w_silhouette * sils.mean() + rcfg.w_prior * l_prior
            + rcfg.w_orient_prior * l_orient)


tx = optax.adam(rcfg.lr)
opt_state = tx.init(params)


@jax.jit
def step(params, opt_state, step_i):
    loss, grads = jax.value_and_grad(total_loss)(params, step_i)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    # diagnostics: beta magnitude and the posed extent of frame 0
    out = smpl_forward(dt, params["betas"].reshape(1, -1),
                       params["body_pose"][0].reshape(1, -1),
                       params["global_orient"][0].reshape(1, 3),
                       disable_posedirs=dt.posedirs is None)
    v = out.verts[0] + params["transl"][0][None]
    diag = {
        "beta_max": jnp.max(jnp.abs(params["betas"])),
        "v_absmax": jnp.max(jnp.abs(v)),
        "z_min": jnp.min(v[:, 2]),
        "finite": jnp.all(jnp.isfinite(v)),
    }
    return params, opt_state, loss, diag


for i in range(steps):
    params, opt_state, loss, diag = step(params, opt_state, jnp.int32(i))
    vals = {k: float(v) for k, v in diag.items()}
    print(f"step {i}: loss {float(loss):.5f} beta_max {vals['beta_max']:.3f}"
          f" v_absmax {vals['v_absmax']:.2f} z_min {vals['z_min']:.3f}"
          f" finite {vals['finite']}", flush=True)
print("OK", flush=True)
