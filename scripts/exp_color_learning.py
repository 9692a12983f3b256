"""CPU probe: does the appearance path learn colors at all?

Tiny config, frozen geometry (opt_geo never opens), fixed topology,
l1+ssim only. If the rendered colors fail to move toward GT inside the
mask-overlap region, the color-gradient routing (decoder -> SH ->
rasterizer -> photometric) is broken somewhere CPU-reproducible.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from sings_tpu.config.core import load_config
from sings_tpu.config.defaults import DEFAULTS

cfg = load_config(DEFAULTS, "configs/human_complex.yaml", [
    "dataset.root_dir=/root/repo/work/kits",
    "output_path=/tmp/color_probe",
    "human.body_template=smplh",
    "dataset.downscale=8",
    "dataset.max_frames=4",
    "train.num_steps=300",
    "train.init_steps=100",
    "train.val_interval=100000",
    "train.save_interval=100000",
    "train.anim_interval=100000",
    "train.viz_interval=100000",
    # freeze geometry, open appearance immediately
    "human.opt_geo_from=1000000",
    "human.opt_app_from=0",
    # no density control
    "human.density_control.hybrid.densify_from_iter=1000000",
    "human.density_control.hybrid.prune_from_iter=1000000",
    # photometric only (keep laplacian color off to isolate)
    "human.loss.lpips_w=0.0",
    "human.loss.num_patches=1",
    "tpu.synthetic_fit_steps=30",
])
import shutil

shutil.rmtree("/tmp/color_probe", ignore_errors=True)
from sings_tpu.train.trainer import Trainer

tr = Trainer(cfg, mode="train")

from sings_tpu.model.avatar import get_gs_attrs
from sings_tpu.ops.sh import sh2rgb


def dc_stats(tag):
    a = get_gs_attrs(tr.params, tr.buffers, tr.avatar_cfg)
    alive = np.asarray(tr.buffers.alive) > 0.5
    rgb = np.asarray(sh2rgb(jnp.asarray(np.asarray(a["shs"])[alive][:, 0])))
    print(f"[{tag}] dc->rgb mean {rgb.mean(0)} min {rgb.min(0)} "
          f"max {rgb.max(0)}", flush=True)


def render_err(tag):
    frame = tr.kit.val_split[0] if len(tr.kit.val_split) else 0
    data = {
        "global_orient": tr.kit.smpl["global_orient"][frame],
        "body_pose": tr.kit.smpl["body_pose"][frame],
        "betas": tr.kit.smpl["betas"],
        "transl": tr.kit.smpl["transl"][frame],
    }
    img, _ = tr._render_eval(data, bg=jnp.zeros(3))
    img = np.asarray(img)
    gt = np.asarray(tr.images[frame])
    m = np.asarray(tr.masks[frame])[None]
    # overlap = pixels where BOTH mask and render coverage exist
    cover = (img.sum(0, keepdims=True) > 0.05)
    both = (m > 0.5) & cover
    if both.sum() > 10:
        e = np.abs(img - gt)[np.broadcast_to(both, img.shape)].mean()
        mean_r = img[np.broadcast_to(both, img.shape)].reshape(3, -1).mean(1) \
            if False else [img[c][both[0]].mean() for c in range(3)]
        mean_g = [gt[c][both[0]].mean() for c in range(3)]
        print(f"[{tag}] overlap px={int(both.sum())} L1={e:.4f} "
              f"render_mean={np.round(mean_r,3)} gt_mean={np.round(mean_g,3)}",
              flush=True)
    else:
        print(f"[{tag}] NO OVERLAP (cover={int(cover.sum())}, "
              f"mask={int((m>0.5).sum())})", flush=True)


dc_stats("init")
render_err("init")
tr.train()
dc_stats("after")
render_err("after")
