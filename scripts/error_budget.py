"""Per-term error budget for the masked-PSNR gap (VERDICT r4 item 1).

Decomposes the train-frame (learned poses) and val-frame residuals of a
finished run into actionable terms:

  * psnr_masked           — the headline metric (masked MSE).
  * boundary_mse_share    — fraction of masked MSE inside a +-3 px band
                            around the GT mask edge (silhouette/pose
                            errors live here; texture errors don't).
  * interior_psnr         — masked PSNR on the eroded interior only.
  * sil_iou / sil_area    — rendered alpha>0.5 vs GT mask IoU and
                            area ratio (fat-silhouette factor). Alpha
                            recovered from black-bg vs white-bg renders
                            (I_white - I_black = 1 - A per channel).
  * face_psnr             — masked PSNR inside the face bbox (from the
                            kit's coco-133 face keypoints 23..90).
  * hp_energy_ratio       — high-pass (3x3 laplacian) energy of render
                            vs GT inside the eroded mask; <1 = soft
                            texture.
  * lowfreq_psnr          — masked PSNR after 8x average pooling
                            (color/shading, alignment-insensitive).

Usage: python scripts/error_budget.py work/run_r3b [n_frames]
Writes <logdir>/error_budget.json and prints the table.
"""
import json
import os
import sys

os.makedirs("/root/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def dilate(m, it):
    """binary dilation with a 3x3 structuring element, `it` times."""
    m = m.astype(np.float32)
    for _ in range(it):
        p = np.pad(m, 1)
        m = np.max(np.stack([p[dy:dy + m.shape[0], dx:dx + m.shape[1]]
                             for dy in range(3) for dx in range(3)]), 0)
    return m


def erode(m, it):
    return 1.0 - dilate(1.0 - m, it)


def masked_psnr(img, gt, m):
    mse = float((((img - gt) * m) ** 2).sum() / max(m.sum() * 3, 1.0))
    return float(20 * np.log10(1.0 / max(np.sqrt(mse), 1e-6)))


def highpass_energy(img, m):
    """mean 3x3-laplacian-response energy over masked pixels."""
    k = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], np.float32)
    e = 0.0
    for c in range(img.shape[0]):
        p = np.pad(img[c], 1, mode="edge")
        r = sum(k[dy, dx] * p[dy:dy + img.shape[1], dx:dx + img.shape[2]]
                for dy in range(3) for dx in range(3))
        e += float(((r ** 2) * m[0]).sum())
    return e / max(m.sum() * 3, 1.0)


def pool8(x):
    h, w = x.shape[-2] // 8 * 8, x.shape[-1] // 8 * 8
    x = x[..., :h, :w]
    return x.reshape(*x.shape[:-2], h // 8, 8, w // 8, 8).mean((-3, -1))


def frame_budget(trainer, data, frame, kp=None, kp_scores=None):
    gt = np.asarray(trainer.images[frame])
    mask = np.asarray(trainer.masks[frame])
    img_b, _ = trainer._render_eval(data, bg=jnp.zeros(3))
    img_w, _ = trainer._render_eval(data, bg=jnp.ones(3))
    img = np.asarray(img_b)
    alpha = 1.0 - np.clip(np.asarray(img_w) - img, 0, 1).mean(0)

    m = mask[None]
    out = {"psnr_masked": masked_psnr(img, gt, m)}

    edge = dilate(mask, 3) - erode(mask, 3)          # +-3 px band
    inner = erode(mask, 3)
    tot = float((((img - gt) * m) ** 2).sum())
    bnd = float((((img - gt) * edge[None]) ** 2).sum())
    out["boundary_mse_share"] = bnd / max(tot, 1e-12)
    out["interior_psnr"] = masked_psnr(img, gt, inner[None])

    sil = (alpha > 0.5).astype(np.float32)
    inter = float((sil * mask).sum())
    union = float(np.maximum(sil, mask).sum())
    out["sil_iou"] = inter / max(union, 1.0)
    out["sil_area"] = float(sil.sum()) / max(float(mask.sum()), 1.0)

    if kp is not None:
        face = kp[23:91]
        sc = kp_scores[23:91]
        ok = sc > 0.3
        if ok.sum() >= 10:
            x0, y0 = face[ok].min(0)
            x1, y1 = face[ok].max(0)
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            r = max(x1 - x0, y1 - y0) * 0.9 + 4
            fy0, fy1 = int(max(cy - r, 0)), int(min(cy + r, gt.shape[1]))
            fx0, fx1 = int(max(cx - r, 0)), int(min(cx + r, gt.shape[2]))
            fm = np.zeros_like(mask)
            fm[fy0:fy1, fx0:fx1] = mask[fy0:fy1, fx0:fx1]
            if fm.sum() > 16:
                out["face_psnr"] = masked_psnr(img, gt, fm[None])

    hp_r = highpass_energy(img, inner[None])
    hp_g = highpass_energy(gt, inner[None])
    out["hp_energy_ratio"] = hp_r / max(hp_g, 1e-12)

    out["lowfreq_psnr"] = masked_psnr(pool8(img), pool8(gt),
                                      pool8(m[0])[None])
    return out


def main():
    from sings_tpu.config.core import load_config
    from sings_tpu.config.defaults import DEFAULTS
    from sings_tpu.train.trainer import Trainer

    outdir = sys.argv[1] if len(sys.argv) > 1 else "work/run_r3b"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    # reload the run's OWN saved config (it may deviate from the recipe
    # — e.g. the perceptual-ablation runs train at reduced capacity)
    import glob

    saved = glob.glob(os.path.join(outdir, "*", "*",
                                   "config_train.yaml"))
    cfg_file = saved[0] if saved else "configs/human_complex.yaml"
    cfg = load_config(DEFAULTS, cfg_file, [f"output_path={outdir}"])
    trainer = Trainer(cfg, mode="train")
    assert trainer.step > 0, "no checkpoint found"
    print(f"loaded step {trainer.step}", flush=True)

    budgets = {"train": [], "val": []}
    tr = trainer.kit.train_split
    tr = tr[:: max(1, len(tr) // n_frames)][:n_frames]
    for frame in tr:
        kp = (None if trainer.kit.keypoints is None
              else trainer.kit.keypoints[frame])
        sc = (None if trainer.kit.keypoint_scores is None
              else trainer.kit.keypoint_scores[frame])
        b = frame_budget(
            trainer, {"global_orient": None, "body_pose": None,
                      "betas": None, "transl": None,
                      "dataset_idx": int(frame)}, frame, kp, sc)
        budgets["train"].append(b)
        print(f"train[{frame}] " + " ".join(
            f"{k}={v:.3f}" for k, v in b.items()), flush=True)
    for frame in trainer.kit.val_split[:n_frames]:
        data = {
            "global_orient": trainer.kit.smpl["global_orient"][frame],
            "body_pose": trainer.kit.smpl["body_pose"][frame],
            "betas": trainer.kit.smpl["betas"],
            "transl": trainer.kit.smpl["transl"][frame],
        }
        kp = (None if trainer.kit.keypoints is None
              else trainer.kit.keypoints[frame])
        sc = (None if trainer.kit.keypoint_scores is None
              else trainer.kit.keypoint_scores[frame])
        b = frame_budget(trainer, data, frame, kp, sc)
        budgets["val"].append(b)
        print(f"val[{frame}] " + " ".join(
            f"{k}={v:.3f}" for k, v in b.items()), flush=True)

    summary = {}
    for split, rows in budgets.items():
        keys = set().union(*[set(r) for r in rows])
        summary[split] = {
            k: float(np.mean([r[k] for r in rows if k in r])) for k in keys}
    path = os.path.join(trainer.logdir, "error_budget.json")
    with open(path, "w") as fh:
        json.dump(summary, fh, indent=2)
    print("\n=== error budget (means) ===")
    for split, row in summary.items():
        print(split + ": " + " ".join(
            f"{k}={v:.3f}" for k, v in sorted(row.items())))
    print(f"written to {path}")


if __name__ == "__main__":
    main()
