"""On-chip ablation of the perceptual term (VERDICT r4 item 4).

Short trainings (default 3000 steps) at reduced capacity, one per
variant of the texture-signal configuration:

  rf0    — random-feature LPIPS off        (lpips_w=0)
  rf005  — random-feature LPIPS at 0.05x   (the current default)
  rf05   — random-feature LPIPS at 0.5x
  gp     — grad-pyramid 0.2, LPIPS off     (weight-free perceptual)
  gp_rf  — grad-pyramid 0.2 + LPIPS 0.05x

All variants share one synthetic-body fit (copied from the first
variant's logdir). After each run, scripts/error_budget.py metrics
(masked PSNR + high-pass energy ratio) are computed on train frames.

Usage: python scripts/ablate_perceptual.py [steps] [out_root]
Prints a summary table; full numbers in <out_root>/summary.json.
"""
import json
import os
import shutil
import subprocess
import sys

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
ROOT = sys.argv[2] if len(sys.argv) > 2 else "work/ablate_perceptual"

VARIANTS = {
    "rf0": ["human.loss.lpips_w=0.0"],
    "rf005": ["tpu.random_lpips_factor=0.05"],
    "rf05": ["tpu.random_lpips_factor=0.5"],
    "gp": ["human.loss.lpips_w=0.0", "human.loss.grad_pyramid_w=0.2"],
    "gp_rf": ["tpu.random_lpips_factor=0.05",
              "human.loss.grad_pyramid_w=0.2"],
    # alpha-vs-mask supervision (boundary-ring term of the r3 budget)
    "sil": ["tpu.random_lpips_factor=0.05",
            "human.loss.silhouette_w=1.0"],
    "sil_gp": ["human.loss.lpips_w=0.0",
               "human.loss.grad_pyramid_w=0.2",
               "human.loss.silhouette_w=1.0"],
}

COMMON = [
    "exp_name=abl",
    f"train.num_steps={STEPS}",
    "train.val_interval=100000",
    "train.anim_interval=1000000",
    "train.viz_interval=100000",
    "train.save_ckpt_interval=100000",
    # reduced capacity for speed: half-res template -> ~26k init
    "tpu.synthetic_res=1.0",
    "tpu.capacity_mult=2.0",
]


def run(cmd, log):
    print(">>", " ".join(cmd), "->", log, flush=True)
    with open(log, "w") as fh:
        p = subprocess.run(cmd, stdout=fh, stderr=subprocess.STDOUT,
                           timeout=3600)
    return p.returncode


def main():
    os.makedirs(ROOT, exist_ok=True)
    fit_donor = None
    summary = {}
    for name, over in VARIANTS.items():
        out = os.path.join(ROOT, name)
        shutil.rmtree(out, ignore_errors=True)
        logdir = os.path.join(out, "abl", "f_2")  # exp_name=abl
        os.makedirs(logdir, exist_ok=True)
        if fit_donor and os.path.exists(fit_donor):
            shutil.copy(fit_donor, os.path.join(logdir,
                                                "synthetic_fit.npz"))
        rc = run([sys.executable, "-m", "sings_tpu.cli.train",
                  "-c", "configs/human_complex.yaml",
                  f"output_path={out}"] + COMMON + over,
                 os.path.join(ROOT, f"{name}.log"))
        if rc != 0:
            print(f"[{name}] FAILED rc={rc}", flush=True)
            summary[name] = {"rc": rc}
            continue
        if fit_donor is None:
            fit_donor = os.path.join(logdir, "synthetic_fit.npz")
        res_path = os.path.join(logdir, "results_train.json")
        row = {}
        if os.path.exists(res_path):
            res = json.load(open(res_path)).get("final", {})
            row.update({k: res[k] for k in
                        ("psnr_masked", "psnr_masked_train") if k in res})
        # texture-frequency metrics via the error-budget script
        rc2 = run([sys.executable, "scripts/error_budget.py", out, "4"],
                  os.path.join(ROOT, f"{name}_budget.log"))
        bpath = os.path.join(logdir, "error_budget.json")
        if rc2 == 0 and os.path.exists(bpath):
            b = json.load(open(bpath))["train"]
            row["hp_energy_ratio"] = b.get("hp_energy_ratio")
            row["interior_psnr"] = b.get("interior_psnr")
        summary[name] = row
        print(f"[{name}] " + " ".join(
            f"{k}={v:.3f}" for k, v in row.items()
            if isinstance(v, float)), flush=True)
    with open(os.path.join(ROOT, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
