"""Post-hoc validate() with test-time val-pose refinement.

Loads the latest checkpoint of a finished run and re-runs validation
with tpu.val_pose_refine_steps enabled, appending the refined metrics
row to results_train.json (iter key 'refined').

Usage: python scripts/eval_refined.py work/run_r3b [steps]
"""
import os
import sys

os.makedirs("/root/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sings_tpu.config.core import load_config
from sings_tpu.config.defaults import DEFAULTS
from sings_tpu.train.trainer import Trainer

out = sys.argv[1] if len(sys.argv) > 1 else "work/run_r3b"
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 60

cfg = load_config(DEFAULTS, "configs/human_complex.yaml",
                  [f"output_path={out}",
                   f"tpu.val_pose_refine_steps={steps}"])
trainer = Trainer(cfg, mode="train")
assert trainer.step > 0, "no checkpoint found to evaluate"
print(f"loaded step {trainer.step}", flush=True)
res = trainer.validate("refined")
print("refined:", res, flush=True)
