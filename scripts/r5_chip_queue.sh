#!/bin/bash
# Round-5 post-training chip measurement queue (serialized; one TPU
# process at a time). Each stage logs to work/r5_measure/.
set -u
mkdir -p work/r5_measure
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ===" | tee -a work/r5_measure/queue.log
  timeout 2400 "$@" > "work/r5_measure/$name.log" 2>&1
  echo "=== $name done rc=$? ===" | tee -a work/r5_measure/queue.log
}

run panel_ab      python scripts/measure_panel.py
run sweep_recipe  python scripts/sweep_raster_recipe.py work/run_r5
run triplane      python scripts/profile_triplane_stages.py
run bench_recipe_base  python bench.py --recipe
run bench_recipe_panel python bench.py --recipe tpu.raster.layout=panel
run error_budget  python scripts/error_budget.py work/run_r5
run eval_refined  python scripts/eval_refined.py work/run_r5
run profile_anim  python scripts/profile_anim.py work/run_r5/v_release/f_2
echo "QUEUE COMPLETE" | tee -a work/r5_measure/queue.log
