#!/bin/bash
# Round-5 post-training chip measurement queue (serialized; one TPU
# process at a time), prioritized for the VERDICT items:
#   1-2: bench --recipe base + panel  (it/s headline, VERDICT #2)
#   3:   driver-scene panel A/B       (Mpix/s headline, VERDICT #4)
#   4:   trained-distribution sweep   (mw2/panel glue variants)
#   5-6: error budget + animation split (VERDICT #3/#6)
#   7:   triplane stage attribution
set -u
mkdir -p work/r5_measure
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ===" | tee -a work/r5_measure/queue.log
  timeout 2400 "$@" > "work/r5_measure/$name.log" 2>&1
  echo "=== $name done rc=$? ===" | tee -a work/r5_measure/queue.log
}

run bench_recipe_base  python bench.py --recipe
run bench_recipe_panel python bench.py --recipe tpu.raster.layout=panel
run panel_ab      python scripts/measure_panel.py
run sweep_recipe  python scripts/sweep_raster_recipe.py work/run_r5
run error_budget  python scripts/error_budget.py work/run_r5
run profile_anim  python scripts/profile_anim.py work/run_r5/v_release/f_2
run triplane      python scripts/profile_triplane_stages.py
echo "QUEUE COMPLETE" | tee -a work/r5_measure/queue.log
