#!/bin/bash
# Round-5 TPU bench window: ONE serialized queue (one chip; concurrent
# dispatch streams risk watchdog kills).  Run AFTER stopping the
# exact-NUTS processes (they resume from per-draw checkpoints — rerun
# scripts/run_exact_nuts_r5.sh and _r5_hela.sh afterwards).
#
#   1. df32 RHS micro-bench          (VERDICT-r4 item 6 input)
#   2. north-star A/B native vs df32 (item 6 decision)
#   3. dense/two-leg refill-vs-sorted (items 3 & 4)
#   4. pulse-chase N=2000 artifact regen on the winning scheduler
set -x
cd /root/repo
python -u scripts/bench_df32_rhs.py 1000 2>&1
python -u scripts/bench_df32_northstar.py 1024 2>&1
python -u scripts/bench_refill_dense.py 2048 2>&1
python -u -m gab1_shp2_tpu.workloads.pulse_chase \
  --n 2000 --nts 120 --scheduler refill \
  --outdir results/pulse_chase 2>&1
echo "BENCH WINDOW DONE"
