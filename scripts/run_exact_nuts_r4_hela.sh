#!/bin/bash
# Follow-on to scripts/run_exact_nuts_r4.sh: once the base exact-NUTS
# run has finished (its final posterior_quantiles.csv exists), run the
# HeLa exact-likelihood validation at the same reference scale
# (param_fitting+inference_finitediff.jl:403-408 runs 5x1000 for both
# conditions).  Waits idle until then so the two multi-hour jobs never
# contend for the single CPU core.  Checkpointed/resumable like the
# base run — re-run this script to continue after interruption.
#
# Launch detached:  setsid nohup nice -n 19 bash \
#   scripts/run_exact_nuts_r4_hela.sh \
#   > /tmp/exact_nuts_r4_hela.log 2>&1 < /dev/null &
cd /root/repo

# Done-detection: the blocked runner clears its checkpoint only after
# the last block (utils/cache.Checkpointer.clear), and the harvest
# script (scripts/harvest_exact_nuts_ckpt.py) writes the quantiles CSV
# mid-run without touching the checkpoint — so "CSV present AND no
# checkpoint left" is true iff the base run actually completed.
base=results/inference/exact_nuts_r4
until [ -f "$base/posterior_quantiles.csv" ] \
      && ! ls "$base"/cache/ckpt_nuts_*.npz > /dev/null 2>&1; do
  sleep 120
done
echo "$(date -u +%H:%M:%S) base run done; starting HeLa exact NUTS"

exec python -u -m gab1_shp2_tpu.workloads.fit_and_infer \
  --cpu --stage nuts --likelihood exact --co hela \
  --chains 5 --samples 1000 --warmup 200 --max-depth 6 \
  --dr 0.2 --rtol 1e-4 --seed 0 \
  --outdir results/inference/exact_nuts_r4_hela
