#!/bin/bash
# Round-4 exact-likelihood NUTS validation at reference scale
# (VERDICT-r3 item 5): 5 chains x 1000 samples, warmup 200, dr=0.2,
# rtol 1e-4, rodas4, CPU-pinned, checkpointed every 100-sample block
# (resumable — re-run this script to continue after interruption).
# Reference shape: param_fitting+inference_finitediff.jl:403-408
# (5 chains x 1000 NUTS draws).
cd /root/repo
exec python -u -m gab1_shp2_tpu.workloads.fit_and_infer \
  --cpu --stage nuts --likelihood exact --co base \
  --chains 5 --samples 1000 --warmup 200 --max-depth 6 \
  --dr 0.2 --rtol 1e-4 --seed 0 \
  --outdir results/inference/exact_nuts_r4
