#!/bin/bash
# Round-3 exact-likelihood NUTS validation run (VERDICT item 5):
# 2 chains x 200 samples, warmup 100, dr=0.2, rtol 1e-4, CPU-pinned,
# checkpointed (resumable).  Compares against the committed surrogate
# posterior (results/inference/posterior_quantiles.csv).
cd /root/repo
exec python -u -m gab1_shp2_tpu.workloads.fit_and_infer \
  --cpu --stage nuts --likelihood exact --co base \
  --chains 2 --samples 200 --warmup 100 --max-depth 6 \
  --dr 0.2 --rtol 1e-4 --seed 0 \
  --outdir results/inference/exact_nuts
