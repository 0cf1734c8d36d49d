#!/bin/bash
# HeLa companion of run_exact_nuts_r5.sh (reference
# Turing_res_5-chains_1000-spls_HeLa.jld2 shape).  Same TPU-resident
# one-draw-dispatch configuration; safe to run CONCURRENTLY with the
# base run only if the base run has finished compiling (two compile
# streams contend); otherwise chain it with scripts/watch then run.
cd /root/repo
mkdir -p results/inference/exact_nuts_r5_hela
cp -n results/inference/fitted_parameters.csv \
      results/inference/exact_nuts_r5_hela/ 2>/dev/null || true
exec python -u -m gab1_shp2_tpu.workloads.fit_and_infer \
  --stage nuts --likelihood exact --co hela \
  --nuts-device tpu --lp-f32 \
  --chains 5 --samples 1000 --warmup 200 --max-depth 6 \
  --dr 0.2 --rtol 1e-4 --seed 0 \
  --outdir results/inference/exact_nuts_r5_hela
