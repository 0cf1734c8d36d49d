#!/bin/bash
# Round-5 exact-likelihood NUTS at reference scale, TPU-resident:
# 5 chains x 1000 draws, warmup 200, dr=0.2, rtol 1e-4, rodas4 —
# the param_fitting+inference_finitediff.jl:403-444 shape.
#
# --nuts-device tpu: one draw per dispatch (watchdog-safe); each
#   leapfrog leaf is a batch-5 stiff solve + fused 4-tangent jacfwd
#   on the chip.
# --lp-f32: f32 state + f32 linear algebra (validated headline recipe,
#   solution err ~1.6e-5 << rtol 1e-4; deterministic gradient keeps
#   NUTS exact — see the --lp-f32 help text).
#
# Checkpointed per draw (resumable: rerun this script to continue).
# Chains init at the MAP (fitted_parameters.csv is copied in below —
# a --stage nuts run silently inits at prior defaults without it).
cd /root/repo
mkdir -p results/inference/exact_nuts_r5
cp -n results/inference/fitted_parameters.csv \
      results/inference/exact_nuts_r5/ 2>/dev/null || true
exec python -u -m gab1_shp2_tpu.workloads.fit_and_infer \
  --stage nuts --likelihood exact --co base \
  --nuts-device tpu --lp-f32 \
  --chains 5 --samples 1000 --warmup 200 --max-depth 6 \
  --dr 0.2 --rtol 1e-4 --seed 0 \
  --outdir results/inference/exact_nuts_r5
