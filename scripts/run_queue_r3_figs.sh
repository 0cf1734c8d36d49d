#!/bin/bash
# Round-3 figure-tail artifacts (VERDICT r2 item 10): regenerate the
# base-model artifacts incl. the model-vs-experiment bar figure, and the
# pulse-chase artifacts incl. the rotated-azimuth chase surface.
# Serialized: one TPU chip; run with setsid nohup.
set -x
cd /root/repo

python -u -m gab1_shp2_tpu.workloads.run_base_model \
  --n 2000 --scales --perturb --outdir results/base_model \
  2>&1 | grep -v WARNING

python -u -m gab1_shp2_tpu.workloads.pulse_chase \
  --n 2000 --chunk 96 --linsolve f32 --outdir results/pulse_chase \
  2>&1 | grep -v WARNING

echo "QUEUE R3 FIGS DONE"
