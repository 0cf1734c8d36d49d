#!/bin/bash
# Round-4 TPU artifact queue.  The tunnel has multi-hour outages
# (CLAUDE.md): poll until a backend query answers, then run the queue
# serially (one chip; concurrent TPU jobs risk watchdog kills).
#
#   1. perturbation-profile artifacts (VERDICT-r3 item 4 tail --
#      code + tests landed in fb5461b, CSVs/figures never generated
#      because the round-3 VM recycled mid-queue)
#   2. resamples=2 eFAST dk artifact (VERDICT-r3 item 6 tail: a
#      committed multi-curve pooled-estimator artifact)
#
# Launch detached:  setsid nohup bash scripts/run_queue_r4_tpu.sh \
#                     > /tmp/queue_r4_tpu.log 2>&1 < /dev/null &
set -x
cd /root/repo

until timeout 60 python -c "import jax; print(jax.devices())" \
      2>/dev/null | grep -q -i tpu; do
  echo "$(date -u +%H:%M:%S) tunnel down; retry in 5 min"
  sleep 300
done
echo "$(date -u +%H:%M:%S) TPU up"

python -u scripts/run_perturb_profiles.py \
  2>&1 | grep -v WARNING

python -u -m gab1_shp2_tpu.workloads.gsa_driver \
  --target dk --samples 1000 --resamples 2 --outdir results \
  2>&1 | grep -v WARNING

echo "queue r4 done"
