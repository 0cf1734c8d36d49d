#!/bin/bash
# Post-queue fixups: rerun workloads that tripped the ~60 s TPU
# watchdog at chunk=256 (large-Nts snapshot traffic) with smaller
# chunks.  $1 = PID of the main queue to wait for.
set -x
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
python -u -m gab1_shp2_tpu.workloads.pulse_chase \
  --n 2000 --chunk 96 --outdir results/pulse_chase 2>&1 | grep -v WARNING
echo FIXUPS_DONE
