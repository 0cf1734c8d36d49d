#!/bin/bash
# pulse-chase rerun with mixed-precision linear solves ($1 = wait PID)
set -x
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
python -u -m gab1_shp2_tpu.workloads.pulse_chase \
  --n 2000 --chunk 96 --linsolve f32 --outdir results/pulse_chase \
  2>&1 | grep -v WARNING
echo FIXUPS4_DONE
