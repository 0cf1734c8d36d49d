#!/bin/bash
# Regenerate comparison-variant runs with the new profile-CSV outputs
# (the queue's runs predate that change).  $1 = PID to wait for.
set -x
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
for v in hela memb_sfk rect; do
  python -u -m gab1_shp2_tpu.workloads.run_variants --variant $v \
    --n 2000 --outdir results/variants 2>&1 | grep -v WARNING
done
echo FIXUPS3_DONE
