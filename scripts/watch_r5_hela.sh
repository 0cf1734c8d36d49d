#!/bin/bash
# Launch the HeLa exact-NUTS r5 run once the base run has finished its
# compiles and is visibly stepping (first warmup progress line in its
# log).  The two runs then interleave ~1 s dispatches on the chip —
# each sees ~half throughput, but compile streams never contend.
BASE_LOG=/tmp/exact_nuts_r5.log
while ! grep -qE "warmup [0-9]+/" "$BASE_LOG" 2>/dev/null; do
  sleep 60
done
echo "base run is stepping; launching HeLa ($(date))"
exec bash /root/repo/scripts/run_exact_nuts_r5_hela.sh
