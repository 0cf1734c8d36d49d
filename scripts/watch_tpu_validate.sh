#!/bin/bash
# Poll for TPU tunnel recovery, then immediately run the round-3
# hardware validation queue: the fused-kernel (in-kernel bands) bench
# (explicit step_impl comparison) and bench.py.
set -u
cd /root/repo
LOG=/tmp/tpu_validate.log
echo "watch started $(date)" > "$LOG"
for i in $(seq 1 200); do
  if timeout 60 python -c "import jax; print(jax.devices())" 2>/dev/null \
      | grep -q TPU; then
    echo "TPU back at $(date) (attempt $i)" >> "$LOG"
    timeout 3000 python -u scripts/bench_ros23_pallas.py >> "$LOG" 2>&1
    echo "=== bench_ros23_pallas EXIT=$? ===" >> "$LOG"
    timeout 2400 python -u bench.py >> "$LOG" 2>&1
    echo "=== bench.py EXIT=$? ===" >> "$LOG"
    echo "validation queue done $(date)" >> "$LOG"
    exit 0
  fi
  echo "attempt $i: down $(date)" >> "$LOG"
  sleep 150
done
echo "gave up $(date)" >> "$LOG"
