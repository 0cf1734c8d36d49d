#!/bin/bash
# Full eFAST GSA quartet at the reference configuration (1000 samples/param).
# f64 RODAS4 with f32 linear algebra (the production default since
# 2026-08-18: corner-validated by scripts/probe_gsa_mixed.py — 0/784
# failures incl. all 16 x1000-bounds corners, p99 agreement 1.1e-4),
# lane-minor batch integrator, chunk 256 (rodas4's ~2.7x fewer steps
# keep a 256-dispatch well under the axon 60s watchdog).
set -x
cd /root/repo
for target in dk dk_membsfk concs concs_membsfk; do
  python -u -m gab1_shp2_tpu.workloads.gsa_driver \
    --target $target --samples 1000 --chunk 256 --max-steps 2500 \
    --outdir results 2>&1 | grep -v WARNING
done
