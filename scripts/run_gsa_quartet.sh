#!/bin/bash
# Full eFAST GSA quartet at the reference configuration (1000 samples/param).
# f64 rosenbrock23 (the recipe that produced zero failed corners in round 1),
# lane-minor batch integrator, chunk 128 to stay under the axon 60s watchdog.
set -x
cd /root/repo
for target in dk dk_membsfk concs concs_membsfk; do
  python -u -m gab1_shp2_tpu.workloads.gsa_driver \
    --target $target --samples 1000 --chunk 128 --max-steps 2500 \
    --outdir results 2>&1 | grep -v WARNING
done
