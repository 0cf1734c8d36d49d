#!/bin/bash
# Full eFAST GSA quartet at the reference configuration (1000 samples/param).
# f64 rosenbrock23 with f32 linear algebra (the round-3 default: 7.2x faster,
# S1/ST indices agree with the committed full-f64 artifacts to 2e-5, zero
# failed corners — scripts/probe_gsa_mixed.py), lane-minor batch integrator,
# chunk 128 to stay under the axon 60s watchdog.
set -x
cd /root/repo
for target in dk dk_membsfk concs concs_membsfk; do
  python -u -m gab1_shp2_tpu.workloads.gsa_driver \
    --target $target --samples 1000 --chunk 128 --max-steps 2500 \
    --outdir results 2>&1 | grep -v WARNING
done
