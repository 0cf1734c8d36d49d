#!/bin/bash
# Round-2 TPU artifact queue, part 2 (after dk_membsfk, which runs
# standalone).  MAP runs on CPU: its serial LBFGS refinement would trip
# the TPU runtime's ~60 s single-execution watchdog; the NUTS stage
# (batched surrogate build + reweighting) runs on the TPU.
set -x
cd /root/repo

# wait for an in-flight job (PID as $1), if any
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

for target in concs concs_membsfk; do
  python -u -m gab1_shp2_tpu.workloads.gsa_driver --target $target \
    --samples 1000 --chunk 128 --max-steps 2500 --outdir results \
    2>&1 | grep -v WARNING
done

# MAP fit (CPU; writes results/inference/fitted_parameters.csv)
python -u -m gab1_shp2_tpu.workloads.fit_and_infer --stage map --cpu \
  --outdir results/inference 2>&1 | grep -v WARNING

# NUTS posteriors (param_fitting+inference_finitediff.jl:380-444);
# surrogate likelihood + exact importance reweighting, on TPU
python -u -m gab1_shp2_tpu.workloads.fit_and_infer --stage nuts \
  --co base --chains 5 --samples 1000 --warmup 500 \
  --outdir results/inference 2>&1 | grep -v WARNING
python -u -m gab1_shp2_tpu.workloads.fit_and_infer --stage nuts \
  --co hela --chains 5 --samples 1000 --warmup 500 \
  --outdir results/inference 2>&1 | grep -v WARNING

bash scripts/run_artifacts.sh
echo QUEUE_DONE
