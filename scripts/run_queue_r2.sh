#!/bin/bash
# Round-2 TPU artifact queue: remaining GSA quartet targets, the
# reference-scale NUTS posteriors (base + HeLa), then the analysis
# artifact script.  Serialized because there is one TPU chip.
set -x
cd /root/repo

for target in dk_membsfk concs concs_membsfk; do
  python -u -m gab1_shp2_tpu.workloads.gsa_driver --target $target \
    --samples 1000 --chunk 128 --max-steps 2500 --outdir results \
    2>&1 | grep -v WARNING
done

# NUTS posteriors (param_fitting+inference_finitediff.jl:380-444);
# surrogate likelihood + exact importance reweighting
python -u -m gab1_shp2_tpu.workloads.fit_and_infer --stage both \
  --co base --chains 5 --samples 1000 --warmup 500 \
  --outdir results/inference 2>&1 | grep -v WARNING
python -u -m gab1_shp2_tpu.workloads.fit_and_infer --stage nuts \
  --co hela --chains 5 --samples 1000 --warmup 500 \
  --outdir results/inference 2>&1 | grep -v WARNING

bash scripts/run_artifacts.sh
echo QUEUE_DONE
