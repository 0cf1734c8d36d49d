#!/bin/bash
# Reference-scale analysis artifacts (VERDICT round-1 item 6).
# Run on the TPU host; each driver writes CSVs/PNGs under results/.
set -x
cd /root/repo

# N=2000 base-model retrodiction: median/68% surfaces, %SHP2-bound
# GAB1 vs experiment, perturbation sweep, time/length scales
# (run_base_model.jl:89-311)
python -u -m gab1_shp2_tpu.workloads.run_base_model \
  --n 2000 --scales --perturb --outdir results/base_model \
  2>&1 | grep -v WARNING

# pulse-chase vs the shipped dynamic TSV (gefitinib_pulse_chase.jl)
python -u -m gab1_shp2_tpu.workloads.pulse_chase \
  --n 2000 --outdir results/pulse_chase 2>&1 | grep -v WARNING

# HeLa comparison + JZS Bayes factor (run_base_model_HeLa.jl:295-318)
python -u -m gab1_shp2_tpu.workloads.run_variants --variant hela \
  --n 2000 --outdir results/variants 2>&1 | grep -v WARNING

# membrane-SFK confinement comparison
python -u -m gab1_shp2_tpu.workloads.run_variants --variant memb_sfk \
  --n 2000 --outdir results/variants 2>&1 | grep -v WARNING

# rectangular geometry
python -u -m gab1_shp2_tpu.workloads.run_variants --variant rect \
  --n 2000 --outdir results/variants 2>&1 | grep -v WARNING

# hi-EGFR-binding sweeps (base + HeLa)
python -u -m gab1_shp2_tpu.workloads.run_variants --variant hi_egfr \
  --n 500 --outdir results/variants 2>&1 | grep -v WARNING
python -u -m gab1_shp2_tpu.workloads.run_variants --variant hi_egfr_hela \
  --n 500 --outdir results/variants 2>&1 | grep -v WARNING

# reaction-rate quantiles (calc_rxn_rates.jl:104)
python -u -m gab1_shp2_tpu.workloads.calc_rxn_rates \
  --n 2000 --outdir results/rates 2>&1 | grep -v WARNING

# length-scale estimates incl. R=100 (length_scale_estimates.jl)
python -u -m gab1_shp2_tpu.workloads.length_scales \
  --n 2000 --outdir results/length_scales 2>&1 | grep -v WARNING

# parameter-distribution ensemble CSV (plot_parameter_distributions.jl)
python -u -m gab1_shp2_tpu.workloads.plot_parameter_distributions \
  --n 5000 --outdir results/param_distributions 2>&1 | grep -v WARNING
