"""Generate the steady-state perturbation-profile artifacts
(VERDICT-r3 item 4; ``run_base_model.jl:465-818``) without re-running
the full run_base_model ensemble surfaces.

Emits 5 long-form CSVs + 10 overlay figures under results/base_model/
via workloads.run_base_model.perturbation_profiles.  Usage:

    python -u scripts/run_perturb_profiles.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp

import gab1_shp2_tpu as g
from gab1_shp2_tpu.workloads.run_base_model import perturbation_profiles

system = g.base_system()
Co = g.default_co()
base = g.default_params()
kw = dict(solver="stiff", dr=0.2, tf=5.0, Nts=100, rtol=1e-4,
          chunk=256, linsolve_dtype=jnp.float32)
perturbation_profiles(system, Co, base, "results/base_model", kw)
