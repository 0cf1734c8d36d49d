"""Lane-width probe for the lane-refill scheduler (round 4).

The chunked scheduler measured 256 lanes optimal (512: -3..9%, 1024:
-47%) — but that probe predates refill: a chunk pays its slowest lane,
so wider chunks amplify the straggler cost, while refill harvests
finished lanes continuously and pays only lane-sync inside one step.
Question: with the barrier gone, does a wider device program (more
parallel work per step, fewer refill round-trips) win?

ANSWER (measured v5e 2026-08-20, N=2048 posterior f32 rodas4, best of
3 warm walls): NO — 256 remains optimal.
  lanes 128/256/384/512/1024 -> 3714/3901/3728/3144/1460 solves/s.
Within one while_loop step every live lane advances in lockstep, so a
wide program still pays per-step lane sync on its slowest lane; refill
only removes the *cross-chunk* barrier.  The 256 default stands.

Run on the TPU: python -u scripts/probe_refill_lanes.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import gab1_shp2_tpu as g
from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_refill
from gab1_shp2_tpu.priors.posteriors import generate_ensemble, load_chain_csv
from gab1_shp2_tpu.workloads.common import REFERENCE_CHAIN

N = 2048


def _extract(s):
    return s.PG1Stot[-1]


def main():
    system = g.base_system()
    Co = g.default_co().astype(jnp.float32)
    chain = load_chain_csv(REFERENCE_CHAIN)
    batches = [jnp.asarray(
        generate_ensemble(chain, n=N, rng=np.random.default_rng(seed)),
        jnp.float32) for seed in range(3)]

    def run(lanes, batch):
        out, ok, steps = solve_stiff_refill(
            system, Co, Params.unpack(batch), extract=_extract,
            dr=0.2, tf=5.0, Nts=2, rtol=1e-4, atol=1e-7,
            max_steps=20_000, method="rodas4", lanes=lanes,
            harvest_every=4)
        # sync via device-side scalar reduction (CLAUDE.md: bare
        # block_until_ready was once observed lying through the tunnel)
        return float(jnp.nansum(out)), int(ok.sum()), out

    for lanes in (128, 256, 384, 512, 1024):
        t0 = time.time()
        run(lanes, batches[0])
        compile_s = time.time() - t0
        walls = []
        ref = None
        for b in batches:
            t0 = time.time()
            s, nok, out = run(lanes, b)
            walls.append(time.time() - t0)
            if nok != N:
                print(f"  lanes={lanes}: {N - nok} FAILED lanes!")
        w = min(walls)
        print(f"lanes={lanes:5d}: {N / w:8.1f} solves/s  "
              f"(best of {len(walls)}: {w:.3f}s, walls="
              f"{['%.3f' % x for x in walls]}, compile+1st {compile_s:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
