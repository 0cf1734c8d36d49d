"""Where does a RODAS4 step's time go? (bands / factor / solves / RHS)

Times each component of the lane-minor stiff step in isolation (20
chained iterations inside one jit to wash out dispatch latency) at the
bench shapes (dr=0.2 -> NB=50 blocks, B=256 lanes).  The per-step
recipe for rodas4 is 1 band build + 1 factor + 6 back-solves + 6 RHS
evaluations, so the component times directly predict the step cost and
identify the next optimization lever.

Usage: python scripts/profile_step_components.py [f32|f64mixed]
"""
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gab1_shp2_tpu as g
from gab1_shp2_tpu.models.params import Params
from gab1_shp2_tpu.models.species import CYTO, MEMB, N_CYTO, N_MEMB
from gab1_shp2_tpu.ops.batch_stiff import (
    BLK,
    cr_factor_lanes,
    cr_solve_lanes,
    make_mol_rhs_lanes,
)
from gab1_shp2_tpu.ops.jacobian import fast_block_jacobian_lanes

B = 256
R, dr = 10.0, 0.2
ITERS = 1000   # one dispatch per loop; large so the axon tunnel's
               # ~25 ms round-trip latency amortizes to noise
MODE = sys.argv[1] if len(sys.argv) > 1 else "f32"


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / ITERS


def main():
    print("devices:", jax.devices(), "mode:", MODE, flush=True)
    dtype = jnp.float64 if MODE == "f64mixed" else jnp.float32
    ls = jnp.float32

    system = g.base_system()
    Nr = int(round(R / dr))
    M = Nr - 1
    NB = M + 1
    Co = g.default_co().astype(dtype)
    rng = np.random.default_rng(0)
    p0 = np.asarray(g.default_params().pack())
    pb = Params.unpack(jnp.asarray(
        p0[None, :] * np.exp(rng.normal(0.0, 0.1, (B, 24))), dtype))

    f_lanes, r = make_mol_rhs_lanes(system, R, dr)
    C0 = jnp.zeros((N_CYTO, M, B), dtype)
    for name, j in (("iSFK", 0), ("GRB2", 1), ("GAB1", 2), ("SHP2", 3)):
        C0 = C0.at[CYTO[name]].set(Co[j])
    m0 = jnp.zeros((N_MEMB, B), dtype).at[MEMB["mE"]].set(Co[4])
    pad = jnp.zeros((BLK - N_MEMB, B), dtype)
    y0 = jnp.concatenate(
        [jnp.moveaxis(C0, 1, 0), jnp.concatenate([m0, pad])[None]], axis=0)

    pl = (Params(D=pb.D.astype(ls), k=pb.k.astype(ls))
          if ls != dtype else pb)

    @jax.jit
    def loop_rhs(y):
        def body(i, y):
            return y + 1e-9 * f_lanes(y, pb)
        return jax.lax.fori_loop(0, ITERS, body, y)

    @jax.jit
    def loop_bands(y):
        def body(i, acc):
            L, D_, U = fast_block_jacobian_lanes(
                system, (y + acc * 1e-30).astype(ls), pl, r, dr)
            return acc + jnp.sum(D_[0, 0, 0]).astype(dtype)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), dtype))

    L, D_, U = fast_block_jacobian_lanes(system, y0.astype(ls), pl, r, dr)
    hL = -0.25 * 1e-3 * L
    hD = jnp.eye(BLK, dtype=ls)[None, :, :, None] - 0.25 * 1e-3 * D_
    hU = -0.25 * 1e-3 * U

    @jax.jit
    def loop_factor(hL, hD, hU):
        def body(i, acc):
            fac = cr_factor_lanes(hL + acc * 1e-30, hD, hU)
            leaf = jax.tree_util.tree_leaves(fac)[0]
            return acc + leaf.ravel()[0].astype(ls)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), ls))

    fac = cr_factor_lanes(hL, hD, hU)

    @jax.jit
    def loop_solve6(b):
        def body(i, b):
            for _ in range(6):
                b = cr_solve_lanes(fac, b) * (1.0 - 1e-30)
            return b
        return jax.lax.fori_loop(0, ITERS, body, b)

    b0 = y0.astype(ls)
    t_rhs = timed(loop_rhs, y0)
    t_bands = timed(loop_bands, y0)
    t_factor = timed(loop_factor, hL, hD, hU)
    t_solve6 = timed(loop_solve6, b0)

    per_step = 6 * t_rhs + t_bands + t_factor + t_solve6
    print(f"RHS eval      : {t_rhs*1e6:8.1f} us  (x6 = {6*t_rhs*1e6:8.1f})")
    print(f"band build    : {t_bands*1e6:8.1f} us")
    print(f"factor        : {t_factor*1e6:8.1f} us")
    print(f"6 back-solves : {t_solve6*1e6:8.1f} us")
    print(f"sum (per step): {per_step*1e6:8.1f} us -> "
          f"{B/per_step:.0f} lane-steps/s", flush=True)


if __name__ == "__main__":
    main()
