"""TPU-native GAB1-SHP2/EGFR reaction-diffusion modeling framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
Myers-Furcht et al. GAB1-SHP2 PDE model codebase
(pauljmyers/Myers-Furcht-et-al_GAB1-SHP2-PDE-model): a 1-D spherical
reaction-diffusion model of EGFR -> GRB2 -> GAB1 -> SHP2 signaling with
Bayesian parameter inference, ensemble uncertainty quantification, and
eFAST global sensitivity analysis.

Design (TPU-first, not a translation):
  * one declarative ``ReactionDiffusionSystem`` replaces the reference's
    seven hand-unrolled Julia solver clones (``basepdesolver.jl`` etc.);
    variants (membrane-confined SFKs, rectangular geometry, gefitinib
    pulse-chase) are configuration, not code forks.
  * method-of-lines lowering produces a single fused XLA RHS over the
    ``(species, node)`` state array; the explicit path additionally ships a
    Pallas kernel that advances many time steps entirely in VMEM.
  * the stiff production path is a TRBDF2 integrator with a structured
    block-tridiagonal Jacobian and batched block-Thomas Newton solves,
    fully ``vmap``-able over parameter ensembles.
  * the scaling axis is the *ensemble* axis: ``jax.vmap`` per device and
    ``shard_map``/``pjit`` over a device mesh for multi-chip runs; failed
    lanes are masked with ``where`` instead of try/catch.

Float64 is enabled at import: the reference science (stiff kinetics over
five decades of rate constants, 1e5-step explicit integrations) requires
it for tolerance-level parity; single-precision paths are opt-in per
solver via the ``dtype`` argument.
"""

import jax

jax.config.update("jax_enable_x64", True)

from gab1_shp2_tpu.models.params import (  # noqa: E402
    Params,
    default_co,
    default_params,
    hela_co,
)
from gab1_shp2_tpu.models.system import (  # noqa: E402
    Geometry,
    ReactionDiffusionSystem,
    base_system,
    memb_sfk_system,
    rect_system,
)
from gab1_shp2_tpu.ops.explicit import solve_explicit  # noqa: E402
from gab1_shp2_tpu.ops.batch_stiff import solve_stiff_batch  # noqa: E402
from gab1_shp2_tpu.ops.trbdf2 import solve_stiff  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "Params",
    "default_co",
    "default_params",
    "hela_co",
    "Geometry",
    "ReactionDiffusionSystem",
    "base_system",
    "memb_sfk_system",
    "rect_system",
    "solve_explicit",
    "solve_stiff",
    "solve_stiff_batch",
]
