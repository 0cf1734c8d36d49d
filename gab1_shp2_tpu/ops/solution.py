"""Solution container with named species access and derived outputs."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gab1_shp2_tpu.models.species import CYTO, MEMB
from gab1_shp2_tpu.ops.rhs import etot


class Solution(NamedTuple):
    """Trajectory of one PDE solve.

    ``C``: (Nts+1, 10, Nr+1) bulk profiles (time, species, node);
    ``m``: (Nts+1, 8) membrane states; ``t``: (Nts+1,) save times;
    ``r``: (Nr+1,) radial grid; ``CoEGFR``: scalar total EGFR (for the
    %-phosphorylated output).  Leading batch dimensions appear when the
    solve was vmapped; all accessors broadcast over them.

    Named outputs mirror the reference solver's return NamedTuple
    (``basepdesolver.jl:303-311``) but with time as the leading axis.
    """

    C: jax.Array
    m: jax.Array
    t: jax.Array
    r: jax.Array
    CoEGFR: jax.Array

    def cyto(self, name: str) -> jax.Array:
        """Bulk species trajectory, shape (..., Nts+1, Nr+1)."""
        return self.C[..., CYTO[name], :]

    def memb(self, name: str) -> jax.Array:
        """Membrane species trajectory, shape (..., Nts+1)."""
        return self.m[..., MEMB[name]]

    # --- derived outputs (basepdesolver.jl:287,298-300) -------------------
    @property
    def PG1Stot(self) -> jax.Array:
        """Total GAB1-SHP2 complexes: PG1S + G2PG1S."""
        return self.cyto("PG1S") + self.cyto("G2PG1S")

    @property
    def PG1tot(self) -> jax.Array:
        """Total phosphorylated GAB1: pGAB1 + G2PG1 + PG1Stot."""
        return self.cyto("pGAB1") + self.cyto("G2PG1") + self.PG1Stot

    @property
    def pE(self) -> jax.Array:
        """Percent phosphorylated EGFR: Etot*100/CoEGFR
        (``basepdesolver.jl:287``)."""
        return etot(self.m) * 100.0 / self.CoEGFR[..., None]

    @property
    def EGFR_SHP2(self) -> jax.Array:
        """Percent EGFR with SHP2 bound: EG2PG1S*100/CoEGFR
        (``pulsechase_solver.jl:289``)."""
        return self.memb("EG2PG1S") * 100.0 / self.CoEGFR[..., None]


def spatial_average(C_of_r: jax.Array, r: jax.Array, R) -> jax.Array:
    """Volume average ``3/R^3 * int_0^R C r^2 dr`` by trapezoid.

    Matches the reference's observable extraction
    (``param_fitting+inference_finitediff.jl:212-216``,
    ``sapdesolver.jl:315``).  ``C_of_r``'s trailing axis is the node axis.
    """
    w = C_of_r * r**2
    return jnp.trapezoid(w, r, axis=-1) * 3.0 / R**3
