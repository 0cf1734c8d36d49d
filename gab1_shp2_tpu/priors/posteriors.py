"""Posterior loading and parameter-ensemble generation.

Port of ``Julia/get_param_posteriors.jl``: MCMC chain samples provide
the four fitted parameters; everything else is drawn fresh from the
priors.  Chains are read from the reference's posterior CSVs (plain
text; the JLD2 binaries carry the same samples) or from this package's
own NUTS output.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd

from gab1_shp2_tpu.models.species import PNAMES
from gab1_shp2_tpu.priors.literature import EGF_UM, PriorSet, build_priors

FITTED = ("kG1p", "kG1dp", "kSa", "kSi")


def load_chain_csv(path: str) -> pd.DataFrame:
    """Load posterior samples with columns kG1p, kG1dp, kSa, kSi (the
    reference's ``Turing results/*_posteriors.csv`` layout)."""
    df = pd.read_csv(path)
    return df[list(FITTED)]


def best_fit_values(chain: pd.DataFrame) -> Dict[str, float]:
    """Highest-probability values: exp(median(log(chain)))
    (``get_param_posteriors.jl:17-20``)."""
    return {c: float(np.exp(np.log(chain[c]).median())) for c in FITTED}


def generate_ensemble(
    chain: Optional[pd.DataFrame],
    priors: Optional[PriorSet] = None,
    *,
    n: int = 2000,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Draw an (n, 24) parameter ensemble in reference column order.

    Fitted parameters are chain rows subsampled without replacement;
    all other parameters are fresh prior draws — five correlated
    binding-triple draws plus univariate lognormals
    (``get_param_posteriors.jl:38-86``).  With ``chain=None`` everything
    comes from the priors (prior-predictive ensembles).
    """
    rng = rng or np.random.default_rng(0)
    priors = priors or build_priors()

    draws: Dict[str, np.ndarray] = {}
    for key, (fname, rname) in {
        "G2": ("kG2f", "kG2r"), "G1": ("kG1f", "kG1r"),
        "S2": ("kS2f", "kS2r"), "EGF": ("kEGFf", "kEGFr"),
        "dim": ("kdf", "kdr"),
    }.items():
        kf, kr = priors.mv[key].kf_kr(priors.mv[key].sample(rng, n))
        draws[fname], draws[rname] = kf, kr
    for name in priors.UV_NAMES:
        mu, sigma = priors.uv(name)
        draws[name] = rng.lognormal(mu, sigma, size=n)
    draws["EGF"] = np.full(n, EGF_UM)

    if chain is not None:
        idx = rng.choice(len(chain), size=n, replace=False)
        sub = chain.iloc[idx]
        for c in FITTED:
            draws[c] = sub[c].to_numpy()

    return np.stack([draws[name] for name in PNAMES], axis=1)
