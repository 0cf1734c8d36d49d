"""Parameter container and species table tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from gab1_shp2_tpu.models.params import (
    Params,
    default_co,
    default_params,
    hela_co,
    stability_dt,
)
from gab1_shp2_tpu.models.species import (
    CYTO_SPECIES,
    DIFF_NAMES,
    K_NAMES,
    MEMB_SPECIES,
    PNAMES,
)


def test_species_tables():
    assert len(CYTO_SPECIES) == 10
    assert len(MEMB_SPECIES) == 8
    assert len(DIFF_NAMES) == 7
    assert len(K_NAMES) == 17
    assert len(PNAMES) == 24


def test_pack_unpack_roundtrip():
    p = default_params()
    packed = p.pack()
    assert packed.shape == (24,)
    p2 = Params.unpack(packed)
    np.testing.assert_array_equal(np.asarray(p.D), np.asarray(p2.D))
    np.testing.assert_array_equal(np.asarray(p.k), np.asarray(p2.k))


def test_named_accessors_and_replace():
    p = default_params(fit="map")
    assert float(p.kG1p) == pytest.approx(42.0)
    assert float(p.kSi) == pytest.approx(0.095)
    assert float(p.EGF) == pytest.approx(1.67e-3)
    p2 = p.replace(kSa=1.5).scale(Dsfk=2.0)
    assert float(p2.kSa) == 1.5
    assert float(p2.Dsfk) == pytest.approx(2.0 * float(p.Dsfk))
    # original untouched
    assert float(p.kSa) == pytest.approx(16.175675458812922)


def test_stability_dt_formula():
    p = default_params()
    dr = 0.1
    expect = 0.99 / (2.0 * (float(jnp.max(p.D)) / dr**2 + float(jnp.sum(p.k)) / 4))
    assert float(stability_dt(p, dr)) == pytest.approx(expect, rel=1e-12)


def test_concentration_conversions():
    co = default_co()
    R = 10.0
    vol = 4.0 / 3.0 * np.pi * R**3
    sa = 4.0 * np.pi * R**2
    assert float(co[0]) == pytest.approx(6e5 / vol)
    assert float(co[4]) == pytest.approx(6e5 / sa)
    hela = hela_co()
    assert float(hela[2]) == pytest.approx(1.53e3 / vol)
    assert float(hela[4]) == pytest.approx(9.3e4 / sa)


def test_ensemble_csv_roundtrip(reference_dir):
    from gab1_shp2_tpu.models.params import load_ensemble_csv

    ens = load_ensemble_csv(f"{reference_dir}/Julia/parameter_ensemble.csv")
    assert ens.shape == (5000, 24)
    p = Params.unpack(jnp.asarray(ens))
    assert p.D.shape == (5000, 7)
    # EGF column is constant 1.67e-3 in the reference ensemble
    np.testing.assert_allclose(np.asarray(p.EGF), 1.67e-3)
