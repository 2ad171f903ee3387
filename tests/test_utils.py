"""Utility-layer tests (padding, formulas, conversions, units)."""

import math

import jax.numpy as jnp
import numpy as np

from torchani_tpu import units
from torchani_tpu.utils import (
    ChemicalSymbolsToInts,
    atomic_numbers_to_symbols,
    get_atomic_masses,
    linspace,
    map_to_central,
    pad_atomic_properties,
    sort_by_atomic_num,
    species_to_formula,
    strip_redundant_padding,
    symbols_to_atomic_numbers,
)


def test_linspace_excludes_endpoint():
    vals = linspace(0.9, 5.2, 16)
    assert len(vals) == 16
    assert vals[0] == 0.9
    assert vals[-1] < 5.2
    # must match the reference construction exactly (pure python arithmetic)
    assert vals[1] == 0.9 + (5.2 - 0.9) / 16


def test_pad_atomic_properties():
    a = {
        "species": np.array([[1, 6]]),
        "coordinates": np.zeros((1, 2, 3), np.float32),
        "energies": np.array([1.0]),
    }
    b = {
        "species": np.array([[8, 1, 1]]),
        "coordinates": np.ones((1, 3, 3), np.float32),
        "energies": np.array([2.0]),
    }
    out = pad_atomic_properties([a, b])
    assert out["species"].shape == (2, 3)
    assert out["species"][0, 2] == -1
    assert out["coordinates"][0, 2].sum() == 0.0
    np.testing.assert_array_equal(out["energies"], [1.0, 2.0])


def test_strip_redundant_padding():
    props = {
        "species": np.array([[1, 6, -1, -1], [8, -1, -1, -1]]),
        "coordinates": np.zeros((2, 4, 3)),
    }
    out = strip_redundant_padding(props)
    assert out["species"].shape == (2, 2)


def test_map_to_central():
    cell = jnp.asarray(np.eye(3, dtype=np.float32) * 5.0)
    pbc = jnp.asarray([True, True, True])
    coords = jnp.asarray([[[6.0, -1.0, 2.5]]])
    out = np.asarray(map_to_central(coords, cell, pbc))
    np.testing.assert_allclose(out[0, 0], [1.0, 4.0, 2.5], atol=1e-5)


def test_species_to_formula():
    assert species_to_formula(np.array([["H", "H", "C"]])) == ["CH2"]


def test_symbol_conversions():
    assert symbols_to_atomic_numbers(("H", "C", "Cl")) == (1, 6, 17)
    assert atomic_numbers_to_symbols((8, 16)) == ("O", "S")
    assert sort_by_atomic_num(("O", "H", "C")) == ("H", "C", "O")
    conv = ChemicalSymbolsToInts(("H", "C", "N", "O"))
    np.testing.assert_array_equal(conv(["O", "H"]), [3, 0])


def test_masses():
    m = np.asarray(get_atomic_masses(jnp.asarray([1, 6, -1])))
    assert abs(m[0] - 1.008) < 1e-3
    assert abs(m[1] - 12.011) < 1e-3
    assert m[2] == 0.0


def test_units_consistency():
    assert math.isclose(units.hartree2ev(1.0), 27.211386024367243)
    assert math.isclose(
        units.hartree2kcalpermol(1.0), 627.5094738898777, rel_tol=1e-9
    )
    assert math.isclose(units.angstrom2bohr(units.bohr2angstrom(2.0)), 2.0)
    # vibrational conversion constant sanity (~17092, reference units.py:66)
    assert abs(units.SQRT_MHESSIAN_TO_INVCM - 17092) < 1.0
