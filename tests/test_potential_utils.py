"""Pair-potential curve helper (`potentials.utils`).

Parity surface: ``/root/reference/torchani/potentials/utils.py:20-98``
(matplotlib dimer-curve plotter).  The array core `pair_curves` is tested
directly; `plot` is the thin matplotlib wrapper over it.
"""

import numpy as np
import pytest

from torchani_tpu.potentials.lj import LennardJones
from torchani_tpu.potentials.utils import pair_curves
from torchani_tpu.units import HARTREE_TO_EV


@pytest.fixture(scope="module")
def lj():
    return LennardJones.make(
        ("H", "O"), eps=(0.001, 0.002), sigma=(1.2, 1.6), cutoff=6.0
    )


def test_default_pairs_and_shapes(lj):
    r, curves = pair_curves(lj, steps=64)
    assert r.shape == (64,)
    assert r[0] == pytest.approx(0.1)
    assert r[-1] == pytest.approx(6.0)  # xmax defaults to the cutoff
    assert set(curves) == {("H", "H"), ("H", "O"), ("O", "O")}
    for v in curves.values():
        assert v.shape == (64,)
        assert np.all(np.isfinite(v))


def test_energy_curve_matches_formula():
    # LJ dimer with no cutoff envelope: mixing rules reduce to per-pair
    # sigma/eps; the helper must reproduce 4 eps ((s/r)^12 - (s/r)^6).
    pot = LennardJones.make(
        ("H", "O"), eps=(0.001, 0.002), sigma=(1.2, 1.6), cutoff=6.0,
        cutoff_fn="dummy",
    )
    r, curves = pair_curves(pot, symbol_pairs=[("H", "O")], xmin=1.0, xmax=2.0, steps=5)
    eps = np.sqrt(0.001 * 0.002)
    sigma = (1.2 + 1.6) / 2
    x = sigma / r
    expected = 4 * eps * (x**12 - x**6)
    np.testing.assert_allclose(curves[("H", "O")], expected, rtol=1e-4)


def test_force_curve_is_negative_gradient(lj):
    r, e = pair_curves(lj, symbol_pairs=[("H", "H")], xmin=1.0, xmax=3.0, steps=201)
    _, f = pair_curves(
        lj, symbol_pairs=[("H", "H")], xmin=1.0, xmax=3.0, steps=201, force=True
    )
    num = -np.gradient(e[("H", "H")], r)
    np.testing.assert_allclose(f[("H", "H")][5:-5], num[5:-5], rtol=5e-2, atol=2e-5)


def test_unit_conversion(lj):
    _, e_ha = pair_curves(lj, symbol_pairs=[("O", "O")], steps=16)
    _, e_ev = pair_curves(lj, symbol_pairs=[("O", "O")], steps=16, eunits="ev")
    np.testing.assert_allclose(
        e_ev[("O", "O")], e_ha[("O", "O")] * HARTREE_TO_EV, rtol=1e-6
    )


def test_bad_units_raise(lj):
    with pytest.raises(ValueError, match="Unsupported unit"):
        pair_curves(lj, eunits="calories")
    with pytest.raises(ValueError, match="Unsupported unit"):
        pair_curves(lj, runits="parsec")
