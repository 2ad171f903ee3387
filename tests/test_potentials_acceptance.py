"""Acceptance tests against the reference's OWN shipped golden pickles.

These expected values come straight from
``/root/reference/tests/resources/potentials/*.pkl`` (repackaged by
``tools/make_goldens.py``) — the same files the reference's
``test_potentials_acceptance.py`` gates on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchani_tpu.potentials import (
    DispersionLJ,
    FixedCoulomb,
    FixedMNOK,
    LennardJones,
    RepulsionLJ,
    RepulsionZBL,
)
from torchani_tpu.utils import SYMBOLS_2X

from conftest import load_golden


@pytest.fixture(scope="module")
def goldens():
    return load_golden("acceptance_goldens.npz")


def _make(name):
    sym = SYMBOLS_2X
    return {
        "zbl": lambda: RepulsionZBL.make(sym),
        "lj": lambda: LennardJones.make(sym),
        "rep-lj": lambda: RepulsionLJ.make(sym),
        "disp-lj": lambda: DispersionLJ.make(sym),
        "fixed-coulomb": lambda: FixedCoulomb.make(sym, charges=[0.1] * len(sym)),
        "fixed-mnok": lambda: FixedMNOK.make(
            sym, charges=[0.1] * len(sym), eta=[0.01] * len(sym)
        ),
    }[name]()


NAMES = ["zbl", "lj", "rep-lj", "disp-lj", "fixed-coulomb", "fixed-mnok"]


@pytest.mark.parametrize("name", NAMES)
def test_energies_match_reference_goldens(goldens, name):
    pot = _make(name)
    e = np.asarray(
        pot(jnp.asarray(goldens["e_atomic_nums"]), jnp.asarray(goldens["e_coords"]))
    )
    np.testing.assert_allclose(
        e, goldens[f"{name}_energies"], atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("name", NAMES)
def test_forces_match_reference_goldens(goldens, name):
    pot = _make(name)
    species = jnp.asarray(goldens["f_atomic_nums"])

    def total(c):
        return jnp.sum(pot(species, c))

    e = np.asarray(pot(species, jnp.asarray(goldens["f_coords"])))
    f = -np.asarray(jax.grad(total)(jnp.asarray(goldens["f_coords"])))
    np.testing.assert_allclose(
        e, goldens[f"{name}_f_energies"], atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        f, goldens[f"{name}_forces"], atol=1e-4, rtol=1e-3
    )
