"""Pair-potential parity against reference goldens (xTB, ZBL)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchani_tpu.potentials import RepulsionXTB, RepulsionZBL

from conftest import load_golden


@pytest.fixture(scope="module")
def goldens():
    return load_golden("potential_goldens.npz")


def _make(name):
    sym = ("H", "C", "N", "O")
    if name == "xtb":
        return RepulsionXTB.make(sym, cutoff=5.2)
    if name == "zbl":
        return RepulsionZBL.make(sym, cutoff=5.2)
    if name == "xtb_inf":
        return RepulsionXTB.make(sym)
    raise ValueError(name)


@pytest.mark.parametrize("name", ["xtb", "zbl", "xtb_inf"])
def test_energies(goldens, name):
    pot = _make(name)
    e = np.asarray(
        pot(
            jnp.asarray(goldens["elem"]),
            jnp.asarray(goldens["coords"]),
            atomic_nums_input=False,
        )
    )
    np.testing.assert_allclose(e, goldens[f"{name}_energies"], atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("name", ["xtb", "zbl"])
def test_atomic_energies(goldens, name):
    pot = _make(name)
    at = np.asarray(
        pot(
            jnp.asarray(goldens["elem"]),
            jnp.asarray(goldens["coords"]),
            atomic=True,
            atomic_nums_input=False,
        )
    )
    np.testing.assert_allclose(at, goldens[f"{name}_atomic"], atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("name", ["xtb", "zbl"])
def test_forces(goldens, name):
    pot = _make(name)
    elem = jnp.asarray(goldens["elem"])

    def total(c):
        return jnp.sum(pot(elem, c, atomic_nums_input=False))

    f = -np.asarray(jax.grad(total)(jnp.asarray(goldens["coords"])))
    np.testing.assert_allclose(f, goldens[f"{name}_forces"], atol=1e-5, rtol=1e-4)
