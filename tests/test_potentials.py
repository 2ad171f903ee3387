"""Pair-potential parity against reference goldens (xTB, ZBL)."""

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
    RepulsionXTB,
    RepulsionZBL,
    TwoBodyDispersionD3,
)

from conftest import load_golden

ALL_NAMES = [
    "xtb", "zbl", "xtb_inf", "d3", "d3_inf", "lj", "lj_rep", "lj_disp",
    "coulomb", "mnok",
]


@pytest.fixture(scope="module")
def goldens():
    return load_golden("potential_goldens.npz")


def _make(name):
    sym = ("H", "C", "N", "O")
    charges = (0.2, -0.3, -0.4, 0.5)
    etas = (0.9, 0.8, 0.7, 0.6)
    return {
        "xtb": lambda: RepulsionXTB.make(sym, cutoff=5.2),
        "zbl": lambda: RepulsionZBL.make(sym, cutoff=5.2),
        "xtb_inf": lambda: RepulsionXTB.make(sym),
        "d3": lambda: TwoBodyDispersionD3.from_functional(sym, "wb97x", cutoff=8.0),
        "d3_inf": lambda: TwoBodyDispersionD3.from_functional(sym, "b973c"),
        "lj": lambda: LennardJones.ff19SB(sym, cutoff=6.0),
        "lj_rep": lambda: RepulsionLJ.ff19SB(sym),
        "lj_disp": lambda: DispersionLJ.ff19SB(sym),
        "coulomb": lambda: FixedCoulomb.make(
            sym, dielectric=2.0, charges=charges, cutoff=6.0
        ),
        "mnok": lambda: FixedMNOK.make(sym, charges=charges, eta=etas),
    }[name]()


@pytest.mark.parametrize("name", ALL_NAMES)
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


@pytest.mark.parametrize("name", ["xtb", "zbl", "d3", "lj", "coulomb", "mnok"])
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


@pytest.mark.parametrize("name", ["xtb", "zbl", "d3", "lj", "coulomb", "mnok"])
def test_forces(goldens, name):
    pot = _make(name)
    elem = jnp.asarray(goldens["elem"])

    def total(c):
        return jnp.sum(pot(elem, c, atomic_nums_input=False))

    f = -np.asarray(jax.grad(total)(jnp.asarray(goldens["coords"])))
    np.testing.assert_allclose(f, goldens[f"{name}_forces"], atol=1e-5, rtol=1e-4)


def test_d3_factorized_matches_literal_grid(goldens):
    """The factorized CN-reference Gaussian path (5 exps per atom) equals
    the literal 25-channel pair grid (values and gradients): the Grimme
    interpolation channels are the product grid of per-element reference
    lists, so exp(-K3(a^2+b^2)) factors exactly."""
    pot = _make("d3")
    assert pot.cn_refs is not None, "factorization should verify for HCNOS"
    literal = pot.replace(cn_refs=None)
    elem = jnp.asarray(goldens["elem"])
    coords = jnp.asarray(goldens["coords"])

    e_new = np.asarray(pot(elem, coords, atomic_nums_input=False))
    e_old = np.asarray(literal(elem, coords, atomic_nums_input=False))
    np.testing.assert_allclose(e_new, e_old, rtol=1e-5, atol=1e-8)

    def total(p, c):
        return jnp.sum(p(elem, c, atomic_nums_input=False))

    g_new = np.asarray(jax.grad(lambda c: total(pot, c))(coords))
    g_old = np.asarray(jax.grad(lambda c: total(literal, c))(coords))
    assert np.isfinite(g_new).all()
    np.testing.assert_allclose(g_new, g_old, rtol=1e-4, atol=1e-7)
