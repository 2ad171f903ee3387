"""Model energy/force parity against reference goldens."""

import jax.numpy as jnp
import numpy as np
import pytest

import torchani_tpu as tt
from torchani_tpu.convert import load_state_dict
from torchani_tpu.grad import energies_and_forces

from conftest import load_golden


@pytest.fixture(scope="module")
def setup():
    g = load_golden("model_goldens.npz")
    sd = {k[3:]: v for k, v in g.items() if k.startswith("sd.")}
    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=2)
    model = load_state_dict(model, sd)
    return model, g


def test_energies(setup):
    model, g = setup
    e = np.asarray(model(jnp.asarray(g["species"]), jnp.asarray(g["coords"])))
    # Total energies are dominated by the ~O(100 Ha) self-energy sum, where
    # one f32 ulp is ~3e-5 Ha — an absolute 1e-5 gate on TOTALS is below
    # f32 representational precision (the reference accumulates the same
    # sums in different order; measured residue = exactly 1 ulp).  Gate
    # totals at 1e-5 + 2 ulp relative; the strict 1e-5 Ha BASELINE gate is
    # enforced where it is representable: per-atom energies
    # (test_atomic_energies) and forces (test_forces), both pure 1e-5.
    np.testing.assert_allclose(e, g["energies"], atol=1e-5, rtol=2.4e-7)


def test_forces(setup):
    model, g = setup
    _, f = energies_and_forces(
        model, jnp.asarray(g["species"]), jnp.asarray(g["coords"])
    )
    np.testing.assert_allclose(np.asarray(f), g["forces"], atol=1e-5)


def test_atomic_energies(setup):
    model, g = setup
    at = np.asarray(
        model(jnp.asarray(g["species"]), jnp.asarray(g["coords"]), atomic=True)
    )
    np.testing.assert_allclose(at, g["atomic"], atol=1e-5)


def test_member_energies(setup):
    model, g = setup
    mem = np.asarray(
        model(
            jnp.asarray(g["species"]), jnp.asarray(g["coords"]), ensemble_values=True
        )
    )
    np.testing.assert_allclose(mem, g["members"], atol=5e-5)


def test_qbc(setup):
    model, g = setup
    out = model.energies_qbcs(jnp.asarray(g["species"]), jnp.asarray(g["coords"]))
    members = g["members"]
    num_atoms = (g["species"] >= 0).sum(axis=1)
    expect = members.std(axis=0, ddof=1) / np.sqrt(num_atoms)
    np.testing.assert_allclose(np.asarray(out.qbcs), expect, atol=5e-5)


def test_single_point(setup):
    model, g = setup
    res = tt.single_point(
        model,
        jnp.asarray(g["species"]),
        jnp.asarray(g["coords"]),
        forces=True,
        ensemble_values=True,
    )
    np.testing.assert_allclose(np.asarray(res["energies"]), g["energies"], atol=5e-5)
    np.testing.assert_allclose(np.asarray(res["forces"]), g["forces"], atol=1e-5)
    assert res["qbcs"].shape == g["energies"].shape


def test_padding_equivalence(setup):
    model, g = setup
    species, coords = g["species"][:2], g["coords"][:2]
    base = np.asarray(model(jnp.asarray(species), jnp.asarray(coords)))
    pad_s = np.concatenate([species, np.full((2, 4), -1, species.dtype)], axis=1)
    pad_c = np.concatenate([coords, np.zeros((2, 4, 3), coords.dtype)], axis=1)
    padded = np.asarray(model(jnp.asarray(pad_s), jnp.asarray(pad_c)))
    np.testing.assert_allclose(padded, base, atol=5e-5)
