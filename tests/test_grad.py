"""Gradient API tests: hessians, vibrational analysis, force training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchani_tpu as tt
from torchani_tpu.convert import load_state_dict
from torchani_tpu.grad import hessians, energies_and_forces

from conftest import load_golden


@pytest.fixture(scope="module")
def setup():
    g = load_golden("vib_goldens.npz")
    sd = {k[3:]: v for k, v in g.items() if k.startswith("sd.")}
    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1)
    model = load_state_dict(model, sd)
    return model, g


def test_hessian_matches_reference(setup):
    model, g = setup
    h = np.asarray(
        hessians(model, jnp.asarray(g["species"]), jnp.asarray(g["coords"]))
    )
    np.testing.assert_allclose(h, g["hessians"], atol=2e-4, rtol=1e-3)


def test_forces_match(setup):
    model, g = setup
    e, f = energies_and_forces(
        model, jnp.asarray(g["species"]), jnp.asarray(g["coords"])
    )
    np.testing.assert_allclose(np.asarray(e), g["energies"], atol=5e-5)
    np.testing.assert_allclose(np.asarray(f), g["forces"], atol=1e-5)


def test_hessian_is_symmetric(setup):
    model, g = setup
    h = np.asarray(
        hessians(model, jnp.asarray(g["species"]), jnp.asarray(g["coords"]))
    )[0]
    np.testing.assert_allclose(h, h.T, atol=1e-4)


def test_vibrational_analysis(setup):
    model, g = setup
    res = tt.single_point(
        model,
        jnp.asarray(g["species"]),
        jnp.asarray(g["coords"]),
        vibrational=True,
    )
    freqs = np.asarray(res["freqs"])[0]
    # water: 3 translational + 3 rotational near-zero + 3 real modes
    assert freqs.shape == (9,)
    assert np.isfinite(freqs).all()
    # top modes should be positive and ordered
    assert freqs[-1] >= freqs[-2] >= freqs[-3] > 0


def test_force_training_grad_of_grad(setup):
    """Energy+force loss differentiates through the force computation."""
    model, g = setup
    species = jnp.asarray(g["species"])
    coords = jnp.asarray(g["coords"])
    target_f = jnp.asarray(g["forces"])

    def loss(m):
        def esum(mm, c):
            return jnp.sum(mm(species, c))

        e = m(species, coords)
        f = -jax.grad(esum, argnums=1)(m, coords)
        return jnp.mean(e**2) + jnp.mean((f - target_f) ** 2)

    grads = jax.grad(loss)(model)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
    # at least one weight gradient must be nonzero
    assert any(np.abs(np.asarray(leaf)).max() > 0 for leaf in leaves)
