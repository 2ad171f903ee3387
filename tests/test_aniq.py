"""ANIq (charge model) tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import torchani_tpu as tt


@pytest.fixture(scope="module")
def water():
    species = jnp.asarray([[8, 1, 1]])
    coords = jnp.asarray(
        [[[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]]]
    )
    return species, coords


def test_merged_charges_sum_to_total(water):
    species, coords = water
    m = tt.simple_aniq(("H", "C", "N", "O"), ensemble_size=1)
    out = m.energies_and_charges(species, coords)
    assert out.scalars.shape == species.shape
    np.testing.assert_allclose(float(out.scalars.sum()), 0.0, atol=1e-6)
    out1 = m.energies_and_charges(species, coords, charge=1)
    np.testing.assert_allclose(float(out1.scalars.sum()), 1.0, atol=1e-5)


def test_separate_charge_networks(water):
    species, coords = water
    m = tt.simple_aniq(("H", "C", "N", "O"), merge_charge_networks=False)
    out = m.energies_and_charges(species, coords)
    assert np.isfinite(np.asarray(out.energies)).all()
    np.testing.assert_allclose(float(out.scalars.sum()), 0.0, atol=1e-6)
    # energy path must match the underlying plain model semantics
    e = m(species, coords)
    np.testing.assert_allclose(np.asarray(e), np.asarray(out.energies), atol=1e-6)


def test_aniq_forces(water):
    import jax

    species, coords = water
    m = tt.simple_aniq(("H", "C", "N", "O"))
    g = jax.grad(lambda c: jnp.sum(m(species, c)))(coords)
    assert np.isfinite(np.asarray(g)).all()


def test_aniq_padding(water):
    species, coords = water
    m = tt.simple_aniq(("H", "C", "N", "O"))
    pad_s = jnp.concatenate([species, jnp.full((1, 2), -1, species.dtype)], axis=1)
    pad_c = jnp.concatenate([coords, jnp.zeros((1, 2, 3))], axis=1)
    out = m.energies_and_charges(pad_s, pad_c)
    base = m.energies_and_charges(species, coords)
    np.testing.assert_allclose(
        np.asarray(out.energies), np.asarray(base.energies), atol=1e-5
    )
    assert np.asarray(out.scalars)[0, 3:].max() == 0.0
