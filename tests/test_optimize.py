"""FIRE minimizer tests: single-system convergence and the batched
variant's per-conformer equivalence with the single-system path.

Reference analog: the reference delegates optimization to ASE (its CLI
``ani opt`` is a stub, reference cli.py:127); these cover our native
jitted implementation instead.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import torchani_tpu as tt
from torchani_tpu.optimize import minimize_fire, minimize_fire_batched


@pytest.fixture(scope="module")
def model():
    import jax
    return tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1, key=jax.random.PRNGKey(7))


def _water(stretch):
    return np.asarray(
        [
            [0.0, 0.0, 0.119],
            [0.0, 0.763 * stretch, -0.477],
            [0.0, -0.763, -0.477 * stretch],
        ],
        np.float32,
    )


def test_fire_converges(model):
    species = jnp.asarray([[8, 1, 1]])

    def energy_fn(c):
        return model(species, c[None])[0]

    coords = jnp.asarray(_water(1.15))
    e_start = float(energy_fn(coords))
    st = minimize_fire(energy_fn, coords, max_steps=400, fmax=0.01)
    assert float(st.fmax) <= 0.01
    assert float(st.energy) < e_start


def test_fire_batched_matches_single(model):
    """Each conformer of a batched relaxation must follow the same FIRE
    trajectory it would alone (per-conformer dt/alpha/convergence), with
    padding atoms untouched."""
    stretches = [1.05, 1.12, 0.94]
    # batch padded to 4 atoms (one dummy row) to exercise the atom mask
    species_b = jnp.asarray([[8, 1, 1, -1]] * len(stretches))
    coords_b = np.zeros((len(stretches), 4, 3), np.float32)
    for i, s in enumerate(stretches):
        coords_b[i, :3] = _water(s)
    coords_b[:, 3] = 7.7  # far-away dummy placeholder coords

    def batched_energy(c):
        return model(species_b, c)

    st_b = minimize_fire_batched(
        batched_energy,
        jnp.asarray(coords_b),
        atom_mask=species_b >= 0,
        max_steps=300,
        fmax=0.01,
    )
    assert bool(jnp.all(st_b.fmax <= 0.01))
    # dummy rows never move
    np.testing.assert_array_equal(np.asarray(st_b.coords[:, 3]), coords_b[:, 3])

    species1 = jnp.asarray([[8, 1, 1]])
    for i, s in enumerate(stretches):
        st1 = minimize_fire(
            lambda c: model(species1, c[None])[0],
            jnp.asarray(_water(s)),
            max_steps=300,
            fmax=0.01,
        )
        np.testing.assert_allclose(
            np.asarray(st_b.energy[i]), np.asarray(st1.energy), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(st_b.coords[i, :3]), np.asarray(st1.coords), atol=2e-3
        )


def test_fire_batched_freezes_converged(model):
    """A conformer starting at (near-)convergence must come back unchanged
    even while others keep iterating."""
    species_b = jnp.asarray([[8, 1, 1]] * 2)

    def batched_energy(c):
        return model(species_b, c)

    # relax conformer 0 first, then batch it with a stretched one
    st0 = minimize_fire(
        lambda c: model(jnp.asarray([[8, 1, 1]]), c[None])[0],
        jnp.asarray(_water(1.0)),
        max_steps=300,
        fmax=0.005,
    )
    coords_b = jnp.stack([st0.coords, jnp.asarray(_water(1.15))])
    st_b = minimize_fire_batched(
        batched_energy, coords_b, max_steps=300, fmax=0.02
    )
    np.testing.assert_array_equal(
        np.asarray(st_b.coords[0]), np.asarray(st0.coords)
    )
    assert bool(jnp.all(st_b.fmax <= 0.02))
