"""MD engine tests: NVE conservation-ish, Verlet cache, Langevin."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchani_tpu as tt
from torchani_tpu.md import MolecularDynamics, kinetic_temperature
from torchani_tpu.testing import make_water_box


@pytest.fixture(scope="module")
def model():
    return tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1)


def test_nve_runs_and_conserves_roughly(model):
    species, coords, cell = make_water_box(30)  # 10 waters
    md = MolecularDynamics(
        model, species, cell=cell, pbc=True, timestep_fs=0.2, skin=1.0
    )
    state = md.init(coords, temperature=50.0, key=jax.random.PRNGKey(0))
    e0 = float(state.energy) + _kinetic(state, md)
    state = md.run_nve(state, 20)
    assert int(state.step) == 20
    e1 = float(state.energy) + _kinetic(state, md)
    assert np.isfinite(e1)
    # loose energy conservation for a short, small-dt run
    assert abs(e1 - e0) < 5e-3 * abs(e0) + 0.05
    assert not bool(state.overflow)


def _kinetic(state, md):
    from torchani_tpu.md import ACCEL_UNIT

    return float(
        0.5 * jnp.sum(md.masses[:, None] * state.velocities**2) / ACCEL_UNIT
    )


def test_langevin_thermalizes(model):
    species, coords, cell = make_water_box(30)
    md = MolecularDynamics(
        model, species, cell=cell, pbc=True, timestep_fs=0.5, skin=1.0
    )
    state = md.init(coords, temperature=300.0, key=jax.random.PRNGKey(1))
    state = md.run_langevin(state, 30, temperature=300.0, friction_per_fs=0.05)
    temp = float(kinetic_temperature(state.velocities, md.masses))
    assert 30.0 < temp < 3000.0  # sane magnitude, finite
    assert np.isfinite(float(state.energy))


def test_verlet_cache_rebuilds(model):
    species, coords, cell = make_water_box(30)
    md = MolecularDynamics(
        model, species, cell=cell, pbc=True, timestep_fs=0.5, skin=0.3
    )
    state = md.init(coords, temperature=600.0, key=jax.random.PRNGKey(2))
    state = md.run_langevin(state, 50, temperature=600.0)
    assert int(state.rebuilds) > 0


def test_md_forces_match_single_point(model):
    """MD's cached-neighbor force path must equal the direct path."""
    species, coords, cell = make_water_box(30)
    md = MolecularDynamics(model, species, cell=cell, pbc=True)
    state = md.init(coords)
    from torchani_tpu.grad import energies_and_forces

    e, f = energies_and_forces(
        model,
        jnp.asarray(species),
        jnp.asarray(coords),
        jnp.asarray(cell),
        jnp.asarray([True, True, True]),
    )
    np.testing.assert_allclose(float(e[0]), float(state.energy), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(f)[0], np.asarray(state.forces), atol=2e-4
    )


def test_nonperiodic_md(model):
    rng = np.random.RandomState(0)
    # small methane-like cluster
    species = np.array([[6, 1, 1, 1, 1]])
    coords = np.array(
        [[[0.0, 0.0, 0.0], [0.63, 0.63, 0.63], [-0.63, -0.63, 0.63],
          [-0.63, 0.63, -0.63], [0.63, -0.63, -0.63]]], dtype=np.float32
    )
    md = MolecularDynamics(model, species, timestep_fs=0.2)
    state = md.init(coords, temperature=100.0)
    state = md.run_nve(state, 10)
    assert np.isfinite(float(state.energy))
    assert np.isfinite(np.asarray(state.coords)).all()
