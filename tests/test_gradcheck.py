"""Numerical-vs-analytic derivative checks (reference test_gradcheck/test_ase
analogs) and PBC edge-visibility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchani_tpu as tt
from torchani_tpu.grad import energies_and_forces, stress_scaling


@pytest.fixture(scope="module")
def model():
    m = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1)
    # disable the huge constant SAE shift: finite differences on f32
    # energies of ~-100 Ha would drown in rounding noise otherwise
    return m.replace(energy_shifter=m.energy_shifter.replace(enabled=False))


def _numerical_forces(f_energy, coords, eps=1e-3):
    coords = np.asarray(coords, dtype=np.float64)
    out = np.zeros_like(coords)
    for idx in np.ndindex(coords.shape):
        cp = coords.copy()
        cp[idx] += eps
        ep = f_energy(cp.astype(np.float32))
        cm = coords.copy()
        cm[idx] -= eps
        em = f_energy(cm.astype(np.float32))
        out[idx] = -(ep - em) / (2 * eps)
    return out


def test_forces_match_finite_differences(model):
    rng = np.random.RandomState(0)
    species = jnp.asarray([[8, 1, 1, 6]])
    coords = rng.rand(1, 4, 3).astype(np.float32) * 2 + 0.5

    def f_energy(c):
        return float(model(species, jnp.asarray(c))[0])

    _, analytic = energies_and_forces(model, species, jnp.asarray(coords))
    numerical = _numerical_forces(f_energy, coords)
    # tolerance floor set by f32 energy precision through the FD stencil
    np.testing.assert_allclose(np.asarray(analytic), numerical, atol=5e-3)


def test_stress_matches_numerical(model):
    from torchani_tpu.testing import make_water_box

    species, coords, cell = make_water_box(30)
    sp = jnp.asarray(species)
    pbc = jnp.asarray([True, True, True])
    analytic = np.asarray(
        stress_scaling(model, sp, jnp.asarray(coords), jnp.asarray(cell), pbc)
    )
    # numerical: strain the cell+coords by +-eps along diagonal components
    volume = float(np.abs(np.linalg.det(cell)))
    eps = 1e-4
    for axis in range(3):
        scale_p = np.eye(3, dtype=np.float32)
        scale_p[axis, axis] += eps
        scale_m = np.eye(3, dtype=np.float32)
        scale_m[axis, axis] -= eps
        ep = float(
            model(sp, jnp.asarray(coords @ scale_p), jnp.asarray(cell @ scale_p), pbc)[0]
        )
        em = float(
            model(sp, jnp.asarray(coords @ scale_m), jnp.asarray(cell @ scale_m), pbc)[0]
        )
        numerical = (ep - em) / (2 * eps) / volume
        np.testing.assert_allclose(analytic[axis, axis], numerical, atol=5e-4)


def test_pbc_corner_atoms_see_each_other():
    """Atoms at opposite corners of the cell are close through PBC."""
    aevc = tt.AEVComputer.like_1x()
    cell = jnp.asarray(np.eye(3, dtype=np.float32) * 10.0)
    pbc = jnp.asarray([True, True, True])
    eps = 0.05
    coords = jnp.asarray(
        [[[eps, eps, eps], [10.0 - eps, 10.0 - eps, 10.0 - eps]]]
    )
    elem = jnp.asarray([[0, 1]])
    aev = np.asarray(aevc(elem, coords, cell=cell, pbc=pbc))
    # both atoms must have nonzero AEVs (they are ~0.17 A apart via PBC)
    assert np.abs(aev[0, 0]).max() > 0
    assert np.abs(aev[0, 1]).max() > 0
    # and match the directly-adjacent configuration
    direct = jnp.asarray([[[eps, eps, eps], [-eps, -eps, -eps]]])
    aev2 = np.asarray(aevc(elem, direct))
    np.testing.assert_allclose(aev, aev2, atol=1e-4)


def test_pbc_face_atoms_see_each_other():
    aevc = tt.AEVComputer.like_1x()
    cell = jnp.asarray(np.eye(3, dtype=np.float32) * 10.0)
    pbc = jnp.asarray([True, True, True])
    coords = jnp.asarray([[[0.1, 5.0, 5.0], [9.9, 5.0, 5.0]]])
    elem = jnp.asarray([[0, 0]])
    aev = np.asarray(aevc(elem, coords, cell=cell, pbc=pbc))
    # must match the directly-adjacent configuration (0.2 A apart)
    direct = jnp.asarray([[[0.1, 5.0, 5.0], [-0.1, 5.0, 5.0]]])
    expected = np.asarray(aevc(elem, direct))
    assert np.abs(expected).max() > 0  # they do see each other
    np.testing.assert_allclose(aev, expected, atol=1e-5)