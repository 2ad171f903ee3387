"""Multiple-timestep (RESPA) MD: exact split, every=1 identity, NVE drift.

The MTS driver (``md.MultipleTimestepMD``) splits a long-cutoff model
(reference ANI-2dr class: NNP + repulsion + 8 A D3 dispersion,
``/root/reference/torchani/models.py:255-340``) into two Verlet-cached
lanes, evaluating the dispersion tail only every k steps as a velocity
impulse.  These tests pin the algebra: the lane split is exact, k=1 is
velocity Verlet on the full model, and k>1 conserves energy in NVE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchani_tpu as tt
from torchani_tpu.md import ACCEL_UNIT, MolecularDynamics, MultipleTimestepMD
from torchani_tpu.testing import make_water_box


@pytest.fixture(scope="module")
def model():
    # ANI-2dr-class stack: NNP (5.2 A) + xTB repulsion + D3 dispersion (8 A)
    return tt.simple_ani(
        ("H", "O"), ensemble_size=1, repulsion=True, dispersion=True
    )


@pytest.fixture(scope="module")
def system():
    return make_water_box(60)  # 20 waters, ~8.4 A box


def _kinetic(masses, velocities):
    return float(
        0.5 * jnp.sum(masses[:, None] * velocities**2) / ACCEL_UNIT
    )


def test_slow_set_defaults_to_dispersion(model, system):
    species, coords, cell = system
    mts = MultipleTimestepMD(model, species, cell=cell, pbc=True, every=2)
    assert mts.slow_names == ("dispersion_d3",)
    assert mts.fast.model.potentials["dispersion_d3"].enabled is False
    assert mts.slow.model.potentials["nnp"].enabled is False
    assert mts.slow.model.potentials["repulsion_xtb"].enabled is False


def test_lane_split_is_exact_at_init(model, system):
    """MTS total energy/forces at init == the monolithic model's."""
    species, coords, cell = system
    mts = MultipleTimestepMD(model, species, cell=cell, pbc=True, every=2)
    st = mts.init(coords)
    full = MolecularDynamics(
        model, species, cell=cell, pbc=True, nn_precision="highest"
    )
    # the MTS fast lane also defaults nn_precision="high"; match it
    mts_hp = MultipleTimestepMD(
        model, species, cell=cell, pbc=True, every=2, nn_precision="highest"
    )
    st = mts_hp.init(coords)
    fst = full.init(coords)
    np.testing.assert_allclose(
        float(st.energy), float(fst.energy), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(st.forces), np.asarray(fst.forces), rtol=1e-4, atol=1e-6
    )
    assert not bool(st.overflow)


def test_every_one_matches_plain_velocity_verlet(model, system):
    """k=1 RESPA is algebraically plain velocity Verlet on the full model
    (the slow/fast half-kicks commute and sum)."""
    species, coords, cell = system
    steps = 6
    mts = MultipleTimestepMD(
        model, species, cell=cell, pbc=True, every=1,
        nn_precision="highest",
    )
    st = mts.init(coords, temperature=80.0, key=jax.random.PRNGKey(3))
    st = mts.run(st, steps)
    full = MolecularDynamics(
        model, species, cell=cell, pbc=True, nn_precision="highest"
    )
    fst = full.init(coords, temperature=80.0, key=jax.random.PRNGKey(3))
    fst = full.run_nve(fst, steps)
    np.testing.assert_allclose(
        np.asarray(st.coords), np.asarray(fst.coords), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        float(st.energy), float(fst.energy), rtol=1e-5, atol=1e-5
    )


def test_nve_drift_bounded_with_mts(model, system):
    """k=3 impulse splitting conserves total energy comparably to k=1."""
    species, coords, cell = system

    def drift(every):
        mts = MultipleTimestepMD(
            model, species, cell=cell, pbc=True, every=every,
            timestep_fs=0.25,
        )
        st = mts.init(coords, temperature=50.0, key=jax.random.PRNGKey(7))
        e0 = float(st.energy) + _kinetic(mts.masses, st.velocities)
        st = mts.run(st, 30)
        e1 = float(st.energy) + _kinetic(mts.masses, st.velocities)
        assert not bool(st.overflow)
        return abs(e1 - e0)

    d1, d3 = drift(1), drift(3)
    # absolute drift bound (Ha) for 7.5 fs of small-box water at 50 K, and
    # no catastrophic blowup relative to the single-timestep integrator
    assert d3 < 5e-3
    assert d3 < 10 * max(d1, 1e-5)


def test_langevin_runs_under_mts(model, system):
    species, coords, cell = system
    mts = MultipleTimestepMD(
        model, species, cell=cell, pbc=True, every=2, timestep_fs=0.5
    )
    st = mts.init(coords, temperature=300.0, key=jax.random.PRNGKey(11))
    st = mts.run(st, 10, ensemble="langevin", temperature=300.0)
    assert np.isfinite(float(st.energy))
    assert int(st.step) == 10


def test_mts_validation_errors(model, system):
    species, coords, cell = system
    plain = tt.simple_ani(("H", "O"), ensemble_size=1, repulsion=True)
    with pytest.raises(ValueError, match="cutoff beyond"):
        MultipleTimestepMD(plain, species, cell=cell, pbc=True)
    mts = MultipleTimestepMD(model, species, cell=cell, pbc=True, every=4)
    st = mts.init(coords)
    with pytest.raises(ValueError, match="multiple of"):
        mts.run(st, 6)
    with pytest.raises(ValueError, match="not supported"):
        mts.run(st, 8, ensemble="npt", temperature=300.0)


def test_cached_slow_constants_exact(model, system):
    """cache_slow_constants (the default) must be EXACT: it caches only
    element-keyed constant channels per Verlet window and restructures the
    C6 interpolation (`dispersion.frozen_window_channels`); coordination
    numbers stay live.  (A window-FROZEN C6 variant was measured and
    rejected — non-finite NVE; see the dispersion docstring.)"""
    species, coords, cell = system
    out = {}
    for cached in (False, True):
        mts = MultipleTimestepMD(
            model, jnp.asarray(species), cell=jnp.asarray(cell), pbc=True,
            every=4, timestep_fs=0.5, cache_slow_constants=cached,
        )
        st = mts.init(
            jnp.asarray(coords), temperature=50.0,
            key=jax.random.PRNGKey(5),
        )
        assert (st.slow.pair_aux is not None) == cached
        st = mts.run(st, 8)
        out[cached] = (
            float(st.energy), np.asarray(st.forces), np.asarray(st.coords)
        )
    e_u, f_u, c_u = out[False]
    e_c, f_c, c_c = out[True]
    np.testing.assert_allclose(e_u, e_c, rtol=0, atol=5e-5)
    np.testing.assert_allclose(f_u, f_c, atol=2e-5)
    np.testing.assert_allclose(c_u, c_c, atol=1e-6)
