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


def test_nose_hoover_thermalizes(model):
    """NHC NVT holds the kinetic temperature near the target (deterministic
    thermostat; loose band — short trajectory, tiny system)."""
    species, coords, cell = make_water_box(30)
    md = MolecularDynamics(
        model, species, cell=cell, pbc=True, timestep_fs=0.5, skin=0.6
    )
    st = md.init(coords, temperature=300.0, key=jax.random.PRNGKey(1))
    temps = []
    for _ in range(6):
        st = md.run_nvt_nose_hoover(st, 40, temperature=300.0, tau_fs=20.0)
        temps.append(float(kinetic_temperature(st.velocities, md.masses)))
    assert np.isfinite(float(st.energy))
    assert not bool(st.overflow)
    # last few windows should hover around the target
    mean_t = np.mean(temps[2:])
    assert 120.0 < mean_t < 520.0, temps
    # chain state actually participates
    assert float(jnp.max(jnp.abs(st.nhc))) > 0.0


def test_npt_virial_matches_finite_difference(model):
    """dU/dscale from the fused force backward == finite-difference energy
    under joint coordinate+cell scaling through the public API."""
    species, coords, cell = make_water_box(30)
    md = MolecularDynamics(
        model, species, cell=cell, pbc=True, skin=0.6, npt_compression=0.1
    )
    st = md.init(coords, temperature=50.0, key=jax.random.PRNGKey(2))
    st = st.replace(scale=jnp.ones(()))
    e0, _, du_ds = jax.jit(md._energy_forces_virial)(
        st, st.coords, jnp.ones(())
    )

    def e_at(s):
        out = tt.single_point(
            model,
            jnp.asarray(species),
            jnp.asarray(st.coords)[None] * s,
            cell=jnp.asarray(cell) * s,
            pbc=jnp.asarray([True] * 3),
        )
        return float(out["energies"][0])

    assert abs(float(e0) - e_at(1.0)) < 5e-5 * abs(e_at(1.0)) + 5e-5
    # h trades f32 cancellation noise (|E| ~ 760 Ha, eps_rel ~ 6e-8 ->
    # +-0.05/h absolute fd noise) against curvature error; 1e-3 puts the
    # noise floor ~1.5% of the ~-3.4 Ha/scale virial
    h = 1e-3
    fd = (e_at(1.0 + h) - e_at(1.0 - h)) / (2 * h)
    assert abs(float(du_ds) - fd) < 3e-2 * abs(fd) + 2e-2, (du_ds, fd)


def test_npt_berendsen_responds_to_pressure(model):
    """The barostat compresses under a huge external pressure and expands
    under tension; trajectories stay finite with rebuilds working."""
    species, coords, cell = make_water_box(30)

    def run(p_bar):
        md = MolecularDynamics(
            model, species, cell=cell, pbc=True, timestep_fs=0.5,
            skin=0.6, npt_compression=0.15,
        )
        st = md.init(coords, temperature=100.0, key=jax.random.PRNGKey(3))
        st = md.run_npt_berendsen(
            st, 60, temperature=100.0, pressure_bar=p_bar,
            tau_p_fs=200.0,
        )
        assert np.isfinite(float(st.energy))
        return float(st.scale), bool(st.overflow), int(st.rebuilds)

    s_hi, of_hi, _ = run(5.0e4)  # strong compression
    s_lo, of_lo, _ = run(-5.0e4)  # strong tension
    assert s_hi < 0.999, s_hi
    assert s_lo > 1.001, s_lo
    assert not of_hi and not of_lo


def test_npt_virial_bucket_matches_gather(model):
    """dU/dscale agrees between the bucket-dot and gather refresh paths
    (the scale factor must flow through the MXU contraction identically)."""
    from torchani_tpu.testing import make_water_box as _mwb

    species, coords, cell = _mwb(150, density_molec_per_a3=0.008)

    def virial(bucket_refresh):
        md = MolecularDynamics(
            model, species, cell=cell, pbc=True, skin=0.6,
            npt_compression=0.1, bucket_refresh=bucket_refresh,
        )
        st = md.init(coords, temperature=50.0, key=jax.random.PRNGKey(5))
        st = st.replace(scale=jnp.ones(()))
        e, f, du_ds = jax.jit(md._energy_forces_virial)(
            st, st.coords, jnp.ones(())
        )
        return float(e), np.asarray(f), float(du_ds), st.bucket is not None

    e_b, f_b, v_b, has_b = virial(True)
    e_g, f_g, v_g, has_g = virial(False)
    assert has_b and not has_g
    assert abs(e_b - e_g) < 5e-5 * abs(e_g) + 5e-5
    fscale = np.abs(f_g).max() + 1e-9
    assert np.abs(f_b - f_g).max() / fscale < 5e-3
    assert abs(v_b - v_g) < 5e-3 * abs(v_g) + 5e-3, (v_b, v_g)


@pytest.mark.parametrize("ensemble,params", [
    ("nve", {}),
    ("nvt", {"temperature": 200.0}),
    ("nvt-nhc", {"temperature": 200.0, "tau_fs": 20.0}),
    ("npt", {"temperature": 200.0, "pressure_bar": 1.0}),
])
def test_trajectory_recording(model, ensemble, params):
    """`trajectory` returns on-device frames; the last frame equals the
    final state, and all ensembles drive through the same runner."""
    species, coords, cell = make_water_box(30)
    md = MolecularDynamics(
        model, species, cell=cell, pbc=True, timestep_fs=0.5, skin=0.6,
        npt_compression=0.1 if ensemble == "npt" else 0.0,
    )
    st = md.init(coords, temperature=200.0, key=jax.random.PRNGKey(7))
    st, traj = md.trajectory(
        st, 20, record_every=5, ensemble=ensemble, **params
    )
    assert traj["coords"].shape == (4,) + st.coords.shape
    assert traj["energies"].shape == (4,)
    assert np.isfinite(np.asarray(traj["energies"])).all()
    assert np.isfinite(np.asarray(traj["temperatures"])).all()
    np.testing.assert_array_equal(
        np.asarray(traj["coords"][-1]), np.asarray(st.coords)
    )
    assert int(st.step) == 20
    if ensemble == "npt":
        assert traj["scales"].shape == (4,)


def test_trajectory_rejects_bad_args(model):
    species, coords, cell = make_water_box(30)
    md = MolecularDynamics(model, species, cell=cell, pbc=True)
    st = md.init(coords)
    with pytest.raises(ValueError):
        md.trajectory(st, 21, record_every=5)
    with pytest.raises(TypeError):
        md.trajectory(st, 20, record_every=5, ensemble="nvt",
                      temperature=100.0, bogus=1)
    with pytest.raises(ValueError):
        md.trajectory(st, 20, record_every=5, ensemble="nosuch")


def test_npt_rebaseline_preserves_physics(model):
    """Folding the drifted scale into a fresh driver leaves the physical
    system unchanged: energy/forces match across the rebaseline."""
    species, coords, cell = make_water_box(30)
    md = MolecularDynamics(
        model, species, cell=cell, pbc=True, timestep_fs=0.5, skin=0.6,
        npt_compression=0.15,
    )
    st = md.init(coords, temperature=100.0, key=jax.random.PRNGKey(9))
    st = md.run_npt_berendsen(
        st, 40, temperature=100.0, pressure_bar=3.0e4, tau_p_fs=150.0
    )
    s_before = float(st.scale)
    assert s_before != 1.0
    e_before = float(st.energy)
    md2, st2 = md.rebaseline(st)
    assert float(st2.scale) == 1.0
    assert float(jnp.max(jnp.abs(st2.velocities - st.velocities))) == 0.0
    assert abs(float(st2.energy) - e_before) < 2e-4 * abs(e_before) + 2e-3
    # the new driver continues the trajectory
    st2 = md2.run_npt_berendsen(
        st2, 10, temperature=100.0, pressure_bar=3.0e4, tau_p_fs=150.0
    )
    assert np.isfinite(float(st2.energy))
    assert not bool(st2.overflow)


def test_cached_single_point_matches_one_shot():
    """CachedSinglePoint must reproduce the one-shot single_point E/F across
    repeated geometries of the same system — including one displaced far
    enough to force an in-jit neighbor rebuild."""
    import torchani_tpu as tt
    from torchani_tpu.grad import energies_and_forces
    from torchani_tpu.testing import make_water_box

    model = tt.simple_ani(("H", "O"), ensemble_size=1)
    species, coords, cell = make_water_box(48)
    cell_j = jnp.asarray(cell)
    pbc = jnp.asarray([True] * 3)
    sp = tt.CachedSinglePoint(model, species, cell=cell, pbc=True, skin=0.6)

    rng = np.random.RandomState(0)
    geoms = [
        coords[0],
        coords[0] + rng.randn(*coords[0].shape).astype(np.float32) * 0.02,
        coords[0] + rng.randn(*coords[0].shape).astype(np.float32) * 0.5,  # > skin/2
    ]
    for i, g in enumerate(geoms):
        e, f = sp(jnp.asarray(g))
        e_ref, f_ref = jax.jit(
            lambda c: energies_and_forces(
                model, jnp.asarray(species), c[None], cell_j, pbc
            )
        )(jnp.asarray(g))
        de = abs(float(e) - float(e_ref[0]))
        assert de < 5e-5 * abs(float(e_ref[0])) + 5e-5, (i, de)
        fscale = float(jnp.max(jnp.abs(f_ref))) + 1e-9
        ferr = float(jnp.max(jnp.abs(f - f_ref[0]))) / fscale
        assert ferr < 5e-4, (i, ferr)
    assert not sp.overflow
    assert int(sp._state.rebuilds) >= 1  # the big displacement rebuilt
