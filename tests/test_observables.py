"""Trajectory observables: RDF normalization, MSD, VACF basics."""

import jax
import numpy as np
import pytest

from torchani_tpu.observables import (
    mean_squared_displacement,
    radial_distribution,
    velocity_autocorrelation,
)


def test_rdf_ideal_gas_is_flat():
    """Uniform random points in a periodic box -> g(r) ~= 1 away from 0."""
    rng = np.random.RandomState(0)
    box = 10.0
    frames = rng.rand(4, 400, 3).astype(np.float32) * box
    cell = np.eye(3, dtype=np.float32) * box
    r, g = radial_distribution(frames, cell, r_max=4.0, num_bins=16)
    assert r.shape == (16,) and g.shape == (16,)
    # skip the tiny-r bins (few counts); the rest should hover around 1
    assert abs(np.mean(g[4:]) - 1.0) < 0.15, g


def test_rdf_species_pair_lattice():
    """Two interleaved species on a cubic lattice: the A-B first peak sits
    at the half-diagonal spacing, and A-A at the lattice constant."""
    n = 4
    spacing = 2.0
    grid = np.stack(
        np.meshgrid(*[np.arange(n) * spacing] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    a_sites = grid
    b_sites = grid + spacing / 2.0
    coords = np.concatenate([a_sites, b_sites]).astype(np.float32)[None]
    species = np.array([1] * len(a_sites) + [8] * len(b_sites))
    cell = np.eye(3, dtype=np.float32) * (n * spacing)
    r, g_ab = radial_distribution(
        coords, cell, r_max=3.0, num_bins=60, species=species, pair=(1, 8)
    )
    # nearest A-B distance: sqrt(3)*(spacing/2) ~= 1.732
    peak_ab = r[np.argmax(g_ab)]
    assert abs(peak_ab - np.sqrt(3.0)) < 0.1, peak_ab
    r, g_aa = radial_distribution(
        coords, cell, r_max=3.0, num_bins=60, species=species, pair=(1, 1)
    )
    # lattice shells: nothing below the lattice constant, a peak AT it,
    # empty between it and the face diagonal (2*sqrt(2) ~= 2.83)
    assert g_aa[r < 1.9].max() == 0.0
    assert g_aa[(r > 1.9) & (r < 2.1)].max() > 1.0
    assert g_aa[(r > 2.2) & (r < 2.6)].max() == 0.0


def test_msd_linear_drift():
    """Frames translating at constant velocity -> MSD(t) = (v*t)^2."""
    base = np.random.RandomState(1).rand(10, 3).astype(np.float32)
    vel = np.array([0.1, 0.0, 0.0], np.float32)
    frames = np.stack([base + vel * t for t in range(8)])
    msd = mean_squared_displacement(frames)
    expect = (0.1 * np.arange(8)) ** 2
    np.testing.assert_allclose(msd, expect, atol=1e-5)


def test_vacf_constant_velocity():
    v = np.tile(
        np.random.RandomState(2).randn(1, 6, 3).astype(np.float32), (5, 1, 1)
    )
    vacf = velocity_autocorrelation(v)
    np.testing.assert_allclose(vacf, np.ones(5), atol=1e-5)


def test_rdf_from_md_trajectory():
    """End-to-end: record a short water trajectory, compute O-O g(r)."""
    import torchani_tpu as tt
    from torchani_tpu.md import MolecularDynamics
    from torchani_tpu.testing import make_water_box

    model = tt.simple_ani(("H", "O"), ensemble_size=1)
    species, coords, cell = make_water_box(48)
    md = MolecularDynamics(
        model, species, cell=cell, pbc=True, timestep_fs=0.5, skin=0.6
    )
    st = md.init(coords, temperature=200.0, key=jax.random.PRNGKey(0))
    st, traj = md.trajectory(st, 10, record_every=5, ensemble="nve")
    r, g = radial_distribution(
        traj["coords"], cell, r_max=4.0, num_bins=20,
        species=np.asarray(species[0]), pair=(8, 8),
    )
    assert np.isfinite(g).all()
    # O atoms in distinct molecules: no O-O contacts below ~2 A
    assert g[r < 2.0].max() < 0.5


def test_diffusion_coefficient_linear():
    from torchani_tpu.observables import diffusion_coefficient

    rng = np.random.RandomState(3)
    base = rng.rand(300, 3).astype(np.float64)
    # isotropic random walk with variance 2*D*dt per axis per frame; a
    # single-origin MSD needs many walkers for a stable slope (~10% at 300)
    d_true, dt = 0.05, 2.0
    steps = rng.randn(400, 300, 3) * np.sqrt(2 * d_true * dt)
    frames = base[None] + np.cumsum(steps, axis=0)
    d_est = diffusion_coefficient(frames, frame_interval_fs=dt)
    assert abs(d_est - d_true) < 0.25 * d_true, d_est
