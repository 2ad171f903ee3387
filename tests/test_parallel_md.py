"""Atom-sharded MD must match the single-device driver exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import torchani_tpu as tt
from torchani_tpu.md import MolecularDynamics
from torchani_tpu.parallel import ShardedMolecularDynamics
from torchani_tpu.testing import make_water_box


@pytest.fixture(scope="module")
def setup():
    species, coords, cell = make_water_box(48)
    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=2,
                          key=jax.random.PRNGKey(0))
    return model, jnp.asarray(species), jnp.asarray(coords), jnp.asarray(cell)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("atoms",))


def test_sharded_forces_match_single_device(setup):
    model, sp, coords, cell = setup
    md1 = MolecularDynamics(model, sp, cell=cell, pbc=True)
    st1 = md1.init(coords)
    md8 = ShardedMolecularDynamics(model, sp, _mesh(8), cell=cell, pbc=True)
    st8 = md8.init(coords)

    np.testing.assert_allclose(
        float(st1.energy), float(st8.energy), rtol=0, atol=2e-5
    )
    a = sp.shape[1]
    np.testing.assert_allclose(
        np.asarray(st1.forces), np.asarray(st8.forces[:a]), atol=2e-5
    )
    # no padding needed when the count divides the mesh evenly
    assert st8.coords.shape[0] == a


def test_sharded_trajectory_matches(setup):
    model, sp, coords, cell = setup
    md1 = MolecularDynamics(model, sp, cell=cell, pbc=True, timestep_fs=0.5)
    md8 = ShardedMolecularDynamics(
        model, sp, _mesh(8), cell=cell, pbc=True, timestep_fs=0.5
    )
    st1 = md1.run_nve(md1.init(coords), 5)
    st8 = md8.run_nve(md8.init(coords), 5)
    a = sp.shape[1]
    np.testing.assert_allclose(
        np.asarray(st1.coords), np.asarray(st8.coords[:a]), atol=1e-4
    )
    np.testing.assert_allclose(float(st1.energy), float(st8.energy), atol=5e-5)


def test_sharded_hetero_potentials_match_single_device(setup):
    """ANI-2dr-class model (xTB repulsion + D3 dispersion) sharded == single.

    The extra potentials run replicated in the sharded driver
    (parallel/md.py "replicated cheap terms"); this pins the config-5
    heterogeneous path on the multi-chip lane.
    """
    _, sp, coords, cell = setup
    model = tt.simple_ani(
        ("H", "C", "N", "O"), ensemble_size=2, repulsion=True,
        dispersion=True, key=jax.random.PRNGKey(1),
    )
    md1 = MolecularDynamics(model, sp, cell=cell, pbc=True)
    md8 = ShardedMolecularDynamics(model, sp, _mesh(8), cell=cell, pbc=True)
    st1, st8 = md1.init(coords), md8.init(coords)
    np.testing.assert_allclose(
        float(st1.energy), float(st8.energy), rtol=0, atol=2e-5
    )
    a = sp.shape[1]
    np.testing.assert_allclose(
        np.asarray(st1.forces), np.asarray(st8.forces[:a]), atol=2e-5
    )
    # the extra potentials must actually contribute on the sharded lane
    pots = dict(model.potentials)
    pots["dispersion_d3"] = pots["dispersion_d3"].replace(enabled=False)
    md_nod = ShardedMolecularDynamics(
        model.replace(potentials=pots), sp, _mesh(8), cell=cell, pbc=True
    )
    assert abs(float(md_nod.init(coords).energy) - float(st8.energy)) > 1e-6


def test_sharded_uneven_padding(setup):
    """49 atoms on 8 devices: pad to 56 with dummies."""
    model, sp, coords, cell = setup
    # append one H to make the count not divisible by 8
    sp49 = jnp.concatenate([sp, jnp.asarray([[1]])], axis=1)
    c49 = jnp.concatenate(
        [coords, coords[:, -1:, :] + jnp.asarray([1.5, 0.0, 0.0])], axis=1
    )
    md1 = MolecularDynamics(model, sp49, cell=cell, pbc=True)
    md8 = ShardedMolecularDynamics(model, sp49, _mesh(8), cell=cell, pbc=True)
    st1, st8 = md1.init(c49), md8.init(c49)
    assert st8.coords.shape[0] == 56
    np.testing.assert_allclose(float(st1.energy), float(st8.energy), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(st1.forces), np.asarray(st8.forces[:49]), atol=2e-5
    )
    # dummy padding rows feel no force
    assert np.abs(np.asarray(st8.forces[49:])).max() == 0.0


def test_sharded_refresh_matches_single_device():
    """Domain-decomposed refresh (r5): when the bucket-dot path is active
    and the model is NNP-only, `ShardedMolecularDynamics` shards the
    per-step refresh itself (bucket-shard select kernels + one all_to_all
    slot->row redistribution, `parallel.md.ExchangeTables`).  Must match
    the single-device driver bit-for-bit-ish through rebuilds."""
    from torchani_tpu.parallel.md import ExchangeTables

    # low density -> a 20 A box whose bucket grid has >= 3 cells per axis
    # (the bucket-dot path's requirement); tight skin + 300 K force
    # rebuilds INSIDE the sharded scan
    model = tt.simple_ani(
        ("H", "O"), ensemble_size=1, repulsion=False,
        key=jax.random.PRNGKey(0),
    )
    species, coords, cell = make_water_box(150, density_molec_per_a3=0.008)
    sp, co, ce = jnp.asarray(species), jnp.asarray(coords), jnp.asarray(cell)
    md1 = MolecularDynamics(
        model, sp, cell=ce, pbc=True, timestep_fs=0.25, skin=0.35
    )
    st1 = md1.init(co, temperature=300.0, key=jax.random.PRNGKey(4))
    md8 = ShardedMolecularDynamics(
        model, sp, _mesh(8), cell=ce, pbc=True, timestep_fs=0.25, skin=0.35
    )
    st8 = md8.init(co, temperature=300.0, key=jax.random.PRNGKey(4))
    assert isinstance(st8.bucket, ExchangeTables), "sharded refresh engaged"
    a = sp.shape[1]
    np.testing.assert_allclose(
        float(st1.energy), float(st8.energy), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(st1.forces), np.asarray(st8.forces[:a]), atol=2e-5
    )
    st1 = md1.run_nve(st1, 30)
    st8 = md8.run_nve(st8, 30)
    assert int(st8.rebuilds) >= 1, "rebuild must fire inside the sharded scan"
    assert int(st8.rebuilds) == int(st1.rebuilds)
    assert not bool(st8.overflow)
    np.testing.assert_allclose(
        np.asarray(st1.coords), np.asarray(st8.coords[:a]), atol=1e-4
    )
    np.testing.assert_allclose(float(st1.energy), float(st8.energy), atol=5e-5)
