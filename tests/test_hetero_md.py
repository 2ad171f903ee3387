"""Heterogeneous MD: multiple enabled potentials (BASELINE config 5).

The reference's scaling benchmark runs ANI-2xr/2dr-class models (xTB
repulsion +- D3 dispersion) on solvated PDB systems
(``/root/reference/torchani/models.py:255-340``,
``tools/scaling-md-benchmark.py:37-38``).  These tests prove the jitted MD
step with multiple enabled potentials — per-potential ``narrow_to_cutoff``
under the Verlet/bucket neighbor layout, dispersion cutoff (8 A) beyond the
AEV cutoff (5.2 A) — matches the from-scratch single-point path, plus the
PDB input lane (`io.read_pdb`, `testing.make_solvated_system`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchani_tpu as tt
from torchani_tpu.grad import energies_and_forces
from torchani_tpu.io import read_pdb
from torchani_tpu.md import MolecularDynamics
from torchani_tpu.testing import make_solvated_system

PDB_DIR = "/root/reference/dataset/pdb"


@pytest.fixture(scope="module")
def dr_model():
    """ANI-2dr-class: NNP + xTB repulsion + D3 dispersion (cutoff 8 A)."""
    return tt.simple_ani(
        ("H", "C", "N", "O"), "wb97x-631gd", ensemble_size=1,
        repulsion=True, dispersion=True,
    )


def test_read_pdb_water_box():
    z, c, cell = read_pdb(f"{PDB_DIR}/water-0.8nm.pdb")
    assert z.shape == (30,)
    assert np.bincount(z)[1] == 20 and np.bincount(z)[8] == 10
    np.testing.assert_allclose(cell, np.diag([8.0, 8.0, 8.0]))


def test_read_pdb_protein():
    z, c, cell = read_pdb(f"{PDB_DIR}/1hz5.pdb")
    assert cell is None
    counts = np.bincount(z)
    # HCNOS protein: element histogram from the fixed-column element field
    assert counts[1] == 478 and counts[6] == 314
    assert counts[7] == 77 and counts[8] == 103 and counts[16] == 1


def test_solvated_system_composition():
    z, c, cell = make_solvated_system(
        f"{PDB_DIR}/1hz5.pdb", f"{PDB_DIR}/water-0.8nm.pdb", box=32.0
    )
    assert set(np.unique(z)) == {1, 6, 7, 8, 16}
    n_prot = 973
    assert (len(z) - n_prot) % 3 == 0  # whole waters only
    # no water atom within the clash radius of the protein (minimum image)
    prot, wat = c[:n_prot], c[n_prot:]
    d = wat[:, None, :] - prot[None, :, :]
    d -= np.round(d / 32.0) * 32.0
    assert np.sqrt((d**2).sum(-1)).min() > 1.7


def test_md_step_with_extra_potentials_matches_single_point(dr_model):
    """Jitted MD force path == from-scratch path with repulsion+dispersion."""
    # a real PDB water box, tiled to 16 A (>= 2x the 8 A dispersion cutoff
    # so minimum image is valid)
    z, c, cell = make_solvated_system(
        None, f"{PDB_DIR}/water-0.8nm.pdb", box=16.0
    )
    model = tt.simple_ani(
        ("H", "O"), "wb97x-631gd", ensemble_size=1, repulsion=True, dispersion=True
    )
    md = MolecularDynamics(
        model, z[None], cell=cell, pbc=True, nn_precision="highest"
    )
    state = md.init(c)
    e, f = energies_and_forces(
        model,
        jnp.asarray(z[None]),
        jnp.asarray(c[None]),
        jnp.asarray(cell),
        jnp.asarray([True, True, True]),
    )
    np.testing.assert_allclose(float(e[0]), float(state.energy), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(f)[0], np.asarray(state.forces), atol=2e-4
    )
    # the extra potentials must actually contribute (not silently disabled)
    pots = dict(model.potentials)
    pots["dispersion_d3"] = pots["dispersion_d3"].replace(enabled=False)
    e_nodisp = float(
        model.replace(potentials=pots)(
            jnp.asarray(z[None]), jnp.asarray(c[None]),
            jnp.asarray(cell), jnp.asarray([True, True, True]),
        )[0]
    )
    assert abs(e_nodisp - float(e[0])) > 1e-6


def test_lane_prefix_dispatch_matches_full_table():
    """With a long-cutoff potential inflating the build radius, the MD
    driver runs short-cutoff potentials on a static prefix of the
    distance-sorted lanes (`_lane_prefixes`).  Pin a capacity that forces
    the prefix to engage and check E/F against the from-scratch path."""
    z, c, cell = make_solvated_system(
        None, f"{PDB_DIR}/water-0.8nm.pdb", box=16.0
    )
    model = tt.simple_ani(
        ("H", "O"), "wb97x-631gd", ensemble_size=1,
        repulsion=True, dispersion=True,
    )
    md = MolecularDynamics(
        model, z[None], cell=cell, pbc=True, nn_precision="highest",
        capacity=224,
    )
    assert md._lane_prefixes, "prefix dispatch must engage in this test"
    assert max(md._lane_prefixes.values()) < 224
    state = md.init(c)
    assert not bool(state.overflow)
    e, f = energies_and_forces(
        model,
        jnp.asarray(z[None]),
        jnp.asarray(c[None]),
        jnp.asarray(cell),
        jnp.asarray([True, True, True]),
    )
    np.testing.assert_allclose(float(e[0]), float(state.energy), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(f)[0], np.asarray(state.forces), atol=2e-4
    )


def test_md_vacuum_protein_fragment_matches_single_point(dr_model):
    """264-atom HCNO PDB fragment, no PBC, repulsion+dispersion enabled."""
    z, c, _ = read_pdb(f"{PDB_DIR}/small.pdb")
    md = MolecularDynamics(dr_model, z[None], nn_precision="highest")
    state = md.init(c)
    e, f = energies_and_forces(dr_model, jnp.asarray(z[None]), jnp.asarray(c[None]))
    np.testing.assert_allclose(float(e[0]), float(state.energy), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(f)[0], np.asarray(state.forces), atol=2e-4
    )
    # and the step stays consistent after running: energy from the MD carry
    # equals a fresh single point at the evolved coordinates
    state = md.run_nve(state, 3)
    e2, _ = energies_and_forces(
        dr_model, jnp.asarray(z[None]), jnp.asarray(state.coords[None])
    )
    np.testing.assert_allclose(float(e2[0]), float(state.energy), atol=2e-4)
