"""State-dict conversion round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np

import torchani_tpu as tt
from torchani_tpu.convert import load_state_dict, save_state_dict
from torchani_tpu.neighbors import all_pairs, discard_inter_molecule_pairs


def test_save_load_roundtrip():
    m1 = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=2, key=jax.random.PRNGKey(3))
    m2 = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=2, key=jax.random.PRNGKey(4))
    sd = save_state_dict(m1)
    m2 = load_state_dict(m2, sd)
    rng = np.random.RandomState(0)
    species = jnp.asarray([[1, 6, 7, 8, 1]])
    coords = jnp.asarray(rng.rand(1, 5, 3).astype(np.float32) * 3)
    np.testing.assert_allclose(
        np.asarray(m1(species, coords)), np.asarray(m2(species, coords)), atol=1e-6
    )


def test_state_dict_key_scheme():
    m = tt.simple_ani(("H", "C"), ensemble_size=2)
    sd = save_state_dict(m)
    assert "energy_shifter.self_energies" in sd
    assert "potentials.nnp.aev_computer.radial.eta" in sd
    assert "potentials.nnp.neural_networks.members.0.atomics.H.layers.0.weight" in sd
    assert "potentials.repulsion_xtb.y_ab" in sd
    # torch Linear layout: (out, in)
    w = sd["potentials.nnp.neural_networks.members.0.atomics.H.layers.0.weight"]
    assert w.shape[1] == m.aev_computer.out_dim


def test_discard_inter_molecule_pairs():
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.rand(1, 6, 3).astype(np.float32) * 2)
    elem = jnp.zeros((1, 6), jnp.int32)
    nbrs = all_pairs(10.0, elem, coords)
    mol_idxs = jnp.asarray([[0, 0, 0, 1, 1, 1]])
    narrowed = discard_inter_molecule_pairs(nbrs, mol_idxs)
    idx = np.asarray(narrowed.idx[0])
    mask = np.asarray(narrowed.mask[0])
    for i in range(6):
        for k in range(idx.shape[1]):
            if mask[i, k]:
                assert (i < 3) == (idx[i, k] < 3)
    # each atom keeps exactly its 2 intra-molecule neighbors
    assert (np.asarray(narrowed.count()[0]) == 2).all()
