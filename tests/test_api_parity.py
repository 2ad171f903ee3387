"""Name-level and behavior parity of the public API vs the reference.

The reference's public surface was enumerated from
``/root/reference/torchani`` module ``__all__``/top-level definitions; a
reference user switching to torchani_tpu should find every name.  Behavior
smoke-tests cover the compatibility shims added for parity (user-extensible
terms/potentials, neurochem entry points, legacy data helpers).
"""

import importlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


REFERENCE_SURFACE = {
    "": (
        "AEVComputer ANIModel ANINetworks EnergyShifter Ensemble SelfEnergy "
        "SpeciesConverter single_point"
    ),
    "arch": "ANI ANIq Assembler simple_ani simple_aniq",
    "cli": "sp opt data_ls data_info data_pack data_rm data_clean data_pull",
    "cutoffs": (
        "Cutoff CutoffBiweight CutoffCosine CutoffDummy CutoffSmooth "
        "CutoffTriweight"
    ),
    "electro": (
        "BaseChargeNormalizer ChargeNormalizer DipoleComputer compute_dipole"
    ),
    "grad": (
        "calc_forces calc_forces_and_hessians calc_grads calc_hessians "
        "energies_and_forces energies_forces_and_hessians forces "
        "forces_and_hessians forces_for_training grads hessians single_point "
        "vibrational_analysis"
    ),
    "io": "TorchaniIOError read_xyz write_xyz",
    "models": (
        "ANI1ccx ANI1x ANI2dr ANI2x ANI2xr ANImbis ANIr2s ANIr2s_ch3cn "
        "ANIr2s_chcl3 ANIr2s_water SnnANI2xr"
    ),
    "neighbors": (
        "AdaptiveList AllPairs CellList FastCellList Neighborlist Neighbors "
        "Triples VerletCellList adaptive_list all_pairs atom_image_converters "
        "cell_list compute_bounding_cell coords_to_fractional "
        "coords_to_grid_idx3 count_atoms_in_buckets "
        "discard_inter_molecule_pairs discard_outside_cutoff flatten_idx3 "
        "image_pairs_within lower_image_pairs_between narrow_down "
        "neighbors_to_triples reconstruct_shifts setup_grid"
    ),
    "neurochem": (
        "AEVConstants NeurochemInfo NeurochemLayerSpec NeurochemParseError "
        "download_model_parameters load_aev_computer_and_symbols "
        "load_atomic_network load_ensemble load_member "
        "load_model_from_info_file load_model_from_name load_sae "
        "model_dir_from_prefix modules_from_info modules_from_info_file "
        "modules_from_model_name"
    ),
    "paths": (
        "custom_models_dir data_dir datasets_dir neurochem_dir set_data_dir "
        "state_dicts_dir"
    ),
    "sae": "SelfEnergy",
    "sae_estimation": "approx_saes exact_saes",
    "transforms": (
        "AtomicNumbersToIndices Compose Identity SubtractEnergyAndForce "
        "SubtractRepulsionXTB SubtractSAE SubtractTwoBodyDispersionD3 "
        "Transform"
    ),
    "tuples": (
        "AtomicStdev EnergiesAtomicCharges EnergiesForces "
        "EnergiesForcesHessians EnergiesScalars ForceMagnitudes ForceStdev "
        "ForcesHessians SpeciesAEV SpeciesAtomicCharges SpeciesCoordinates "
        "SpeciesEnergies SpeciesEnergiesAtomicCharges SpeciesEnergiesQBC "
        "SpeciesForces VibAnalysis"
    ),
    "units": (
        "angstrom2bohr bohr2angstrom ea2debye ev2kcalpermol ev2kjoulepermol "
        "hartree2ev hartree2kcalpermol hartree2kjoulepermol mhessian2fconst "
        "sqrt_mhessian2invcm sqrt_mhessian2milliev"
    ),
    "utils": (
        "ATOMIC_NUMBER AtomicNumbersToChemicalSymbols AtomicNumbersToMasses "
        "ChemicalSymbolsToAtomicNumbers ChemicalSymbolsToInts EnergyShifter "
        "IntsToChemicalSymbols PERIODIC_TABLE SYMBOLS_1X SYMBOLS_2X "
        "SYMBOLS_2X_ZNUM_ORDER atomic_numbers_to_masses cumsum_from_zero "
        "download_and_extract fast_masked_select get_atomic_masses linspace "
        "map_to_central merge_state_dicts nonzero_in_chunks "
        "pad_atomic_properties sort_by_atomic_num species_to_formula "
        "strip_redundant_padding"
    ),
    "nn": (
        "ANIModel ANINetworks ANISharedNetworks AtomicContainer "
        "AtomicEmbedding AtomicNetwork AtomicOneHot BmmAtomicNetwork "
        "BmmEnsemble BmmLinear Ensemble MNPNetworks Sequential SingleNN "
        "SpeciesConverter TightCELU parse_activation"
    ),
    "aev": (
        "AEVComputer ANIAngular ANIRadial Angular BaseAngular BaseRadial "
        "Radial"
    ),
    "datasets": (
        "ANI1ccx ANI1e ANI1q ANI1x ANI2qHeavy ANI2x ANIBatchedDataset "
        "ANIBatchedInMemoryDataset ANIDataset BatchedDataset Batcher COMP6v1 "
        "COMP6v2 Div IonsHeavy IonsLight IonsVeryHeavy TestData "
        "TestDataForcesDipoles TestDataIons batch_all_in_ram concatenate "
        "create_batched_dataset filters"
    ),
    "datasets.filters": "filter_by_high_energy_error filter_by_high_force",
    "potentials": (
        "BasePairPotential DispersionLJ DummyPotential FixedCoulomb "
        "FixedMNOK LennardJones MergedChargesNNPotential NNPotential "
        "PairPotential Potential RepulsionLJ RepulsionXTB RepulsionZBL "
        "SeparateChargesNNPotential TwoBodyDispersionD3"
    ),
    "legacy_data": (
        "IterableAdapter IterableAdapterWithLength TransformableIterable "
        "Transformations collate_fn load stack_with_padding anidataloader "
        "datapacker"
    ),
    "testing": (
        "ANITestCase expand make_molecs make_neighbors make_tensor "
        "make_elem_idxs make_molec"
    ),
}


def test_public_surface_complete():
    missing = []
    for mod, names in REFERENCE_SURFACE.items():
        m = importlib.import_module(
            "torchani_tpu" + ("." + mod if mod else "")
        )
        for n in names.split():
            if not hasattr(m, n):
                missing.append(f"{mod or 'top'}.{n}")
    assert not missing, f"missing reference API names: {missing}"


def test_user_radial_term():
    from torchani_tpu.aev.terms import Radial

    class MyRadial(Radial):
        tensors = ["eta", "shifts"]

        def compute(self, d):
            return jnp.exp(-self.eta * (d[..., None] - self.shifts) ** 2)

    r = MyRadial.make(5.2, eta=16.0, shifts=[1.0, 2.0, 3.0])
    assert r.num_feats == 3
    out = r(jnp.ones((4, 5)))
    assert out.shape == (4, 5, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    with pytest.raises(ValueError):
        MyRadial.make(5.2, eta=16.0)  # missing declared tensor


def test_user_angular_term():
    from torchani_tpu.aev.terms import Angular

    class MyAngular(Angular):
        radial_tensors = ["eta", "shifts"]
        angles_tensors = ["zeta", "sections"]

        def compute_radial(self, dji, djk):
            m = 0.5 * (dji + djk)
            return jnp.exp(-self.eta * (m[..., None] - self.shifts) ** 2)

        def compute_cos_angles(self, c):
            cos_dev = 0.95 * c[..., None] * jnp.cos(self.sections)
            return ((1 + cos_dev) / 2) ** self.zeta

    a = MyAngular.make(
        3.5, eta=8.0, shifts=[1.0, 2.0], zeta=14.1, sections=[0.1, 0.2, 0.3]
    )
    assert a.num_feats == 6
    out = a(jnp.ones((7,)), jnp.ones((7,)), jnp.zeros((7,)))
    assert out.shape == (7, 6)


def test_user_pair_potential_trains_and_differentiates():
    from torchani_tpu.potentials import PairPotential

    class Square(PairPotential):
        tensors = ["bias"]
        pair_elem_tensors = ["k", "eq"]

        def pair_energies(self, elem_flat, neighbors):
            center, nbr = self.elem_pairs(elem_flat, neighbors)
            eq = self.to_pair_values(self.eq, center, nbr)
            k = self.to_pair_values(self.k, center, nbr)
            return self.bias + k / 2 * (neighbors.dist - eq) ** 2

    n = 3 * 4 // 2
    pot = Square.make(
        symbols=("H", "C", "O"), k=(1.0,) * n, eq=(1.5,) * n, bias=0.1
    )
    sp = jnp.asarray([[1, 6, 8, -1]])
    coords = jnp.asarray(
        np.random.RandomState(0).randn(1, 4, 3).astype(np.float32)
    )
    e = pot(sp, coords)
    assert e.shape == (1,) and bool(jnp.isfinite(e[0]))
    g = jax.grad(lambda c: jnp.sum(pot(sp, c)))(coords)
    assert bool(jnp.all(jnp.isfinite(g)))
    # pair params are pytree leaves (trainable by construction)
    leaves = jax.tree_util.tree_leaves(pot)
    assert any(l.shape == (3, 3) for l in leaves)


def test_atomic_network_and_bmm():
    from torchani_tpu.nn import AtomicNetwork, BmmAtomicNetwork

    net = AtomicNetwork.make([16, 8, 1], bias=True, key=jax.random.PRNGKey(3))
    x = jnp.ones((5, 16))
    out = net(x)
    assert out.shape == (5, 1)
    bmm = BmmAtomicNetwork.from_networks([net, net])
    bout = bmm(jnp.stack([x, x]))
    assert bout.shape == (2, 5, 1)
    np.testing.assert_allclose(np.asarray(bout[0]), np.asarray(out), rtol=1e-6)


def test_embeddings():
    from torchani_tpu.nn import AtomicEmbedding, AtomicOneHot

    oh = AtomicOneHot(symbols=("H", "C", "N"))
    enc = oh(jnp.asarray([1, 0, 2, -1]))
    np.testing.assert_array_equal(
        np.asarray(enc),
        [[0, 1, 0], [1, 0, 0], [0, 0, 1], [0, 0, 0]],
    )
    emb = AtomicEmbedding.make(("H", "C"), dim=4)
    out = emb(jnp.asarray([[0, 1, -1]]))
    assert out.shape == (1, 3, 4)
    assert bool(jnp.all(out[0, 2] == 0))


def test_grad_aliases_match():
    import torchani_tpu as tt
    from torchani_tpu import grad

    model = tt.simple_ani(("H", "O"), ensemble_size=1, repulsion=False)
    sp = jnp.asarray([[8, 1, 1]])
    coords = jnp.asarray(
        [[[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.24, 0.93, 0.0]]],
        dtype=jnp.float32,
    )
    f = grad.calc_forces(model, sp, coords)
    g = grad.grads(model, sp, coords)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), rtol=1e-6)
    fh = grad.forces_and_hessians(model, sp, coords)
    efh = grad.energies_forces_and_hessians(model, sp, coords)
    assert fh.hessians.shape == (1, 9, 9)
    np.testing.assert_allclose(
        np.asarray(fh.forces), np.asarray(efh.forces), rtol=1e-6
    )


def test_electro_parity_classes():
    from torchani_tpu.electro import BaseChargeNormalizer, DipoleComputer

    base = BaseChargeNormalizer()
    q = jnp.asarray([[0.3, 0.5, -0.5]])
    np.testing.assert_array_equal(
        np.asarray(base(jnp.asarray([[0, 0, 1]]), q)), np.asarray(q)
    )
    dc = DipoleComputer.make(reference="center_of_geometry")
    sp = jnp.asarray([[8, 1, -1]])
    coords = jnp.asarray(
        [[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 0.0]]], jnp.float32
    )
    d = dc(sp, coords, jnp.asarray([[-0.5, 0.5, 0.0]]))
    assert d.shape == (1, 3)


def test_legacy_pyanitools_roundtrip(tmp_path):
    from torchani_tpu.legacy_data import anidataloader, collate_fn, datapacker

    f = tmp_path / "t.h5"
    dp = datapacker(f)
    dp.store_data(
        "gdb1/mol1",
        coordinates=np.random.rand(3, 4, 3),
        species=["H", "C", "O", "H"],
        energies=np.random.rand(3),
    )
    dp.cleanup()
    items = list(anidataloader(str(f)))
    assert len(items) == 1
    assert items[0]["species"] == ["H", "C", "O", "H"]
    assert items[0]["coordinates"].shape == (3, 4, 3)
    batch = collate_fn(
        [
            {"species": np.array([1, 6]), "energies": np.float64(2.0)},
            {"species": np.array([8]), "energies": np.float64(1.0)},
        ]
    )
    np.testing.assert_array_equal(batch["species"], [[1, 6], [8, -1]])


def test_neighbors_parity_helpers():
    import torchani_tpu.neighbors as nb

    cell = np.diag([12.0, 12.0, 12.0]).astype(np.float64)
    gs = nb.setup_grid(cell, 5.0)
    assert tuple(gs) == (2, 2, 2)
    coords = jnp.asarray(
        np.random.RandomState(0).rand(6, 3).astype(np.float32) * 12
    )
    idx3 = nb.coords_to_grid_idx3(coords, jnp.asarray(cell, jnp.float32), gs)
    flat = nb.flatten_idx3(idx3, gs)
    count, cum = nb.count_atoms_in_buckets(flat, gs)
    assert int(count.sum()) == 6
    ita, ati = nb.atom_image_converters(flat)
    assert bool(jnp.all(ita[ati] == jnp.arange(6)))
    # narrow_down masks dummies and far pairs
    sp = jnp.asarray([[0, 1, 0, -1, 1, 0]])
    n = nb.all_pairs(6.0, sp, coords[None])
    nd = nb.narrow_down(3.0, sp, coords[None], n)
    assert bool(jnp.all(nd.dist[nd.mask] <= 3.0))
    # image pair helpers (eager)
    p = nb.image_pairs_within(
        jnp.asarray([0, 3, 1, 2]), jnp.asarray([0, 0, 3, 4]), 3
    )
    assert p.shape == (2, 4)


def test_merge_state_dicts(tmp_path):
    from torchani_tpu.utils import merge_state_dicts

    sd1 = {
        "energy_shifter.self_energies": np.zeros(2),
        "neural_networks.layer0.weight": np.ones((2, 2)),
    }
    sd2 = {
        "energy_shifter.self_energies": np.zeros(2),
        "neural_networks.layer0.weight": np.full((2, 2), 2.0),
    }
    p1, p2 = tmp_path / "m0.npz", tmp_path / "m1.npz"
    np.savez(p1, **sd1)
    np.savez(p2, **sd2)
    merged = merge_state_dicts([p1, p2])
    assert "neural_networks.0.layer0.weight" in merged
    assert "neural_networks.1.layer0.weight" in merged
    assert "energy_shifter.self_energies" in merged


def test_neurochem_single_network_roundtrip(tmp_path):
    """Write a synthetic .nnf/.wparam/.bparam set and load it back."""
    import bz2

    from torchani_tpu.neurochem import (
        NeurochemInfo,
        load_atomic_network,
        load_ensemble,
    )

    net_dir = tmp_path / "train0" / "networks"
    net_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)

    def write_network(sym, dims):
        blocks = []
        for li in range(len(dims) - 1):
            w = rng.randn(dims[li + 1], dims[li]).astype(np.float32)
            b = rng.randn(dims[li + 1]).astype(np.float32)
            wname = f"{sym}_l{li}.wparam"
            bname = f"{sym}_l{li}.bparam"
            (net_dir / wname).write_bytes(w.tobytes())
            (net_dir / bname).write_bytes(b.tobytes())
            act = 9 if li < len(dims) - 2 else 6
            blocks.append(
                f"layer [ nodes={dims[li + 1]}; activation={act}; "
                f"weights=FILE: {wname}[{w.size}]; "
                f"biases=FILE: {bname}[{b.size}]; ]"
            )
        text = "\n".join(blocks) + "\n$\n"
        payload = bz2.compress(text.encode("ascii") + b"\n")
        (net_dir / f"ANN-{sym}.nnf").write_bytes(b"XX==" + payload)
        return dims

    dims = write_network("H", [8, 6, 1])
    write_network("C", [8, 6, 1])
    net = load_atomic_network(net_dir / "ANN-H.nnf")
    assert net.layer_dims == (8, 6, 1)
    out = net(jnp.ones((3, 8)))
    assert out.shape == (3, 1)
    ens = load_ensemble(("H", "C"), tmp_path / "train", 1)
    assert ens.total_members_num == 1


def test_transforms_parity():
    from torchani_tpu.transforms import Identity, SubtractRepulsionXTB

    props = {
        "species": np.array([[1, 6]]),
        "coordinates": np.array([[[0.0, 0.0, 0.0], [1.1, 0.0, 0.0]]]),
        "energies": np.array([-40.0]),
        "forces": np.zeros((1, 2, 3)),
    }
    assert Identity()(props) is props
    t = SubtractRepulsionXTB(("H", "C"))
    out = t(dict(props))
    assert out["energies"][0] != props["energies"][0]  # repulsion removed
