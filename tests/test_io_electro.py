"""xyz IO round-trips and electro (charges/dipole) tests."""

import jax.numpy as jnp
import numpy as np

from torchani_tpu.electro import ChargeNormalizer, compute_dipole
from torchani_tpu.io import read_xyz, write_xyz


def test_xyz_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    species = np.array([[8, 1, 1], [6, 1, -1]])
    coords = rng.rand(2, 3, 3).astype(np.float32)
    coords[1, 2] = 0.0
    path = tmp_path / "mols.xyz"
    write_xyz(species, coords, path)
    s2, c2, cell, pbc = read_xyz(path)
    np.testing.assert_array_equal(s2, species)
    np.testing.assert_allclose(c2, coords, atol=1e-6)
    assert cell is None


def test_xyz_cell_roundtrip(tmp_path):
    species = np.array([[8, 1, 1]])
    coords = np.zeros((1, 3, 3), dtype=np.float32)
    cell = np.diag([5.0, 6.0, 7.0]).astype(np.float32)
    path = tmp_path / "cell.xyz"
    write_xyz(species, coords, path, cell=cell)
    _, _, cell2, pbc = read_xyz(path)
    np.testing.assert_allclose(cell2, cell, atol=1e-8)
    assert pbc is not None and pbc.all()


def test_xyz_padding_roundtrip(tmp_path):
    species = np.array([[8, 1, -1]])
    coords = np.random.rand(1, 3, 3).astype(np.float32)
    path = tmp_path / "pad.xyz"
    write_xyz(species, coords.copy(), path, pad=True)
    s2, c2, _, _ = read_xyz(path)
    np.testing.assert_array_equal(s2, species)
    assert (c2[0, 2] == 0).all()


def test_reference_xyz_files_parse():
    """The reference repo's sample xyz files must parse."""
    s, c, cell, pbc = read_xyz("/root/reference/tests/resources/water-0.8nm.xyz")
    assert s.shape[0] >= 1 and (s[0] > 0).sum() > 3
    assert c.shape == s.shape + (3,)


def test_charge_normalizer_sums_to_total():
    norm = ChargeNormalizer.make(("H", "C", "N", "O"))
    elem = jnp.asarray([[0, 1, 2, 3, -1]])
    raw = jnp.asarray([[0.3, 0.5, -0.5, 0.1, 0.0]])
    out = np.asarray(norm(elem, raw, charge=0))
    np.testing.assert_allclose(out.sum(), 0.0, atol=1e-6)
    assert out[0, 4] == 0.0  # padding atom unchanged (weight 0)
    out1 = np.asarray(norm(elem, raw, charge=1))
    np.testing.assert_allclose(out1.sum(), 1.0, atol=1e-6)


def test_charge_normalizer_electronegativity_weights():
    norm = ChargeNormalizer.from_electronegativity_and_hardness(("H", "O"))
    assert np.asarray(norm.weights).shape == (2,)
    assert np.isfinite(np.asarray(norm.weights)).all()


def test_dipole_of_symmetric_system_is_zero():
    # +q and -q at symmetric positions about the origin
    species = jnp.asarray([[1, 1]])
    coords = jnp.asarray([[[1.0, 0, 0], [-1.0, 0, 0]]])
    charges = jnp.asarray([[0.5, 0.5]])
    d = np.asarray(compute_dipole(species, coords, charges, reference="origin"))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)
    charges = jnp.asarray([[0.5, -0.5]])
    d = np.asarray(compute_dipole(species, coords, charges, reference="origin"))
    np.testing.assert_allclose(d[0], [1.0, 0, 0], atol=1e-6)
