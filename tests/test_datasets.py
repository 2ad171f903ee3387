"""Dataset stack tests: stores, ANIDataset, batching, SAE fit, filters."""

import numpy as np
import pytest

from torchani_tpu.datasets import (
    ANIDataset,
    Batcher,
    batch_all_in_ram,
    create_batched_dataset,
    ANIBatchedDataset,
)
from torchani_tpu.sae_estimation import exact_saes
from torchani_tpu.transforms import AtomicNumbersToIndices, Compose, SubtractSAE


def _make_dataset(tmp_path=None, backend="memory", n_groups=3, seed=0):
    rng = np.random.RandomState(seed)
    suffix = {"hdf5": "h5", "parquet": "pq", "zarr": "zarr"}.get(backend, "pq")
    location = None if backend == "memory" else tmp_path / f"ds.{suffix}"
    ds = ANIDataset(location, backend=backend)
    for gi in range(n_groups):
        n, a = 5 + gi, 4 + gi
        species = rng.choice([1, 6, 7, 8], size=(n, a))
        ds.append_conformers(
            f"group{gi}",
            {
                "species": species,
                "coordinates": rng.rand(n, a, 3).astype(np.float32) * 4,
                "energies": rng.randn(n).astype(np.float64),
                "forces": rng.randn(n, a, 3).astype(np.float32),
            },
        )
    return ds


@pytest.mark.parametrize("backend", ["memory", "hdf5", "parquet", "zarr"])
def test_store_roundtrip(tmp_path, backend):
    ds = _make_dataset(tmp_path, backend)
    assert len(ds) == 3
    assert ds.num_conformers == 5 + 6 + 7
    g = ds["group1"]
    assert g["species"].shape == (6, 5)
    assert g["coordinates"].shape == (6, 5, 3)
    assert {"species", "coordinates", "energies", "forces"} <= ds.properties


def test_zarr_store_format_details(tmp_path):
    """The zarr backend writes spec-compliant v2 metadata (readable by the
    zarr package) and handles nested groups, strings, scalars, deletes and
    multi-chunk reads."""
    import json
    import zlib

    from torchani_tpu.datasets.backends import ZarrStore

    st = ZarrStore(tmp_path / "s.zarr")
    st.put("a/b", {"x": np.arange(12, dtype=np.float32).reshape(3, 4),
                   "names": np.asarray(["HCl", "H2O", "NH3"])})
    st.set_metadata({"grouping": "by_formula"})
    # spec: root and every group level carry .zgroup; arrays carry .zarray
    root = tmp_path / "s.zarr"
    assert json.loads((root / ".zgroup").read_text())["zarr_format"] == 2
    assert (root / "a" / ".zgroup").exists()
    meta = json.loads((root / "a" / "b" / "x" / ".zarray").read_text())
    assert meta["shape"] == [3, 4] and meta["dtype"] == "<f4"
    assert meta["compressor"]["id"] == "zlib"
    raw = zlib.decompress((root / "a" / "b" / "x" / "0.0").read_bytes())
    np.testing.assert_array_equal(
        np.frombuffer(raw, np.float32).reshape(3, 4),
        np.arange(12, dtype=np.float32).reshape(3, 4),
    )
    assert st.keys() == ["a/b"]
    got = st.get("a/b")
    assert got["names"].tolist() == ["HCl", "H2O", "NH3"]
    assert st.get_metadata() == {"grouping": "by_formula"}
    # multi-chunk array written externally (2-row chunks over 3 rows)
    adir = root / "a" / "b" / "y"
    adir.mkdir()
    full = np.arange(12, dtype=np.int64).reshape(3, 4)
    (adir / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [3, 4], "chunks": [2, 4],
        "dtype": "<i8", "compressor": {"id": "zlib", "level": 1},
        "fill_value": 0, "order": "C", "filters": None,
    }))
    pad = np.zeros((2, 4), np.int64)
    pad[:1] = full[2:]
    (adir / "0.0").write_bytes(zlib.compress(full[:2].tobytes()))
    (adir / "1.0").write_bytes(zlib.compress(pad.tobytes()))
    np.testing.assert_array_equal(st.get("a/b", ["y"])["y"], full)
    st.delete("a/b")
    assert st.keys() == []


def test_append_and_delete():
    ds = _make_dataset()
    before = ds.num_conformers
    rng = np.random.RandomState(1)
    ds.append_conformers(
        "group0",
        {
            "species": rng.choice([1, 6], size=(2, 4)),
            "coordinates": rng.rand(2, 4, 3).astype(np.float32),
            "energies": rng.randn(2),
            "forces": rng.randn(2, 4, 3).astype(np.float32),
        },
    )
    assert ds.num_conformers == before + 2
    ds.delete_conformers("group0", np.array([0, 1]))
    assert ds.num_conformers == before
    ds.delete_conformers("group1")
    assert "group1" not in ds


def test_backend_conversion(tmp_path):
    ds = _make_dataset()
    h5 = ds.to_backend(tmp_path / "conv.h5", "hdf5")
    for k in ds.keys():
        a, b = ds[k], h5[k]
        for prop in a:
            np.testing.assert_array_equal(np.asarray(a[prop]), np.asarray(b[prop]))


def test_regroup_by_formula():
    ds = _make_dataset()
    total = ds.num_conformers
    ds.regroup_by_formula()
    assert ds.num_conformers == total
    from torchani_tpu.constants import ATOMIC_NUMBER
    for name in ds.keys():
        g = ds[name]
        # every conformer in the group has the same formula
        from torchani_tpu.datasets.anidataset import _formula
        for row in g["species"]:
            assert _formula(row) == name


def test_batching_deterministic():
    ds = _make_dataset()
    b1 = Batcher(rng_seed=7).divide(ds, {"training": 0.75, "validation": 0.25})
    b2 = Batcher(rng_seed=7).divide(ds, {"training": 0.75, "validation": 0.25})
    assert b1 == b2
    n = ds.num_conformers
    assert len(b1["training"]) + len(b1["validation"]) == n
    # no overlap
    assert not set(b1["training"]) & set(b1["validation"])


def test_batch_all_in_ram_shapes():
    ds = _make_dataset()
    divs = batch_all_in_ram(ds, batch_size=4, rng_seed=3)
    total = sum(
        b["species"].shape[0] for div in divs.values() for b in div
    )
    assert total == ds.num_conformers
    for div in divs.values():
        for batch in div:
            c, a = batch["species"].shape
            assert batch["coordinates"].shape == (c, a, 3)


def test_on_disk_batches(tmp_path):
    ds = _make_dataset()
    dest = create_batched_dataset(
        ds, tmp_path / "batched", batch_size=4, rng_seed=3,
        splits={"training": 0.8, "validation": 0.2},
    )
    train = ANIBatchedDataset(dest, "training")
    assert len(train) > 0
    batch = train[0]
    assert batch["species"].shape[0] <= 4
    assert (dest / "creation_log.json").exists()


def test_transforms_pipeline():
    ds = _make_dataset()
    symbols = ("H", "C", "N", "O")
    saes = [-0.5, -37.8, -54.6, -75.0]
    tf = Compose([SubtractSAE(symbols, saes), AtomicNumbersToIndices(symbols)])
    divs = batch_all_in_ram(ds, batch_size=4, transform=tf, rng_seed=0)
    for batch in divs["training"]:
        assert batch["species"].max() < 4  # converted to element idxs
        assert np.isfinite(batch["energies"]).all()


def test_exact_saes_recovers_linear_model():
    rng = np.random.RandomState(0)
    true_saes = np.array([-0.5, -37.8, -54.6, -75.0])
    batches = []
    for _ in range(10):
        species = rng.randint(0, 4, size=(16, 6))
        counts = np.stack([(species == s).sum(1) for s in range(4)], 1)
        energies = counts @ true_saes + rng.randn(16) * 1e-6
        batches.append({"species": species, "energies": energies})
    fit, _ = exact_saes(batches, 4)
    np.testing.assert_allclose(fit, true_saes, atol=1e-4)


def test_filter_by_high_force():
    from torchani_tpu.datasets.filters import filter_by_high_force

    ds = _make_dataset()
    g = ds["group0"]
    g["forces"][2] = 100.0
    ds.store.put("group0", g)
    flagged = filter_by_high_force(ds, threshold=50.0)
    assert ("group0", 2) in flagged
    before = ds.num_conformers
    filter_by_high_force(ds, threshold=50.0, delete=True)
    assert ds.num_conformers == before - len(flagged)


class TestUnionStore:
    def test_multi_location_dataset(self, tmp_path):
        import numpy as np

        from torchani_tpu.datasets import ANIDataset

        for fname, gname, z in [("a.h5", "water", [8, 1, 1]),
                                ("b.h5", "methane", [6, 1, 1, 1, 1])]:
            ds = ANIDataset(tmp_path / fname)
            ds.append_conformers(gname, {
                "species": np.tile(z, (4, 1)),
                "coordinates": np.random.rand(4, len(z), 3).astype(np.float32),
                "energies": np.random.rand(4),
            })
        u = ANIDataset([tmp_path / "a.h5", tmp_path / "b.h5"])
        assert sorted(u.keys()) == ["a/water", "b/methane"]
        assert u.num_conformers == 8
        assert u.get_conformers("a/water", [0, 2])["coordinates"].shape == (2, 3, 3)
        u.append_conformers("b/methane", {
            "species": np.tile([6, 1, 1, 1, 1], (2, 1)),
            "coordinates": np.random.rand(2, 5, 3).astype(np.float32),
            "energies": np.random.rand(2),
        })
        assert u.group_sizes()["b/methane"] == 6
        u.delete_conformers("a/water", [0])
        assert u.group_sizes()["a/water"] == 3
        # stem collision gets a numeric suffix
        (tmp_path / "sub").mkdir()
        import shutil
        shutil.copy(tmp_path / "a.h5", tmp_path / "sub" / "a.h5")
        u2 = ANIDataset([tmp_path / "a.h5", tmp_path / "sub" / "a.h5"])
        assert sorted(u2.keys()) == ["a/water", "a2/water"]


@pytest.mark.parametrize("backend", ["hdf5", "parquet", "zarr"])
def test_checksum_manifest(tmp_path, backend):
    """record -> verify ok; corrupt a byte -> mismatch flagged; re-record
    after mutation heals it (reference analog: builtin md5 checks)."""
    ds = _make_dataset(tmp_path, backend)
    sums = ds.record_checksums()
    assert sums and all(len(v) == 32 for v in sums.values())
    assert ds.verify_checksums()["ok"]
    # corrupt one backing file in place
    victim = ds.store.files()[0]
    raw = bytearray(victim.read_bytes())
    raw[len(raw) // 2] ^= 0xFF
    victim.write_bytes(bytes(raw))
    report = ds.verify_checksums()
    assert not report["ok"] and report["mismatched"]
    # a legitimate mutation then re-record
    ds.record_checksums()
    assert ds.verify_checksums()["ok"]


def test_cli_data_verify(tmp_path, capsys):
    from torchani_tpu.cli import main as cli_main

    ds = _make_dataset(tmp_path, "hdf5")
    loc = str(tmp_path / "ds.h5")
    cli_main(["data", "verify", loc, "--record"])
    cli_main(["data", "verify", loc])
    assert "integrity ok" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        cli_main(["data", "verify", str(tmp_path / "nope.h5")])
