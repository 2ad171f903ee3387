"""CLI end-to-end tests (sp / opt / data subcommands)."""

import json

import numpy as np
import pytest

from torchani_tpu.cli import main
from torchani_tpu.io import write_xyz


@pytest.fixture(scope="module")
def water_xyz(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "water.xyz"
    species = np.array([[8, 1, 1]])
    coords = np.array(
        [[[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]]],
        dtype=np.float32,
    )
    write_xyz(species, coords, path)
    return path


def test_sp(water_xyz, tmp_path, capsys):
    out = tmp_path / "sp.json"
    main(["sp", str(water_xyz), "-m", "simple", "-f", "-o", str(out)])
    result = json.loads(out.read_text())
    assert "energies" in result and "forces" in result
    assert np.isfinite(result["energies"]).all()
    assert np.asarray(result["forces"]).shape == (1, 3, 3)


def test_opt(water_xyz, tmp_path, capsys):
    out = tmp_path / "opt.xyz"
    main(["opt", str(water_xyz), "-m", "simple", "-n", "50", "-o", str(out)])
    captured = capsys.readouterr().out
    assert "E=" in captured and "fmax=" in captured
    assert out.exists()


def test_opt_multi_conformer(tmp_path, capsys):
    """A multi-conformer xyz relaxes the whole batch in one program."""
    path = tmp_path / "waters.xyz"
    species = np.array([[8, 1, 1]] * 3)
    base = np.array(
        [[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]],
        dtype=np.float32,
    )
    coords = np.stack([base * s for s in (1.04, 1.1, 0.95)])
    write_xyz(species, coords, path)
    out = tmp_path / "opt.xyz"
    main(["opt", str(path), "-m", "simple", "-n", "150", "-o", str(out)])
    captured = capsys.readouterr().out
    assert "[2] converged=" in captured and "steps=" in captured
    from torchani_tpu.io import read_xyz

    sp2, c2, _, _ = read_xyz(out)
    assert c2.shape == (3, 3, 3)


def test_data_roundtrip(tmp_path, capsys):
    from torchani_tpu.datasets import ANIDataset

    loc = tmp_path / "ds.h5"
    rng = np.random.RandomState(0)
    ds = ANIDataset(loc)
    ds.append_conformers(
        "g1",
        {
            "species": rng.choice([1, 6], (4, 3)),
            "coordinates": rng.rand(4, 3, 3).astype(np.float32),
            "energies": rng.randn(4),
        },
    )
    main(["data", "ls", str(loc)])
    assert "g1\t4" in capsys.readouterr().out
    main(["data", "info", str(loc)])
    info = json.loads(capsys.readouterr().out)
    assert info["conformers"] == 4
    dest = tmp_path / "batched"
    main(["data", "pack", str(loc), str(dest), "--batch-size", "2"])
    assert (dest / "creation_log.json").exists()


def test_unknown_model_errors(water_xyz):
    with pytest.raises(SystemExit):
        main(["sp", str(water_xyz), "-m", "nope"])


def test_data_rm_and_clean(tmp_path, capsys):
    import numpy as np

    from torchani_tpu.cli import main
    from torchani_tpu.datasets import ANIDataset

    p = str(tmp_path / "x.h5")
    ds = ANIDataset(p)
    coords = np.random.rand(5, 3, 3).astype(np.float32)
    coords[2, 0, 0] = np.nan
    e = np.random.rand(5)
    e[4] = np.inf
    ds.append_conformers("water", {"species": np.tile([8, 1, 1], (5, 1)),
                                   "coordinates": coords, "energies": e})
    ds.append_conformers("junk", {"species": np.tile([1, 1], (2, 1)),
                                  "coordinates": np.random.rand(2, 2, 3).astype(np.float32)})
    main(["data", "clean", p])
    assert "removed 2" in capsys.readouterr().out
    main(["data", "rm", p, "junk"])
    ds2 = ANIDataset(p)
    assert ds2.keys() == ["water"] and ds2.num_conformers == 3
    import pytest

    with pytest.raises(SystemExit):
        main(["data", "rm", p, "nope"])


def test_md_traj(water_xyz, tmp_path, capsys):
    from torchani_tpu.io import read_xyz

    traj = tmp_path / "traj.xyz"
    main([
        "md", str(water_xyz), "-m", "simple", "-n", "20", "--timestep",
        "0.2", "--temperature", "100", "--nvt-nhc", "--traj", str(traj),
        "--record-every", "5",
    ])
    captured = capsys.readouterr().out
    assert "T =" in captured
    sp, co, _, _ = read_xyz(traj)
    assert co.shape == (4, 3, 3)
    assert np.isfinite(co).all()


def test_md_mts(water_xyz, capsys):
    main([
        "md", str(water_xyz), "-m", "simple-dr", "-n", "8", "--timestep",
        "0.25", "--temperature", "50", "--mts", "2",
    ])
    captured = capsys.readouterr().out
    assert "T =" in captured and "step" in captured
