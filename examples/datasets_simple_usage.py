"""Basic usage of ``torchani_tpu.datasets.ANIDataset``.

Analog of ``/root/reference/examples/datasets_simple_usage.py``: create a
dataset, append/read/delete conformer groups, and iterate. Built-in published
datasets (ANI-1x, COMP6, ...) resolve from a local data root in this offline
environment — see ``torchani_tpu.datasets.builtin``.

    python examples/datasets_simple_usage.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    from torchani_tpu.datasets import ANIDataset

    with tempfile.TemporaryDirectory() as d:
        # An HDF5-backed dataset (use suffix .pqdir for Parquet, or no
        # argument for a throwaway in-memory store).
        ds = ANIDataset(Path(d) / "demo.h5")

        # Groups hold conformers of one molecule/formula.
        rng = np.random.RandomState(0)
        ds.append_conformers(
            "water",
            {
                "species": np.tile([8, 1, 1], (5, 1)),
                "coordinates": rng.randn(5, 3, 3).astype(np.float32),
                "energies": rng.randn(5).astype(np.float64),
            },
        )
        ds.append_conformers(
            "methane",
            {
                "species": np.tile([6, 1, 1, 1, 1], (3, 1)),
                "coordinates": rng.randn(3, 5, 3).astype(np.float32),
                "energies": rng.randn(3).astype(np.float64),
            },
        )
        print(f"{ds.num_conformers} conformers in {len(ds.keys())} groups")
        print("properties:", sorted(ds.properties))

        # Random access by group and index:
        sel = ds.get_conformers("water", [0, 2])
        print("water energies[0,2]:", sel["energies"])

        # Iterate every conformer (lazy, group by group):
        n_atoms = [int((c["species"] >= 0).sum()) for c in ds.iter_conformers()]
        print("atoms per conformer:", n_atoms)

        # Restructure on disk: group by formula or by atom count.
        ds.regroup_by_num_atoms()
        print("after regroup:", ds.keys())

        # Delete a property everywhere (e.g. drop stale labels).
        ds.delete_properties(["energies"])
        print("properties now:", sorted(ds.properties))


if __name__ == "__main__":
    main()
