"""Advanced dataset usage: batching, transforms, filters, SAE estimation.

Analog of ``/root/reference/examples/datasets_advanced_usage.py``. Shows the
training-side pipeline: carve a dataset into fixed-size padded batches (the
shapes TPUs want), apply transforms (index conversion, self-energy
subtraction), regress self-atomic-energies from the data, and filter outliers.

    python examples/datasets_advanced_usage.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    from torchani_tpu.datasets import (
        ANIBatchedDataset,
        ANIDataset,
        create_batched_dataset,
        filter_by_high_force,
    )
    from torchani_tpu.sae_estimation import exact_saes
    from torchani_tpu.transforms import (
        AtomicNumbersToIndices,
        Compose,
        SubtractSAE,
    )

    rng = np.random.RandomState(0)
    ds = ANIDataset()  # in-memory store
    for name, z, n in [("water", [8, 1, 1], 64), ("ammonia", [7, 1, 1, 1], 48)]:
        a = len(z)
        ds.append_conformers(
            name,
            {
                "species": np.tile(z, (n, 1)),
                "coordinates": (rng.randn(n, a, 3) * 0.1
                                + rng.randn(1, a, 3)).astype(np.float32),
                "energies": (-76.0 + 0.01 * rng.randn(n)).astype(np.float64),
                "forces": rng.randn(n, a, 3).astype(np.float32) * 0.05,
            },
        )

    # 1) Estimate self-atomic energies by exact least squares over formulas.
    symbols = ("H", "N", "O")
    to_idx = AtomicNumbersToIndices(symbols)
    saes, _ = exact_saes(
        (to_idx(props) for _, props in ds.items()), num_species=len(symbols)
    )
    print("regressed SAEs:", {s: round(float(v), 4) for s, v in zip(symbols, saes)})

    # 2) Transform pipeline applied per batch at creation time.
    transform = Compose([to_idx, SubtractSAE(symbols, [float(s) for s in saes])])

    # 3) Write fixed-size shuffled batches to disk (one npz per batch).
    with tempfile.TemporaryDirectory() as d:
        dest = create_batched_dataset(
            ds,
            dest_path=Path(d) / "batches",
            batch_size=32,
            splits={"training": 0.8, "validation": 0.2},
            transform=transform,
            rng_seed=1234,
        )
        train = ANIBatchedDataset(dest, division="training")
        batch = train[0]
        print(f"{len(train)} training batches; batch keys {sorted(batch)}")
        print("padded species shape:", batch["species"].shape)
        print("shifted energy mean:", round(float(batch["energies"].mean()), 4))

    # 4) Filters flag (optionally delete) conformers with bad labels.
    flagged = filter_by_high_force(ds, threshold=0.1, delete=True)
    print(f"filtered {len(flagged)} high-force conformers; "
          f"{ds.num_conformers} remain")


if __name__ == "__main__":
    main()
