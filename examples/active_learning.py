"""Active-learning loop sketch: QBC-driven conformer selection.

Reference analog: ``test_active_learning`` + dataset filters.  Uses the
ensemble's query-by-committee uncertainty (`ANI.energies_qbcs`) to pick the
most-disagreed-upon conformers from a candidate pool, the dataset filters to
drop outliers, and appends the selection to a growing training set.

    python examples/active_learning.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from torchani_tpu import simple_ani
    from torchani_tpu.datasets import ANIDataset, filter_by_high_force
    from torchani_tpu.testing import make_molecs

    model = simple_ani(("H", "C", "N", "O"), ensemble_size=4, key=jax.random.PRNGKey(0))

    # candidate pool (in practice: MD-sampled or perturbed conformers)
    species, coords = make_molecs(256, 10, seed=7)
    sp = jnp.asarray(species)
    out = model.energies_qbcs(sp, jnp.asarray(coords))
    qbc = np.asarray(out.qbcs)
    print(f"pool QBC: mean {qbc.mean():.4f}  max {qbc.max():.4f} Ha/sqrt(atom)")

    # select the most uncertain 10%
    k = len(qbc) // 10
    pick = np.argsort(qbc)[-k:]
    print(f"selected {k} most-uncertain conformers (QBC >= {qbc[pick].min():.4f})")

    ds = ANIDataset()
    ds.append_conformers(
        "al_round_0",
        {
            "species": species[pick],
            "coordinates": coords[pick],
            # placeholder targets: in practice, run QM on the selection
            "energies": np.asarray(out.energies)[pick].astype(np.float64),
            "forces": np.zeros((k, coords.shape[1], 3), np.float32),
        },
    )
    flagged = filter_by_high_force(ds, threshold=2.0, delete=True)
    print(f"dataset now {ds.num_conformers} conformers ({len(flagged)} filtered)")


if __name__ == "__main__":
    main()
