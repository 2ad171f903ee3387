"""Accuracy benchmark: energy/force RMSE of a model against a dataset.

Counterpart of reference ``tools/comp6v1-accuracy-benchmark.py`` (COMP6
RMSE gate): point it at any ANIDataset with ``energies`` (and optionally
``forces``) targets.

  python tools/accuracy_benchmark.py dataset.h5 [--model ani2x]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset")
    parser.add_argument("--model", default="ani2x")
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--forces", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from torchani_tpu.cli import _build_model
    from torchani_tpu.datasets import ANIDataset, batch_all_in_ram
    from torchani_tpu.units import hartree2kcalpermol

    model = _build_model(args.model, None)
    ds = ANIDataset(args.dataset)
    divisions = batch_all_in_ram(
        ds, batch_size=args.batch_size, splits={"all": 1.0}, shuffle=False
    )

    e_err, f_err, n_atoms_acc = [], [], []
    predict = jax.jit(lambda s, c: model(s, c))
    from torchani_tpu.grad import energies_and_forces

    predict_ef = jax.jit(lambda s, c: energies_and_forces(model, s, c))
    for batch in divisions["all"]:
        s = jnp.asarray(batch["species"])
        c = jnp.asarray(batch["coordinates"], dtype=jnp.float32)
        if args.forces and "forces" in batch:
            e, f = predict_ef(s, c)
            mask = np.asarray(batch["species"]) >= 0
            df = np.asarray(f) - np.asarray(batch["forces"])
            f_err.append(df[mask].ravel())
        else:
            e = predict(s, c)
        e_err.append(np.asarray(e, dtype=np.float64) - np.asarray(batch["energies"]))
        n_atoms_acc.append((np.asarray(batch["species"]) >= 0).sum(1))

    e_err = np.concatenate(e_err)
    rmse = float(np.sqrt(np.mean(e_err**2)))
    print(f"energy RMSE: {rmse:.6f} Ha = {hartree2kcalpermol(rmse):.3f} kcal/mol")
    per_atom = e_err / np.concatenate(n_atoms_acc)
    rmse_pa = float(np.sqrt(np.mean(per_atom**2)))
    print(
        f"energy RMSE/atom: {rmse_pa:.6f} Ha = "
        f"{hartree2kcalpermol(rmse_pa):.4f} kcal/mol"
    )
    if f_err:
        f_rmse = float(np.sqrt(np.mean(np.concatenate(f_err) ** 2)))
        print(
            f"force RMSE: {f_rmse:.6f} Ha/A = "
            f"{hartree2kcalpermol(f_rmse):.3f} kcal/mol/A"
        )


if __name__ == "__main__":
    main()
