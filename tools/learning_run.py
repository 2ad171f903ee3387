"""End-to-end LEARNING demonstration (BASELINE config 3's correctness leg).

Every other training artifact in this repo measures *throughput*; this one
shows a model actually learning: a descending validation RMSE over >=20
epochs with the reference's own training recipe (AdamW + reduce-on-plateau
on val RMSE, checkpoint latest/best, resume) — the loop the reference ships
as its flagship example (/root/reference/examples/training.py:76-199).

The dataset is REFERENCE-LABELED: GDB-like HCNO molecules (random tree
bonding, thermally perturbed conformers) are labeled with energies and
forces by the *reference TorchANI* running on CPU (a seeded
``simple_ani`` teacher — published weights cannot be downloaded in this
environment, and the learning demonstration only needs a consistent,
physically-shaped target surface).  Labels flow through the full data
stack: ANIDataset (HDF5) -> seeded Batcher divisions -> SAE subtraction ->
EpochRunner.

Usage:
    python tools/learning_run.py --make-data          # label with reference (CPU)
    python tools/learning_run.py --train --epochs 25  # train (TPU or CPU)
    python tools/learning_run.py --train --kill-at 8  # die after epoch 8
    python tools/learning_run.py --train --resume     # resume from latest
    python tools/learning_run.py --cpu ...            # force CPU

Artifacts: /tmp/ani_learning/metrics.csv (one row per epoch) and
checkpoints under /tmp/ani_learning/ckpt; the doc section in
docs/performance.md ("Learning run") is produced from the CSV.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

WORKDIR = Path("/tmp/ani_learning")
DATA = WORKDIR / "reference_labeled.h5"
CKPT = WORKDIR / "ckpt"
METRICS = WORKDIR / "metrics.csv"
SYMBOLS = ("H", "C", "N", "O")
LOT = "wb97x-631gd"
SEED = 7


def make_data(num_molecules=2000, conformers_each=16, max_atoms=14):
    """Generate conformers and label them with the reference on CPU."""
    # same typer stub make_goldens.py creates (can't import that module for
    # it: its module level already imports torchani); invalidate_caches so a
    # same-second stub write isn't missed by importlib's directory cache
    import importlib

    typer = Path("/tmp/refstub/typer")
    typer.mkdir(parents=True, exist_ok=True)
    (typer / "__init__.py").write_text(
        "class Typer:\n"
        "    def __init__(self, *a, **k): pass\n"
        "    def command(self, *a, **k):\n"
        "        def deco(f): return f\n"
        "        return deco\n"
        "    def callback(self, *a, **k):\n"
        "        def deco(f): return f\n"
        "        return deco\n"
        "    def add_typer(self, *a, **k): pass\n"
        "    def __call__(self, *a, **k): pass\n"
        "def Argument(*a, **k): return None\n"
        "def Option(*a, **k): return None\n"
        "class Abort(Exception): pass\n"
    )
    importlib.invalidate_caches()
    sys.path.insert(0, "/tmp/refstub")
    sys.path.insert(0, "/root/reference")

    import torch
    import torchani  # the REFERENCE, used as labeling oracle

    torch.manual_seed(SEED)
    ref = torchani.arch.simple_ani(SYMBOLS, lot=LOT, ensemble_size=1)
    ref = ref.double()

    from torchani_tpu.testing import make_chain_molecs

    rng = np.random.RandomState(SEED)
    base_species, base_coords = make_chain_molecs(
        num_molecules, max_atoms, seed=SEED
    )
    # thermal-ish conformers: correlated Gaussian displacements
    species = np.repeat(base_species, conformers_each, axis=0)
    coords = np.repeat(base_coords, conformers_each, axis=0)
    coords = coords + rng.randn(*coords.shape).astype(np.float32) * 0.06
    n_total = coords.shape[0]

    energies = np.zeros(n_total, np.float64)
    forces = np.zeros_like(coords, dtype=np.float32)
    bs = 512
    for i0 in range(0, n_total, bs):
        sl = slice(i0, min(i0 + bs, n_total))
        sp_t = torch.as_tensor(species[sl])
        xyz = torch.as_tensor(coords[sl], dtype=torch.float64)
        xyz.requires_grad_(True)
        e = ref((sp_t, xyz)).energies
        (g,) = torch.autograd.grad(e.sum(), xyz)
        energies[sl] = e.detach().numpy()
        forces[sl] = (-g).numpy().astype(np.float32)
        print(f"labeled {sl.stop}/{n_total}", flush=True)

    from torchani_tpu.datasets import ANIDataset

    WORKDIR.mkdir(parents=True, exist_ok=True)
    if DATA.exists():
        DATA.unlink()
    ds = ANIDataset(DATA)
    ds.append_conformers(
        "gdb_like",
        {
            "species": species,
            "coordinates": coords,
            "energies": energies,
            "forces": forces,
        },
    )
    print(f"wrote {n_total} reference-labeled conformers -> {DATA}")


def load_batches(batch_size, seed=SEED):
    """Seeded train/valid division -> in-RAM SAE-subtracted batches."""
    from torchani_tpu.constants import GSAES
    from torchani_tpu.datasets import ANIDataset

    ds = ANIDataset(DATA)
    grp = next(iter(ds.keys()))
    data = {k: np.asarray(v) for k, v in ds[grp].items()}
    n = data["species"].shape[0]
    rng = np.random.RandomState(seed)
    order = rng.permutation(n)
    n_val = max(1, int(0.1 * n))
    val_idx, train_idx = order[:n_val], order[n_val:]

    gsaes = GSAES[LOT]
    sae = np.zeros(120, np.float64)
    from torchani_tpu.constants import ATOMIC_NUMBER

    for s in SYMBOLS:
        sae[ATOMIC_NUMBER[s]] = gsaes[s]

    def batches_of(idx):
        out = []
        for i0 in range(0, idx.shape[0] - batch_size + 1, batch_size):
            sl = idx[i0 : i0 + batch_size]
            sp = data["species"][sl]
            shift = sae[np.where(sp < 0, 0, sp)].sum(axis=1) * (sp >= 0).any(
                axis=1
            )
            out.append(
                {
                    "species": sp.astype(np.int32),
                    "coordinates": data["coordinates"][sl].astype(np.float32),
                    "energies": (data["energies"][sl] - shift).astype(
                        np.float32
                    ),
                    "forces": data["forces"][sl].astype(np.float32),
                }
            )
        return out

    return batches_of(train_idx), batches_of(val_idx)


def train(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import torchani_tpu as tt
    from torchani_tpu.training import (
        EpochRunner,
        MetricsWriter,
        tune_angular_capacity,
    )
    from torchani_tpu.training.checkpoints import (
        load_checkpoint,
        save_checkpoint,
    )
    from torchani_tpu.training.schedules import adamw_with_plateau

    train_b, val_b = load_batches(args.batch_size)
    print(f"train {len(train_b)} x {args.batch_size}, val {len(val_b)} batches")

    # student: same architecture family, fresh seed, no shifter (targets are
    # SAE-subtracted, the reference training convention)
    model = tt.simple_ani(SYMBOLS, ensemble_size=1, key=jax.random.PRNGKey(3))
    model = model.replace(
        energy_shifter=model.energy_shifter.replace(enabled=False)
    )
    model = tune_angular_capacity(model, train_b[:4])

    optimizer, plateau = adamw_with_plateau(args.lr)
    plateau.patience = 2
    plateau.factor = 0.5
    runner = EpochRunner(
        model,
        optimizer,
        force_training=args.force_training,
        force_weight=0.1,
    )
    state = runner.init()
    start_epoch = 0
    best = float("inf")
    if args.resume:
        try:
            restored = load_checkpoint(
                CKPT / "latest", (state, 0, 0.0, 0.0, 0)
            )
        except ValueError:  # checkpoint from the pre-bad_epochs layout
            restored = load_checkpoint(CKPT / "latest", (state, 0, 0.0, 0.0))
            if restored is not None:
                restored = (*restored, 0)
        if restored is None:
            print("no checkpoint to resume from; starting fresh")
        else:
            state, start_epoch, best, lr, bad = restored
            start_epoch, best = int(start_epoch), float(best)
            plateau.lr = float(lr)
            plateau.best = best
            plateau.bad_epochs = int(bad)
            print(f"resumed at epoch {start_epoch} (best val RMSE {best:.6f})")

    mw = MetricsWriter(WORKDIR / "metrics.jsonl", csv_mirror=True)
    import time

    for epoch in range(start_epoch, args.epochs):
        rng = np.random.RandomState(1000 + epoch)
        order = rng.permutation(len(train_b))
        t0 = time.perf_counter()
        state, m = runner.epoch(state, [train_b[i] for i in order])
        val_rmse = runner.validate(state, val_b)
        dt = time.perf_counter() - t0
        lr = plateau.update(val_rmse)
        state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, jnp.float32
        )
        mw.write(
            epoch + 1,
            {
                "loss": m["loss"],
                "val_rmse_ha": val_rmse,
                "val_rmse_kcalmol": val_rmse * 627.5094738898777,
                "lr": lr,
                "seconds": round(dt, 2),
            },
        )
        print(
            f"epoch {epoch + 1:3d}  loss {m['loss']:.3e}  "
            f"val RMSE {val_rmse * 627.5094738898777:8.3f} kcal/mol  "
            f"lr {lr:.2e}  ({dt:.1f} s)",
            flush=True,
        )
        if val_rmse < best:
            best = val_rmse
            save_checkpoint(CKPT / "best", state.networks, epoch + 1, keep=1)
        save_checkpoint(
            CKPT / "latest",
            (state, epoch + 1, best, plateau.lr, plateau.bad_epochs),
            epoch + 1,
        )
        if args.kill_at and epoch + 1 >= args.kill_at:
            print(f"simulating crash after epoch {epoch + 1}")
            import os

            os._exit(17)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-data", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--force-training", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--kill-at", type=int, default=0)
    args = ap.parse_args()
    if args.make_data:
        make_data()
    if args.train:
        train(args)


if __name__ == "__main__":
    main()
