"""End-to-end training example (reference ``examples/training.py`` analog).

Trains an ANI-style model on a dataset with energy (and optional force)
targets: batched dataset -> SAE subtraction -> jitted AdamW steps with
reduce-on-plateau, checkpoint/resume, data-parallel over available devices.

Run (synthetic demo data):
    python examples/training.py --demo --epochs 3
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def make_demo_dataset(path, num=512, max_atoms=12, seed=0):
    """Synthetic dataset with energies from a fixed random 'teacher'."""
    import jax
    import jax.numpy as jnp

    from torchani_tpu import simple_ani
    from torchani_tpu.datasets import ANIDataset

    teacher = simple_ani(("H", "C", "N", "O"), key=jax.random.PRNGKey(99))
    rng = np.random.RandomState(seed)
    ds = ANIDataset(path)
    species = np.full((num, max_atoms), -1, dtype=np.int64)
    coords = np.zeros((num, max_atoms, 3), dtype=np.float32)
    for i in range(num):
        n = rng.randint(4, max_atoms + 1)
        species[i, :n] = rng.choice([1, 6, 7, 8], size=n)
        coords[i, :n] = rng.rand(n, 3) * 4.0
    energies = np.asarray(
        teacher(jnp.asarray(species), jnp.asarray(coords)), dtype=np.float64
    )
    ds.append_conformers(
        "demo", {"species": species, "coordinates": coords, "energies": energies}
    )
    return ds


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default=None, help="ANIDataset location (.h5)")
    parser.add_argument("--demo", action="store_true", help="use synthetic data")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--force-training", action="store_true")
    parser.add_argument("--ckpt-dir", default="/tmp/ani_tpu_training")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from torchani_tpu import simple_ani
    from torchani_tpu.datasets import ANIDataset, batch_all_in_ram
    from torchani_tpu.sae import sorted_gsaes
    from torchani_tpu.training import EpochRunner
    from torchani_tpu.training.checkpoints import (
        latest_step,
        load_checkpoint,
        save_checkpoint,
    )
    from torchani_tpu.training.schedules import adamw_with_plateau
    from torchani_tpu.transforms import Compose, SubtractSAE

    symbols = ("H", "C", "N", "O")
    if args.demo or args.dataset is None:
        dataset = make_demo_dataset("/tmp/ani_tpu_demo.h5")
    else:
        dataset = ANIDataset(args.dataset)

    transform = Compose(
        [SubtractSAE(symbols, sorted_gsaes(symbols, "wb97x", "631gd"))]
    )
    divisions = batch_all_in_ram(
        dataset,
        batch_size=args.batch_size,
        splits={"training": 0.8, "validation": 0.2},
        transform=transform,
        rng_seed=1234,
    )

    model = simple_ani(symbols, key=jax.random.PRNGKey(0))
    model = model.replace(energy_shifter=model.energy_shifter.replace(enabled=False))
    optimizer, plateau = adamw_with_plateau(args.lr)
    # EpochRunner = scanned device chunks + one host fetch per epoch +
    # compiled validation (the naive per-batch float(loss) loop costs a
    # ~30 ms device->host round-trip per step; docs/performance.md
    # "Measurement rules")
    runner = EpochRunner(
        model, optimizer, force_training=args.force_training
    )

    state = runner.init()
    restored = load_checkpoint(args.ckpt_dir, state)
    if restored is not None:
        state = restored
        print(f"resumed from step {int(state.step)}")

    from torchani_tpu.training import MetricsWriter

    best = np.inf
    # durable scalars channel (the reference writes these to TensorBoard,
    # reference examples/training.py:126-127)
    writer = MetricsWriter(Path(args.ckpt_dir) / "metrics.jsonl", csv_mirror=True)
    for epoch in range(args.epochs):
        t0 = time.time()
        state, metrics = runner.epoch(
            state, divisions["training"].shuffled(seed=epoch)
        )
        val_rmse = runner.validate(state, divisions["validation"])
        lr = plateau.update(val_rmse)
        state.opt_state.hyperparams["learning_rate"] = lr
        print(
            f"epoch {epoch:4d}  loss {metrics['loss']:.6f}  "
            f"val RMSE {val_rmse:.6f} Ha  lr {lr:.2e}  "
            f"({time.time() - t0:.1f}s)"
        )
        writer.write(
            epoch,
            {
                "loss": metrics["loss"],
                "val_rmse": val_rmse,
                "lr": lr,
                "epoch_seconds": time.time() - t0,
            },
        )
        save_checkpoint(args.ckpt_dir, state, int(state.step))
        if val_rmse < best:
            best = val_rmse
            save_checkpoint(Path(args.ckpt_dir) / "best", state, int(state.step), keep=1)
    writer.close()
    print(f"best val RMSE: {best:.6f} Ha")


if __name__ == "__main__":
    main()
