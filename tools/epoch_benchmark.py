"""End-to-end epoch throughput through the production EpochRunner.

The scanned-step benchmark (tools/training_benchmark.py) measures the
device cadence; THIS measures what a user's epoch actually achieves —
host batch staging, chunk stacking, compiled scans, one loss fetch —
and must land within ~15% of the scanned-step rate (VERDICT r3 task 3).

  python tools/epoch_benchmark.py [--batch-size 2560] [--batches 40]
                                  [--force-training] [--angular-split]

Reference counterpart: the tqdm epoch loop of
``/root/reference/examples/training.py:160-199``.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=2560)
    parser.add_argument("--batches", type=int, default=40)
    parser.add_argument("--max-atoms", type=int, default=26)
    parser.add_argument("--angular-capacity", type=int, default=12)
    parser.add_argument("--chunk", type=int, default=50)
    parser.add_argument("--force-training", action="store_true")
    parser.add_argument("--angular-split", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import optax

    from torchani_tpu import simple_ani
    from torchani_tpu.testing import make_molecs
    from torchani_tpu.training import (
        EpochRunner,
        tune_angular_split,
        tune_species_partition,
    )
    from torchani_tpu.training.loop import _model_with_angular_capacity

    model = simple_ani(
        ("H", "C", "N", "O"),
        ensemble_size=1,
        repulsion=False,
        cutoff_fn="cosine",
        radial_start=0.9,
        radial_cutoff=5.2,
        angular_start=0.9,
        activation="celu",
        bias=True,
    )
    model = model.replace(
        energy_shifter=model.energy_shifter.replace(enabled=False)
    )
    model = _model_with_angular_capacity(model, args.angular_capacity)

    rng = np.random.RandomState(0)
    batches = []
    for i in range(args.batches):
        species, coords = make_molecs(
            args.batch_size, args.max_atoms, seed=i
        )
        b = {
            "species": species,
            "coordinates": coords,
            "energies": rng.randn(args.batch_size).astype(np.float32),
        }
        if args.force_training:
            b["forces"] = np.zeros_like(coords)
        batches.append(b)

    model = tune_species_partition(model, batches[:1])
    if args.angular_split:
        model = tune_angular_split(model, batches[:1])
        print(
            "angular_split:",
            model.potentials["nnp"].aev_computer.angular_split,
            flush=True,
        )

    runner = EpochRunner(
        model,
        optax.adamw(1e-3),
        force_training=args.force_training,
        chunk=args.chunk,
    )
    state = runner.init()
    # epoch 0 pays the compiles; epoch 1 is the steady-state measurement
    state, m0 = runner.epoch(state, batches)
    t0 = time.perf_counter()
    state, m1 = runner.epoch(state, batches)
    dt = time.perf_counter() - t0
    n_samples = args.batches * args.batch_size
    print(
        f"epoch: {dt:.2f} s for {args.batches} batches x {args.batch_size} "
        f"= {n_samples / dt / 1e3:.1f}k samples/s "
        f"({dt / args.batches * 1e3:.2f} ms/step incl. host staging); "
        f"loss {m1['loss']:.6f}",
        flush=True,
    )
    rmse = None
    t0 = time.perf_counter()
    rmse = runner.validate(state, batches[: max(args.batches // 4, 1)])
    dt = time.perf_counter() - t0
    print(
        f"validate: {dt:.2f} s for {max(args.batches // 4, 1)} batches "
        f"(jitted scans); RMSE {rmse:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
