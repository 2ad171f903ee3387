"""Training throughput benchmark (samples/s), ANI-1x-style batches.

Counterpart of the reference's epoch-time table (``csrc/README.md:106-113``:
ANI-1x, batch 2560, cuAEV on V100: 18.2 s/epoch energy-only, 59.5 s with
forces).  Uses synthetic GDB-like molecules (random HCNO, <= 26 atoms) since
the published datasets cannot be downloaded here.

  python tools/training_benchmark.py [--batch-size 2560] [--force-training]
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
    parser.add_argument("--max-atoms", type=int, default=26)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--force-training", action="store_true")
    parser.add_argument("--ensemble", type=int, default=1)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--angular-capacity", type=int, default=None)
    parser.add_argument("--atom-block", type=int, default=None)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from torchani_tpu import simple_ani
    from torchani_tpu.testing import make_molecs
    from torchani_tpu.training import make_train_step

    model = simple_ani(
        ("H", "C", "N", "O"),
        ensemble_size=args.ensemble,
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
    if args.angular_capacity is not None or args.atom_block is not None:
        nnp = model.potentials["nnp"]
        aevc = nnp.aev_computer
        if args.angular_capacity is not None:
            aevc = aevc.replace(angular_capacity=args.angular_capacity)
        if args.atom_block is not None:
            aevc = aevc.replace(atom_block=args.atom_block)
        pots = dict(model.potentials)
        pots["nnp"] = nnp.replace(aev_computer=aevc)
        model = model.replace(potentials=pots)
    species, coords = make_molecs(args.batch_size, args.max_atoms, seed=0)
    batch = {
        "species": jnp.asarray(species),
        "coordinates": jnp.asarray(coords),
        "energies": jnp.asarray(
            np.random.RandomState(1).randn(args.batch_size).astype(np.float32)
        ),
        "forces": jnp.zeros_like(jnp.asarray(coords)),
    }
    init_fn, step_fn = make_train_step(
        model, optax.adamw(1e-3), force_training=args.force_training
    )
    state = init_fn()

    # Time `iters` optimizer steps inside ONE device program: a per-step
    # loss fetch costs a ~30 ms tunnel round-trip here, which contaminates
    # per-call timing (see CLAUDE.md measurement rules).
    @jax.jit
    def chunk(state):
        def body(st, _):
            st, metrics = step_fn(st, batch)
            return st, metrics["loss"]

        return jax.lax.scan(body, state, None, length=args.iters)

    st2, losses = chunk(state)
    _ = float(losses[-1])  # compile + sync
    t0 = time.perf_counter()
    st2, losses = chunk(state)
    _ = float(losses[-1])
    dt = (time.perf_counter() - t0) / args.iters
    samples_s = args.batch_size / dt
    print(
        f"batch {args.batch_size} x {args.max_atoms} atoms, "
        f"ensemble {args.ensemble}, force_training={args.force_training}: "
        f"{dt * 1e3:.1f} ms/step = {samples_s:,.0f} samples/s"
    )
    # reference scale: ANI-1x training set ~4.96M conformers
    print(f"projected ANI-1x epoch (4.96M conformers): {4.96e6 / samples_s:.1f} s")


if __name__ == "__main__":
    main()
