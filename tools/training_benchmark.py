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
    parser.add_argument(
        "--force-grad-mode", default="revrev",
        choices=("revrev", "fwdrev"),
        help="force-loss parameter-gradient formulation (fwdrev = "
        "reverse-over-jvp; see training.loop._force_loss_grads_fwdrev)",
    )
    parser.add_argument("--ensemble", type=int, default=1)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--angular-capacity", type=int, default=None)
    parser.add_argument("--atom-block", type=int, default=None)
    parser.add_argument(
        "--no-partition",
        action="store_true",
        help="disable the species-blocked NN path (tune_species_partition)",
    )
    parser.add_argument(
        "--angular-split",
        action="store_true",
        help="enable the count-class angular split (tune_angular_split)",
    )
    parser.add_argument(
        "--realistic",
        action="store_true",
        help="chain-bonded (GDB-like) molecules + density-bucketed "
        "per-batch angular capacities instead of uniform-random dense "
        "molecules at full capacity",
    )
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
    def time_step(step_fn, batch, capacity=None):
        """ms/step via `iters` scanned steps in one program (a per-step loss
        fetch costs ~30 ms tunnel RTT; see CLAUDE.md measurement rules)."""
        init_fn, _ = make_train_step(
            model, optax.adamw(1e-3), force_training=args.force_training
        )
        m = model
        if capacity is not None:
            from torchani_tpu.training.loop import _model_with_angular_capacity

            m = _model_with_angular_capacity(model, capacity)
        if not args.no_partition:
            from torchani_tpu.training import tune_species_partition

            m = tune_species_partition(m, [batch])
        if args.angular_split:
            from torchani_tpu.training import tune_angular_split

            host_batch = {
                "species": np.asarray(batch["species"]),
                "coordinates": np.asarray(batch["coordinates"]),
            }
            m = tune_angular_split(m, [host_batch])
            nnp = m.potentials["nnp"]
            print(f"angular_split: {nnp.aev_computer.angular_split}")
        _, step = make_train_step(
            m, optax.adamw(1e-3), force_training=args.force_training,
            force_grad_mode=args.force_grad_mode,
        )
        state = init_fn()

        # batch rides as a jit ARGUMENT: real epochs feed a different batch
        # through the same compiled step each call, so species must be
        # traced — closing over the batch would let trace-time constant
        # folding specialize paths no real training run gets
        @jax.jit
        def chunk(state, batch):
            def body(st, _):
                st, metrics = step(st, batch)
                return st, metrics["loss"]

            return jax.lax.scan(body, state, None, length=args.iters)

        st2, losses = chunk(state, batch)
        _ = float(losses[-1])  # compile + sync
        t0 = time.perf_counter()
        st2, losses = chunk(state, batch)
        _ = float(losses[-1])
        return (time.perf_counter() - t0) / args.iters * 1e3

    def as_batch(species, coords):
        n = species.shape[0]
        return {
            "species": jnp.asarray(species),
            "coordinates": jnp.asarray(coords),
            "energies": jnp.asarray(
                np.random.RandomState(1).randn(n).astype(np.float32)
            ),
            "forces": jnp.zeros((n,) + coords.shape[1:], jnp.float32),
        }

    if args.realistic:
        # GDB-like chain molecules, density-bucketed per-batch capacities
        # (Batcher.gather_batches(density_cutoff=...) semantics, reproduced
        # in-memory): most batches run at a small angular capacity.
        from torchani_tpu.testing import make_chain_molecs

        n_sample = args.batch_size * 8
        species, coords = make_chain_molecs(n_sample, args.max_atoms, seed=0)
        r_ang = float(model.potentials["nnp"].aev_computer.angular.cutoff)
        stats = []
        for i in range(n_sample):
            real = species[i] >= 0
            pos = coords[i][real]
            d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
            np.fill_diagonal(d, np.inf)
            stats.append(int((d < r_ang).sum(1).max()))
        buckets = (8, 12, 16, 20, 24, 32)
        order = np.argsort(
            [np.searchsorted(buckets, s) for s in stats], kind="stable"
        )
        species, coords = species[order], coords[order]
        stats = np.asarray(stats)[order]
        batch_caps = []
        for b0 in range(0, n_sample, args.batch_size):
            worst = stats[b0: b0 + args.batch_size].max()
            batch_caps.append(next(c for c in buckets if c >= worst))
        hist = {c: batch_caps.count(c) for c in sorted(set(batch_caps))}
        print(f"capacity histogram over {len(batch_caps)} batches: {hist}")
        total_ms = 0.0
        for cap in sorted(set(batch_caps)):
            b0 = batch_caps.index(cap) * args.batch_size
            batch = as_batch(
                species[b0: b0 + args.batch_size],
                coords[b0: b0 + args.batch_size],
            )
            ms = time_step(None, batch, capacity=cap)
            total_ms += ms * batch_caps.count(cap)
            print(f"  capacity {cap}: {ms:.1f} ms/step x{batch_caps.count(cap)}")
        dt = total_ms / len(batch_caps) / 1e3
    else:
        species, coords = make_molecs(args.batch_size, args.max_atoms, seed=0)
        dt = time_step(None, as_batch(species, coords)) / 1e3

    samples_s = args.batch_size / dt
    print(
        f"batch {args.batch_size} x {args.max_atoms} atoms, "
        f"ensemble {args.ensemble}, force_training={args.force_training}, "
        f"realistic={args.realistic}: "
        f"{dt * 1e3:.1f} ms/step = {samples_s:,.0f} samples/s"
    )
    # reference scale: ANI-1x training set ~4.96M conformers
    print(f"projected ANI-1x epoch (4.96M conformers): {4.96e6 / samples_s:.1f} s")


if __name__ == "__main__":
    main()
