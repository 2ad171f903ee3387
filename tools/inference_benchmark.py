"""Batched ensemble-inference throughput (COMP6-style conformer batches).

Counterpart of the reference's ``tools/inference-benchmark.py`` +
``torchani/nn/_infer.py:61-216`` (BmmEnsemble/MNP: fused batched-matmul
execution of the full 8-member ensemble for inference).  Here the default
execution already IS the fused form (species-stacked member-batched
matmuls), so this tool just measures it: energies and energies+forces
samples/s for the full ANI-2x 8-member ensemble over GDB/COMP6-like
conformer batches (random tree-bonded molecules, 10-60 atoms).

Measurement rules (CLAUDE.md): N scanned evaluations inside ONE jit,
coords perturbed by the loop index to defeat CSE, a single scalar fetch.

  python tools/inference_benchmark.py [--batch-size 2560] [--max-atoms 60]
                                      [--forces] [--iters 20]
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
    parser.add_argument("--max-atoms", type=int, default=60)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--forces", action="store_true")
    parser.add_argument("--both", action="store_true", help="run E then E+F")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--ensemble", type=int, default=8)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from torchani_tpu import models
    from torchani_tpu.testing import make_chain_molecs
    from torchani_tpu.training.loop import tune_angular_capacity

    model = models.ANI2x(pretrained=False)
    if args.ensemble != 8:
        from torchani_tpu.models import _select_member

        assert args.ensemble == 1
        model = _select_member(model, 0)

    znums_2x = [1, 6, 7, 8, 9, 16, 17]
    species_np, coords_np = make_chain_molecs(
        args.batch_size, args.max_atoms, seed=0, znums=znums_2x
    )
    # Same capacity policy as training/data pipelines: measure the batch's
    # real angular neighbor count and pin the static capacity to it.
    model = tune_angular_capacity(
        model, [{"species": species_np, "coordinates": coords_np}]
    )
    if "--no-split" not in sys.argv:
        # Count-class angular split + zero-count row skip (r5): inference
        # forces are FIRST-order AD (one grad — not force training's
        # grad-of-grad, where the split replays), and conformer batches
        # pad the atom axis to the batch max (~45% zero-count rows at
        # 10-60-atom size distributions), so the 3-tuple split's row skip
        # pays on BOTH modes here.  Same overflow-poison semantics as
        # everywhere else.
        from torchani_tpu.training.loop import tune_angular_split

        model = tune_angular_split(
            model, [{"species": species_np, "coordinates": coords_np}]
        )
        print(
            "angular_split:",
            model.potentials["nnp"].aev_computer.angular_split,
        )
    cap = model.potentials["nnp"].aev_computer.angular_capacity
    species = jnp.asarray(species_np)
    coords = jnp.asarray(coords_np)

    def bench(with_forces: bool) -> float:
        if with_forces:
            def one(c):
                def esum(cc):
                    return jnp.sum(model(species, cc))

                e, g = jax.value_and_grad(esum)(c)
                return e + jnp.sum(g)
        else:
            def one(c):
                return jnp.sum(model(species, c))

        @jax.jit
        def chunk(c):
            def body(acc, i):
                # nudge coords by the loop index so XLA cannot CSE the
                # iterations into one evaluation
                return acc + one(c + i * 1e-7), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((), c.dtype), jnp.arange(args.iters, dtype=c.dtype)
            )
            return acc

        _ = float(chunk(coords))  # compile + sync
        t0 = time.perf_counter()
        _ = float(chunk(coords))
        return (time.perf_counter() - t0) / args.iters * 1e3

    modes = ["ef"] if args.forces else (["e", "ef"] if args.both else ["e"])
    n_members = args.ensemble
    for mode in modes:
        ms = bench(mode == "ef")
        samples_s = args.batch_size / (ms / 1e3)
        print(
            f"ANI-2x x{n_members} members, batch {args.batch_size} x "
            f"<= {args.max_atoms} atoms (angular cap {cap}), "
            f"{'E+F' if mode == 'ef' else 'E'}: "
            f"{ms:.2f} ms/batch = {samples_s:,.0f} conformers/s"
        )


if __name__ == "__main__":
    main()
