"""Batched conformer-relaxation throughput (FIRE steps/s) on the device.

The conformer-screening workload: relax a whole batch of GDB-like molecules
with `minimize_fire_batched` (per-conformer FIRE schedules inside one jitted
while-loop). Reports FIRE steps/s aggregated over the batch; with typical
relaxations converging in ~100-200 steps this bounds conformers/s.

    python tools/relax_benchmark.py [--batch-size 1024] [--ensemble 8] [--cpu]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=1024)
    parser.add_argument("--max-atoms", type=int, default=26)
    parser.add_argument("--steps", type=int, default=150)
    parser.add_argument("--ensemble", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from torchani_tpu.models import ANI2x
    from torchani_tpu.optimize import minimize_fire_batched
    from torchani_tpu.testing import make_molecs

    model = ANI2x(pretrained=False)
    if args.ensemble != 8:
        nn = model.potentials["nnp"].neural_networks
        model = model.replace(
            potentials={
                **model.potentials,
                "nnp": model.potentials["nnp"].replace(
                    neural_networks=nn.set_active_members(
                        list(range(args.ensemble))
                    )
                ),
            }
        )
    species, coords = make_molecs(args.batch_size, args.max_atoms, seed=0)

    def batched_energy(c):
        return model(species, c)

    def run(steps):
        # fmax=0 forces every iteration to run: pure per-step timing
        return minimize_fire_batched(
            batched_energy,
            jnp.asarray(coords),
            atom_mask=jnp.asarray(species >= 0),
            max_steps=steps,
            fmax=0.0,
        )

    st = run(args.steps)  # compile + run
    _ = float(jnp.sum(st.energy))
    t0 = time.perf_counter()
    st = run(args.steps)
    _ = float(jnp.sum(st.energy))
    dt = time.perf_counter() - t0
    ms_per_step = dt / args.steps * 1e3
    rate = args.batch_size * args.steps / dt
    print(
        f"batch {args.batch_size} x {args.max_atoms} atoms, ensemble "
        f"{args.ensemble}: {ms_per_step:.2f} ms per batched FIRE step = "
        f"{rate:,.0f} conformer-steps/s "
        f"(~{rate / 150:,.0f} conformers/s at 150-step relaxations)"
    )


if __name__ == "__main__":
    main()
