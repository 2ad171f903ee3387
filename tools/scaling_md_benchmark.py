"""MD scaling benchmark: walltime per ns vs system size.

Counterpart of reference ``tools/scaling-md-benchmark.py:37-38``.

  python tools/scaling_md_benchmark.py [--sizes 1002 5001 10002] [--steps 20]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=int, nargs="+", default=[1002, 5001, 10002])
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from torchani_tpu.md import MolecularDynamics
    from torchani_tpu.models import ANI2x
    from torchani_tpu.neighbors import CellList
    from torchani_tpu.testing import make_water_box

    print(f"{'atoms':>8} {'ms/step':>10} {'ns/day@1fs':>12} {'days/ns':>10}")
    for atoms in args.sizes:
        species, coords, cell = make_water_box(atoms)
        model = ANI2x(pretrained=False).replace(
            neighborlist=CellList(capacity=96)
        )
        md = MolecularDynamics(model, species, cell=cell, pbc=True)
        state = md.init(coords, temperature=300.0)
        # warm with the SAME step count: the scan length is part of the
        # compiled program signature, so a different length would put a
        # full recompile inside the timed region
        state = md.run_nve(state, args.steps)
        _ = float(state.energy)
        t0 = time.perf_counter()
        state = md.run_nve(state, args.steps)
        _ = float(state.energy)
        dt = (time.perf_counter() - t0) / args.steps
        ns_day = 86400.0 / dt * 1e-6
        print(
            f"{species.shape[1]:>8} {dt * 1e3:>10.2f} {ns_day:>12.3f} "
            f"{1.0 / ns_day / 365.25 * 365.25:>10.2f}"
        )


if __name__ == "__main__":
    main()
