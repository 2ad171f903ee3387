"""Neighborlist scaling benchmark: constant-density cells, growing atoms.

Counterpart of reference ``tools/neighborlist-benchmark.py:62-94``.

  python tools/neighborlist_benchmark.py [--cpu]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--cutoff", type=float, default=5.2)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from torchani_tpu.neighbors import all_pairs, cell_list, estimate_capacity
    from torchani_tpu.testing import make_water_box

    print(f"{'atoms':>8} {'algorithm':>12} {'ms':>10} {'max_nbrs':>9}")
    for atoms in (99, 501, 1002, 5001, 10002, 30000):
        species, coords, cell = make_water_box(atoms)
        a = species.shape[1]
        elem = jnp.zeros((1, a), jnp.int32)
        cellj = jnp.asarray(cell)
        pbcj = jnp.asarray([True, True, True])
        coordsj = jnp.asarray(coords)
        cap = estimate_capacity(args.cutoff, a, periodic=True)
        algos = {}
        if a <= 2000:
            algos["all_pairs"] = lambda c: all_pairs(
                args.cutoff, elem, c, cellj, pbcj, capacity=cap
            )
        algos["cell_list"] = lambda c: cell_list(
            args.cutoff, elem, c, cellj, pbcj, capacity=cap
        )
        for name, fn in algos.items():
            jitted = jax.jit(lambda c, fn=fn: jnp.sum(fn(c).dist))
            _ = float(jitted(coordsj))
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                _ = float(jitted(coordsj))
            dt = (time.perf_counter() - t0) / iters * 1e3
            nbrs = fn(coordsj)
            print(
                f"{a:>8} {name:>12} {dt:>10.2f} "
                f"{int(np.asarray(nbrs.count()).max()):>9}"
            )


if __name__ == "__main__":
    main()
