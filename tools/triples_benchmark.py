"""Triples-expansion throughput over a size sweep.

Counterpart of the reference's ``tools/triples-benchmark.py`` (timing
``neighbors_to_triples`` at water density across 30-700 atoms, py/jit/
compile/cu variants).  On TPU there is one variant — the jitted padded
per-center expansion (`torchani_tpu.neighbors.neighbors_to_triples`) —
so this sweeps sizes at the same ~0.1 atoms/A^3 density and reports
ms/call and expanded-triples/s.

Measurement rules (CLAUDE.md): N scanned calls inside ONE jit (coords
perturbed per iteration to defeat CSE), one scalar fetch.

  python tools/triples_benchmark.py [--sizes 30,100,300,700] [--iters 20]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=str, default="30,100,300,700")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from torchani_tpu.neighbors import adaptive_list, neighbors_to_triples

    cutoff = 5.2
    density = 0.1  # atoms/A^3, ~water (reference triples-benchmark.py:75)
    rng = np.random.RandomState(1234)
    for n in (int(s) for s in args.sizes.split(",")):
        side = (n / density) ** (1 / 3)
        coords_np = (rng.rand(1, n, 3) * side).astype(np.float32)
        elem_idxs = jnp.zeros((1, n), jnp.int32)
        coords = jnp.asarray(coords_np)
        nb = adaptive_list(cutoff, elem_idxs, coords, None, None)
        k = nb.capacity

        @jax.jit
        def chunk(c):
            def body(acc, i):
                nbi = adaptive_list(
                    cutoff, elem_idxs, c + i * 1e-6, None, None,
                    capacity=k,
                )
                tr = neighbors_to_triples(nbi)
                return acc + jnp.sum(
                    jnp.where(tr.mask, tr.side_dist[..., 0], 0.0)
                ), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((), c.dtype), jnp.arange(args.iters, dtype=c.dtype)
            )
            return acc

        _ = float(chunk(coords))
        t0 = time.perf_counter()
        _ = float(chunk(coords))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        triples = n * k * (k - 1) // 2
        print(
            f"{n:5d} atoms (cell {side:6.1f} A, K={k:3d}): "
            f"{ms:7.3f} ms/call (nbrlist+triples), "
            f"{triples / (ms / 1e3):,.0f} padded triples/s"
        )


if __name__ == "__main__":
    main()
