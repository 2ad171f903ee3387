"""Stage ablation of the RAW (from-scratch) single-point path.

The bench's ``raw_ef_ms_per_step`` builds a fresh cell list and
differentiates energies wrt coords every call (reference one-shot entry:
``/root/reference/torchani/potentials/core.py:15-103``).  This tool
splits that call into its stages, each timed by scanning N iterations
inside ONE jit (per-call scalar fetches cost ~30 ms tunnel RTT —
CLAUDE.md measurement rules):

  build_fwd     cell-list build (stop-grad screen + pack + payload gather)
  eval_f        model fwd from a FIXED prebuilt table
  eval_fb       model fwd+bwd wrt the table's diff (no gather/scatter)
  gather_fb     the _finalize coords-gather fwd + its scatter-add backward
  raw_fb        the full from-scratch energies+forces (the bench number)

    python tools/ablate_raw.py [--atoms 10002] [--iters 10] [--cpu]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--atoms", type=int, default=10002)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--capacity", type=int, default=96)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from torchani_tpu.grad import energies_and_forces
    from torchani_tpu.models import ANI2x
    from torchani_tpu.neighbors import CellList, cell_list
    from torchani_tpu.testing import make_water_box

    species_np, coords_np, cell_np = make_water_box(args.atoms)
    model = ANI2x(pretrained=False)
    model = model.replace(neighborlist=CellList(capacity=args.capacity))
    species = jnp.asarray(species_np)
    coords = jnp.asarray(coords_np)
    cell = jnp.asarray(cell_np)
    pbc = jnp.asarray([True, True, True])
    elem = model.species_converter(species)
    cutoff = model.cutoff
    iters = args.iters

    def timeit(name, body):
        @jax.jit
        def chunk(c):
            def it(i, acc):
                return acc + body(c + i * jnp.asarray(1e-6, c.dtype))

            return jax.lax.fori_loop(0, iters, it, 0.0)

        _ = float(chunk(coords))  # compile + sync
        t0 = time.perf_counter()
        _ = float(chunk(coords))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:10s} {ms:8.2f} ms", flush=True)
        return ms

    # a) cell-list build forward
    def build(c):
        nb = cell_list(cutoff, elem, c, cell, pbc, capacity=args.capacity)
        return jnp.sum(nb.dist) + jnp.sum(nb.idx.astype(jnp.float32))

    timeit("build_fwd", build)

    # fixed prebuilt table for the eval stages
    nb0 = jax.jit(
        lambda c: cell_list(cutoff, elem, c, cell, pbc, capacity=args.capacity)
    )(coords)
    nb0 = jax.tree.map(jax.lax.stop_gradient, nb0)

    # b) model forward from the fixed table
    def eval_f(c):
        out = model.compute_from_neighbors(elem, c, nb0)
        return jnp.sum(out.energies)

    timeit("eval_f", eval_f)

    # c) model fwd+bwd wrt the table's diff (isolates the model's own AD)
    def eval_fb(c):
        scale = 1.0 + jnp.sum(c) * 0.0

        def e_of_diff(diff):
            nb = nb0.replace(diff=diff, dist=jnp.sqrt(
                jnp.where(nb0.mask, jnp.sum(diff * diff, -1), 1.0)
            ))
            return jnp.sum(
                model.compute_from_neighbors(elem, c, nb).energies
            )

        e, g = jax.value_and_grad(e_of_diff)(nb0.diff * scale)
        return e + jnp.sum(g)

    timeit("eval_fb", eval_fb)

    # d) the _finalize-style coords gather + scatter-add backward alone
    idx0 = jnp.where(nb0.mask, nb0.idx, 0)[0]
    w = jnp.ones(idx0.shape + (3,), jnp.float32)

    def gather_fb(c):
        def e(cc):
            nbr_pos = jnp.take(cc[0], idx0, axis=0)
            return jnp.sum(nbr_pos * w)

        val, g = jax.value_and_grad(e)(c)
        return val + jnp.sum(g)

    timeit("gather_fb", gather_fb)

    # e) full from-scratch energies+forces (the bench stage)
    def raw(c):
        e, f = energies_and_forces(model, species, c, cell, pbc)
        return jnp.sum(e) + jnp.sum(f)

    timeit("raw_fb", raw)

    # f) cleanly-split from-scratch path: stop-grad topology build, then an
    # explicit refresh-style differentiable diff recompute (algebraically
    # identical — the build's screen is already stop-grad and _finalize's
    # diff is exactly coords[j] - coords[i] + shift)
    from torchani_tpu.neighbors import Neighbors

    def split_raw(c):
        cflat = c[0]
        nb = cell_list(
            cutoff, elem, jax.lax.stop_gradient(c), cell, pbc,
            capacity=args.capacity,
        )
        idx0 = jnp.where(nb.mask, nb.idx, 0)[0]
        pos = jax.lax.stop_gradient(cflat)
        shift = nb.diff[0] - (jnp.take(pos, idx0, axis=0) - pos[:, None, :])
        shift = jnp.where(nb.mask[0][..., None], shift, 0.0)

        def energy(cc):
            pj = jnp.take(cc[0], idx0, axis=0)
            diff = pj - cc[0][:, None, :] + shift
            diff = jnp.where(nb.mask[0][..., None], diff, 0.0)
            dist = jnp.sqrt(
                jnp.where(nb.mask[0], jnp.sum(diff * diff, -1), 1.0)
            )
            nbd = Neighbors(
                idx=nb.idx, mask=nb.mask, diff=diff[None], dist=dist[None],
                overflow=nb.overflow,
            )
            out = model.compute_from_neighbors(elem, cc, nbd)
            return jnp.sum(out.energies)

        e, g = jax.value_and_grad(energy)(c)
        return e + jnp.sum(g)

    timeit("split_fb", split_raw)


if __name__ == "__main__":
    main()
