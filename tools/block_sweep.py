"""Sweep the angular atom_block size on the cached-topology force path.

The 256 default was tuned before the repack contraction rewrite; with the
angular while-loops now dominant, larger blocks amortize per-iteration
overhead (40 fwd + 40 remat-backward iterations at blk=256).

    python tools/block_sweep.py [blocks...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit(fn, x, reps=30):
    def body(i, acc):
        return acc + jnp.sum(fn(x + i * 1e-7))

    scanned = jax.jit(lambda x0: jax.lax.fori_loop(0, reps, body, 0.0))
    _ = float(scanned(x))
    t0 = time.perf_counter()
    _ = float(scanned(x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import torchani_tpu as tt
    from torchani_tpu.md import MolecularDynamics, _refresh_neighbors
    from torchani_tpu.neighbors import narrow_to_cutoff
    from torchani_tpu.testing import make_water_box

    blocks = [int(b) for b in sys.argv[1:]] or [256, 512, 1024]
    species, coords, cell = make_water_box(10002)
    sp = jnp.asarray(species)
    model = tt.models.ANI2x(pretrained=False)
    md = MolecularDynamics(model, sp, cell=jnp.asarray(cell), pbc=True)
    base_model = md.model
    state = md.init(jnp.asarray(coords))
    elem = md.elem_idxs
    c0 = state.coords

    def refresh_and_narrow(c):
        return narrow_to_cutoff(_refresh_neighbors(state, c), md.cutoff)

    def batched(nb):
        return jax.tree.map(
            lambda x: x[None] if getattr(x, "ndim", 0) > 0 else x, nb
        )

    for blk in blocks:
        nnp = base_model.potentials["nnp"]
        aevc = nnp.aev_computer.replace(atom_block=blk)
        pots = dict(base_model.potentials)
        pots["nnp"] = nnp.replace(aev_computer=aevc)
        model = base_model.replace(potentials=pots)

        def full_fn(c, model=model):
            nb = batched(refresh_and_narrow(c))
            return jnp.sum(
                model.compute_from_neighbors(elem, c[None], nb).energies
            )

        t = timeit(jax.grad(full_fn), c0)
        print(f"atom_block={blk:5d}  full e+f {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
