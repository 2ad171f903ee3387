"""Sweep angular atom_block for the MD cached-table force eval (r5).

The ef profile shows the angular block-loop BACKWARD at ~3x its forward
(replay 1x + transpose 1x expected = 2x; the extra ~0.55 ms is per-block
carry/copy overhead).  The small count-split class runs 34 blocks of 256
rows — fewer, larger blocks may amortize the copies.  r2's sweep (256
best) predates the count-split and the reps=50 measurement floor.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/block_sweep_r5.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit(fn, x, reps=250):
    def body(i, acc):
        return acc + jnp.sum(fn(x + i * 1e-7))

    scanned = jax.jit(lambda x0: jax.lax.fori_loop(0, reps, body, 0.0))
    for attempt in range(4):
        try:
            _ = float(scanned(x))
            break
        except Exception:
            if attempt == 3:
                raise
            time.sleep(10)
    t0 = time.perf_counter()
    _ = float(scanned(x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import torchani_tpu as tt
    from torchani_tpu.md import MolecularDynamics, _refresh_neighbors
    from torchani_tpu.neighbors import narrow_to_cutoff
    from torchani_tpu.testing import make_water_box

    species, coords, cell = make_water_box(10002)
    model = tt.models.ANI2x(pretrained=False)
    md = MolecularDynamics(
        model, jnp.asarray(species), cell=jnp.asarray(cell), pbc=True
    )
    state = md.init(jnp.asarray(coords))
    model = md.model
    elem = md.elem_idxs
    c0 = state.coords
    aevc0 = model.potentials["nnp"].aev_computer

    def refresh_and_narrow(c):
        return narrow_to_cutoff(_refresh_neighbors(state, c), md.cutoff)

    def batched(nb):
        return jax.tree.map(
            lambda x: x[None] if getattr(x, "ndim", 0) > 0 else x, nb
        )

    nb0 = jax.jit(refresh_and_narrow)(c0)

    for blk in (None, 384, 512, 768, 1344):
        aevc = aevc0.replace(atom_block=blk)

        def aev_tbl(diff):
            d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
            nb = nb0.replace(
                dist=jnp.where(nb0.mask, d, 1.0),
                diff=jnp.where(nb0.mask[..., None], diff, 0.0),
            )
            return aevc.compute_from_neighbors(elem, c0[None], batched(nb))

        fb = timeit(jax.grad(lambda d: jnp.sum(aev_tbl(d) ** 2)), nb0.diff)
        print(f"atom_block={blk}:  aev_tbl f+b {fb:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
