"""Per-class angular block sweep: dense class single-block, small varied.

Follow-up to block_sweep_r5.py (atom_block=1344 — dense class as ONE
block — measured best).  Here the dense class stays single-block and the
small class's block size sweeps independently via a keyed _atom_block
patch (the real knob would be a per-class policy in AEVComputer).

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/block_sweep_r5b.py
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
    from torchani_tpu.aev.computer import AEVComputer
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
    aevc = model.potentials["nnp"].aev_computer
    split = aevc.angular_split
    print(f"split={split}", flush=True)
    k_small, n_dense = int(split[0]), int(split[1])

    def refresh_and_narrow(c):
        return narrow_to_cutoff(_refresh_neighbors(state, c), md.cutoff)

    def batched(nb):
        return jax.tree.map(
            lambda x: x[None] if getattr(x, "ndim", 0) > 0 else x, nb
        )

    nb0 = jax.jit(refresh_and_narrow)(c0)
    orig = AEVComputer._atom_block

    def aev_tbl(diff):
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        nb = nb0.replace(
            dist=jnp.where(nb0.mask, d, 1.0),
            diff=jnp.where(nb0.mask[..., None], diff, 0.0),
        )
        return aevc.compute_from_neighbors(elem, c0[None], batched(nb))

    grad_fn = jax.grad(lambda d: jnp.sum(aev_tbl(d) ** 2))
    try:
        for small_blk in (256, 1472, 2176, 2944, 4352, 8704):
            AEVComputer._atom_block = (
                lambda self, ka, _s=small_blk, _kd=k_small, _nd=n_dense:
                (_s if ka <= _kd else _nd)
            )
            fb = timeit(grad_fn, nb0.diff)
            print(
                f"dense_blk={n_dense} small_blk={small_blk}: "
                f"aev_tbl f+b {fb:6.2f} ms",
                flush=True,
            )
    finally:
        AEVComputer._atom_block = orig


if __name__ == "__main__":
    main()
