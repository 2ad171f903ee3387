"""Sweep angular capacity / radial repack for the 10k-atom force eval."""

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
    from torchani_tpu.neighbors import narrow_to_cutoff, repack_to_capacity
    from torchani_tpu.testing import make_water_box

    species, coords, cell = make_water_box(10002)
    sp = jnp.asarray(species)
    model = tt.models.ANI2x(pretrained=False)
    md = MolecularDynamics(model, sp, cell=jnp.asarray(cell), pbc=True)
    state = md.init(jnp.asarray(coords))
    elem = md.elem_idxs
    c0 = state.coords

    def run(ka, radial_cap):
        m = model
        nnp = m.potentials["nnp"]
        aevc = nnp.aev_computer.replace(angular_capacity=ka)
        m = m.replace(potentials={**m.potentials,
                                  "nnp": nnp.replace(aev_computer=aevc)})

        def full_fn(c):
            nb = narrow_to_cutoff(_refresh_neighbors(state, c), md.cutoff)
            if radial_cap is not None:
                nb = repack_to_capacity(nb, radial_cap)
            nb = jax.tree.map(
                lambda x: x[None] if getattr(x, "ndim", 0) > 0 else x, nb
            )
            return jnp.sum(m.compute_from_neighbors(elem, c[None], nb).energies)

        # overflow check at this capacity
        nb = narrow_to_cutoff(_refresh_neighbors(state, c0), md.cutoff)
        from torchani_tpu.neighbors import repack_to_capacity as rp
        ang = narrow_to_cutoff(nb, 3.5)
        real_max = int(jnp.max(jnp.sum(ang.mask, axis=-1)))
        ms = timeit(jax.grad(full_fn), c0)
        print(f"Ka={ka} radial_cap={radial_cap}: {ms:7.2f} ms "
              f"(max real angular nbrs {real_max})", flush=True)

    run(None, None)   # default heuristic (32)
    run(28, None)
    run(24, None)
    run(None, 96)     # repack radial table 136 -> 96
    run(24, 96)


if __name__ == "__main__":
    main()
