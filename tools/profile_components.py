"""Per-component timing of the water-box benchmark on the current device.

Times: cell list | AEV-from-neighbors | NN-from-AEVs | full forward |
forward+backward.  Run on TPU (default) or CPU (--cpu).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    import jax

    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from torchani_tpu.grad import energies_and_forces
    from torchani_tpu.models import ANI2x
    from torchani_tpu.neighbors import CellList, cell_list
    from torchani_tpu.testing import make_water_box

    n_atoms = int(next((a.split("=")[1] for a in sys.argv if a.startswith("--atoms=")), 10002))
    species_np, coords_np, cell_np = make_water_box(n_atoms)
    model = ANI2x(pretrained=False).replace(neighborlist=CellList(capacity=96))
    species = jnp.asarray(species_np)
    coords = jnp.asarray(coords_np)
    cell = jnp.asarray(cell_np)
    pbc = jnp.asarray([True, True, True])
    elem = model.species_converter(species)

    nl = jax.jit(
        lambda c: cell_list(5.1, elem, c, cell, pbc, capacity=96)
    )
    t = timeit(nl, coords)
    print(f"cell_list:            {t*1e3:8.2f} ms")
    nbrs = nl(coords)
    print("  capacity", nbrs.capacity, "max count", int(nbrs.count().max()),
          "overflow", bool(nbrs.overflow))

    aevc = model.aev_computer
    aev_fn = jax.jit(lambda c, nb: aevc.compute_from_neighbors(elem, c, nb))
    t = timeit(aev_fn, coords, nbrs)
    print(f"AEV from neighbors:   {t*1e3:8.2f} ms")
    aevs = aev_fn(coords, nbrs)

    nn = model.neural_networks
    nn_fn = jax.jit(lambda a: nn(elem, a))
    t = timeit(nn_fn, aevs)
    print(f"NN from AEVs:         {t*1e3:8.2f} ms")

    fwd = jax.jit(lambda c: model(species, c, cell, pbc))
    t = timeit(fwd, coords)
    print(f"full forward:         {t*1e3:8.2f} ms")

    ef = jax.jit(lambda c: energies_and_forces(model, species, c, cell, pbc))
    t = timeit(ef, coords)
    print(f"forward+backward:     {t*1e3:8.2f} ms")

    # AEV backward alone
    aev_grad = jax.jit(
        lambda c, nb: jax.grad(
            lambda cc: jnp.sum(aevc.compute_from_neighbors(elem, cc, nb) ** 2)
        )(c)
    )
    t = timeit(aev_grad, coords, nbrs)
    print(f"AEV fwd+bwd:          {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
