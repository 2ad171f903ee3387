"""Headline benchmark: ANI-2x energy+forces on a 10k-atom periodic water box.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: microseconds per atom per MD-relevant evaluation (energies + forces,
cell-list neighbors, full 8-member ANI-2x ensemble, PBC), the quantity behind
the BASELINE.json north star ("ANI-2x MD on a 10k-atom periodic water box on
one v5e at >= cuAEV-on-A100 ns/day").

Baseline assumption (documented, refined as better data appears): cuAEV on
A100 runs ANI-2x MD on ~10k atoms at roughly 1.0 ns/day with a 1 fs timestep
= 11.57 ms/step = 1.157 us/atom/step.  vs_baseline > 1 means faster than
that estimate.
"""

import json
import time

import numpy as np

BASELINE_US_PER_ATOM = 1.157  # cuAEV-on-A100 estimate, see module docstring


def main() -> None:
    import jax
    import jax.numpy as jnp

    from torchani_tpu.grad import energies_and_forces
    from torchani_tpu.models import ANI2x
    from torchani_tpu.neighbors import CellList
    from torchani_tpu.testing import make_water_box

    target_atoms = 10002
    species_np, coords_np, cell_np = make_water_box(target_atoms)
    num_atoms = species_np.shape[1]

    model = ANI2x(pretrained=False)
    model = model.replace(neighborlist=CellList(capacity=96))

    species = jnp.asarray(species_np)
    coords = jnp.asarray(coords_np)
    cell = jnp.asarray(cell_np)
    pbc = jnp.asarray([True, True, True])

    @jax.jit
    def step(coords):
        e, f = energies_and_forces(model, species, coords, cell, pbc)
        # reduce to a scalar so the timing fetch transfers O(1) bytes but
        # still forces completion of the whole step (block_until_ready on
        # the tunneled device can return before execution finishes)
        return jnp.sum(e) + jnp.sum(f)

    # warmup / compile
    _ = float(step(coords))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        _ = float(step(coords))
    dt = (time.perf_counter() - t0) / iters

    us_per_atom = dt * 1e6 / num_atoms
    ns_per_day = (86400.0 / dt) * 1e-6  # 1 fs timestep
    print(
        json.dumps(
            {
                "metric": "ani2x_water10k_energy_forces_us_per_atom",
                "value": round(us_per_atom, 4),
                "unit": "us/atom/step",
                "vs_baseline": round(BASELINE_US_PER_ATOM / us_per_atom, 3),
                "extra": {
                    "atoms": int(num_atoms),
                    "ms_per_step": round(dt * 1e3, 3),
                    "ns_per_day_1fs": round(ns_per_day, 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
