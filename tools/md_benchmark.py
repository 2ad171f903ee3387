"""MD benchmark: per-module wall times for an MD run.

Counterpart of reference ``tools/md-benchmark.py`` (ASE VelocityVerlet with
per-module timers): times neighbor build, AEV, NN and the full fused step on
a water box (or an xyz file), using the synced Timer harness.

  python tools/md_benchmark.py [--atoms 10002] [--xyz file.xyz] [--steps 20]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--atoms", type=int, default=10002)
    parser.add_argument("--xyz", default=None)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--model", default="ani2x")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from torchani_tpu.md import MolecularDynamics
    from torchani_tpu.models import ANI2x
    from torchani_tpu.neighbors import CellList, cell_list
    from torchani_tpu.profiling import Timer
    from torchani_tpu.testing import make_water_box

    if args.xyz:
        from torchani_tpu.io import read_xyz

        species, coords, cell, _ = read_xyz(args.xyz)
    else:
        species, coords, cell = make_water_box(args.atoms)
    num_atoms = int((species[0] >= 0).sum())
    print(f"system: {num_atoms} atoms, periodic={cell is not None}")

    model = ANI2x(pretrained=False).replace(neighborlist=CellList(capacity=96))
    elem = model.species_converter(jnp.asarray(species))
    cellj = None if cell is None else jnp.asarray(cell)
    pbcj = None if cell is None else jnp.asarray([True, True, True])
    coordsj = jnp.asarray(coords)

    timer = Timer()
    nl = jax.jit(
        lambda c: jnp.sum(
            cell_list(model.cutoff, elem, c, cellj, pbcj, capacity=96).dist
        )
    )
    timer.time_fn("neighborlist (cell list)", lambda c: float(nl(c)), coordsj)

    nbrs = cell_list(model.cutoff, elem, coordsj, cellj, pbcj, capacity=96)
    aev = jax.jit(
        lambda nb: jnp.sum(model.aev_computer.compute_from_neighbors(elem, None, nb))
    )
    timer.time_fn("aev forward", lambda nb: float(aev(nb)), nbrs)

    from torchani_tpu.grad import energies_and_forces

    sp = jnp.asarray(species)
    step = jax.jit(
        lambda c: energies_and_forces(model, sp, c, cellj, pbcj)[1].sum()
    )
    timer.time_fn("energy+forces step", lambda c: float(step(c)), coordsj)

    # full MD throughput (scan-driven, Verlet cache)
    md = MolecularDynamics(model, species[:1], cell=cell, pbc=cell is not None)
    state = md.init(coords[0] if coords.ndim == 3 else coords, temperature=300.0)
    import time as _time

    _ = float(md.run_nve(state, args.steps).energy)  # compile (same length)
    t0 = _time.perf_counter()
    state = md.run_nve(state, args.steps)
    _ = float(state.energy)
    dt = (_time.perf_counter() - t0) / args.steps
    print(timer.report())
    print(
        f"MD (scan, Verlet): {dt * 1e3:.2f} ms/step = "
        f"{86400.0 / dt * 1e-6:.3f} ns/day @1fs; rebuilds={int(state.rebuilds)}"
    )


if __name__ == "__main__":
    main()
