"""Heterogeneous-system MD throughput: ANI-2xr/2dr-class model (NNP +
xTB repulsion +- D3 dispersion) on a solvated protein (BASELINE config 5).

Counterpart of the reference's ``tools/scaling-md-benchmark.py:37-38``
driving ANI-2xr/2dr (``/root/reference/torchani/models.py:255-340``) on
solvated PDB systems.  Builds 1hz5 (HCNOS protein, 973 atoms) solvated in
tiled water to ~10k atoms, runs the jitted MD driver (Verlet-cached
neighbors), and reports ms/step and ns/day at 1 fs.

  python tools/hetero_md_benchmark.py [--box 45.0] [--steps 50]
                                      [--no-dispersion] [--ensemble 8]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

PDB_DIR = "/root/reference/dataset/pdb"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--box", type=float, default=55.0)  # ~9.8k atoms
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--ensemble", type=int, default=8)
    parser.add_argument("--no-dispersion", action="store_true")
    parser.add_argument(
        "--mts", type=int, default=0,
        help="RESPA multiple-timestep: evaluate the dispersion lane every "
        "N inner steps (0 = monolithic driver)",
    )
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import torchani_tpu as tt
    from torchani_tpu.md import MolecularDynamics
    from torchani_tpu.testing import make_solvated_system

    z, coords, cell = make_solvated_system(
        f"{PDB_DIR}/1hz5.pdb", f"{PDB_DIR}/water-0.8nm.pdb", box=args.box
    )
    print(
        f"solvated 1hz5: {len(z)} atoms, elements {sorted(set(z))}, "
        f"box {args.box} A",
        flush=True,
    )

    model = tt.simple_ani(
        ("H", "C", "N", "O", "S", "F", "Cl"),
        "wb97x-631gd",
        ensemble_size=args.ensemble,
        repulsion=True,
        dispersion=not args.no_dispersion,
    )

    if args.mts:
        args.steps -= args.steps % args.mts or 0  # scan needs a multiple
        from torchani_tpu.md import MultipleTimestepMD

        md = MultipleTimestepMD(
            model, z[None], cell=cell, pbc=True, every=args.mts
        )
        run = lambda st, n: md.run(st, n)  # noqa: E731
    else:
        md = MolecularDynamics(model, z[None], cell=cell, pbc=True)
        run = lambda st, n: md.run_nve(st, n)  # noqa: E731
    import jax.numpy as jnp
    from torchani_tpu.md import ACCEL_UNIT

    def total_e(st):
        ke = 0.5 * float(
            jnp.sum(md.masses[:, None] * st.velocities**2)
        ) / ACCEL_UNIT
        return float(st.energy) + ke

    state = md.init(coords[None], temperature=300.0)
    # warm up with the SAME step count (scan length is part of the program)
    state = run(state, args.steps)
    e0 = total_e(state)
    t0 = time.perf_counter()
    state = run(state, args.steps)
    e1 = total_e(state)
    dt = (time.perf_counter() - t0) / args.steps
    assert np.isfinite(e1), "non-finite energy"
    print(
        f"NVE conserved-energy drift over {args.steps} steps: "
        f"{abs(e1 - e0):.6f} Ha ({abs(e1 - e0) / len(z) * 1e6:.3f} uHa/atom)",
        flush=True,
    )
    print(
        f"hetero MD (repulsion={True}, dispersion={not args.no_dispersion}, "
        f"ensemble {args.ensemble}, mts={args.mts}): {dt * 1e3:.2f} ms/step "
        f"= {86400.0 / dt * 1e-6:.3f} ns/day @1fs; "
        f"E {e0:.4f} -> {e1:.4f} Ha; rebuilds={int(state.rebuilds)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
