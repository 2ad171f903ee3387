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
    parser.add_argument(
        "--no-d3-cache", action="store_true",
        help="disable the (exact) per-window caching of the D3 "
        "constant pair channels (md.MultipleTimestepMD "
        "cache_slow_constants)",
    )
    parser.add_argument(
        "--slow-skin", type=float, default=None,
        help="Verlet skin of the MTS slow (dispersion) lane; wider "
        "stretches the 8 A table's rebuild cadence (r5 lever)",
    )
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--equil", type=int, default=800)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # ride out transient tunnel outages (same pattern as bench.py)
        t0 = time.perf_counter()
        while True:
            try:
                jax.devices()
                break
            except RuntimeError as e:
                if time.perf_counter() - t0 > 1800.0:
                    raise
                print(f"# backend unavailable, retrying: {e}", flush=True)
                time.sleep(30.0)

    import torchani_tpu as tt
    from torchani_tpu.md import MolecularDynamics
    from torchani_tpu.testing import make_solvated_system

    # clash=2.2 A: the 1.7 A default leaves waters inside the xTB
    # repulsion wall (fractions of a Ha per contact) — explosive initial
    # forces that make any 100-step segment a coin flip (it heats until a
    # capacity overflow NaN-poisons, flipping on FP-level code changes)
    z, coords, cell = make_solvated_system(
        f"{PDB_DIR}/1hz5.pdb", f"{PDB_DIR}/water-0.8nm.pdb", box=args.box,
        clash=2.2,
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

    # Measurement protocol (r4): EQUILIBRATE, RE-MEASURE, then time.
    # The solvated start has contact-relaxation dynamics (even at
    # clash=2.2 the random-weight potential relaxes for ~100+ steps):
    # timing that window measures a rebuild storm whose severity flips
    # chaotically with FP-level code changes — the r3-era numbers timed
    # a lucky pre-storm window.  So: (1) relax under a strong Langevin
    # thermostat (not timed), (2) build a FRESH driver at the
    # equilibrated configuration so every measured capacity (neighbor
    # lanes, buckets, count-split classes) reflects the steady state,
    # (3) time thermostatted steps at the production cadence.  --nve
    # times NVE instead (the MTS NVE gate lives in tools/tpu_smoke.py).
    import jax.numpy as jnp
    from torchani_tpu.md import ACCEL_UNIT

    nve = "--nve" in sys.argv
    equil_steps = args.equil  # x 0.25 fs of damped contact relaxation

    def make_md(timestep=1.0):
        if args.mts:
            from torchani_tpu.md import MultipleTimestepMD

            md = MultipleTimestepMD(
                model, z[None], cell=cell, pbc=True, every=args.mts,
                timestep_fs=timestep, slow_skin=args.slow_skin,
                cache_slow_constants=not args.no_d3_cache,
            )
            run = lambda st, n, **kw: md.run(  # noqa: E731
                st, n, ensemble="langevin", temperature=300.0, **kw
            )
            run_nve = lambda st, n: md.run(st, n)  # noqa: E731
        else:
            md = MolecularDynamics(
                model, z[None], cell=cell, pbc=True, timestep_fs=timestep,
                freeze_pair_window=(
                    () if (args.no_d3_cache or args.no_dispersion)
                    else ("dispersion_d3",)
                ),
            )
            run = lambda st, n, **kw: md.run_langevin(  # noqa: E731
                st, n, temperature=300.0, **kw
            )
            run_nve = md.run_nve
        return md, run, run_nve

    if args.mts:
        args.steps -= args.steps % args.mts or 0  # scan needs a multiple
        equil_steps -= equil_steps % args.mts

    # dt=0.25 for the (untimed) equilibration: the raw solvated contacts
    # are too stiff for 1 fs integration until they relax
    md, run, _ = make_md(timestep=0.25)
    state = md.init(coords[None], temperature=300.0)
    state = run(state, equil_steps, friction_per_fs=0.1)
    coords_eq = np.asarray(state.coords)
    vel_eq = jnp.asarray(np.asarray(state.velocities))
    assert np.isfinite(coords_eq).all(), "equilibration went non-finite"
    print(f"equilibrated {equil_steps} steps; re-measuring driver", flush=True)

    md, run, run_nve = make_md()
    state = md.init(coords_eq[None] if coords_eq.ndim == 2 else coords_eq)
    if args.mts:
        state = state.replace(fast=state.fast.replace(velocities=vel_eq))
    else:
        state = state.replace(velocities=vel_eq)
    timed = run_nve if nve else run

    def total_e(st):
        ke = 0.5 * float(
            jnp.sum(md.masses[:, None] * st.velocities**2)
        ) / ACCEL_UNIT
        return float(st.energy) + ke

    # warm up with the SAME step count (scan length is part of the program)
    state = timed(state, args.steps)
    e0 = total_e(state)
    t0 = time.perf_counter()
    state = timed(state, args.steps)
    e1 = total_e(state)
    dt = (time.perf_counter() - t0) / args.steps
    ovf = bool(state.overflow if not args.mts else state.overflow)
    print(
        f"diag: e0={e0} e1={e1} overflow={ovf} "
        f"rebuilds={int(state.rebuilds)}",
        flush=True,
    )
    assert np.isfinite(e1), "non-finite energy"
    if nve:
        print(
            f"NVE conserved-energy drift over {args.steps} steps: "
            f"{abs(e1 - e0):.6f} Ha ({abs(e1 - e0) / len(z) * 1e6:.3f} uHa/atom)",
            flush=True,
        )
    print(
        f"hetero MD (repulsion={True}, dispersion={not args.no_dispersion}, "
        f"ensemble {args.ensemble}, mts={args.mts}, "
        f"d3_cache={not args.no_d3_cache}): {dt * 1e3:.2f} ms/step "
        f"= {86400.0 / dt * 1e-6:.3f} ns/day @1fs; "
        f"E {e0:.4f} -> {e1:.4f} Ha; rebuilds={int(state.rebuilds)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
