"""Multi-chip MD scaling analysis on the virtual CPU mesh.

Wall time on a virtual (host-simulated) mesh is meaningless, but two things
are not: the PER-DEVICE compiled cost (XLA ``cost_analysis`` FLOPs/bytes of
the SPMD module — each virtual device runs exactly the program a real chip
would) and the collective pattern (the psum/all-reduce ops XLA inserted for
the ``shard_map`` energy sum and its force transpose).  This tool compiles
the `ShardedMolecularDynamics` NVE step at bench-scale atom counts on 1
and 8 virtual devices and reports:

- per-device FLOPs and the 1-vs-8 ratio (the compute-scaling measurement),
- the sharded-fraction implied by that ratio (Amdahl decomposition: the
  refresh/integrator/pair terms run replicated, AEV+NN shard over atom
  rows),
- a census of collective ops with operand shapes (the ICI traffic per
  step),
- the replicated-work ceiling: projected step time vs chips using the
  measured single-chip stage split (docs/performance.md).

    python tools/multichip_scaling.py [--atoms 10002 30000]

Reference analog: none — the reference's distributed story is delegation to
LAMMPS (``/root/reference/torchani/ase.py:50-53``); this build owns the
decomposition (SURVEY §2.3 item 5).
"""

import argparse
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np  # noqa: E402

COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)


def census(hlo: str) -> dict:
    out = {}
    for op in COLLECTIVES:
        shapes = re.findall(rf"(\S+) {re.escape(op)}\(", hlo)
        # lines look like: %all-reduce.1 = f32[...] all-reduce(...)
        shapes = re.findall(rf"= (\S+?) {re.escape(op)}", hlo)
        if shapes:
            out[op] = shapes
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--atoms", type=int, nargs="+", default=[10002])
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from torchani_tpu.models import ANI2x
    from torchani_tpu.parallel import ShardedMolecularDynamics
    from torchani_tpu.testing import make_water_box

    model = ANI2x(pretrained=False)
    devices = jax.devices()
    assert len(devices) >= 8, "needs 8 virtual devices"

    for atoms in args.atoms:
        species, coords, cell = make_water_box(atoms)
        rows = {}
        for d in (1, 8):
            mesh = Mesh(np.array(devices[:d]), ("atoms",))
            md = ShardedMolecularDynamics(
                model,
                jnp.asarray(species),
                mesh,
                cell=jnp.asarray(cell),
                pbc=True,
            )
            state = md.init(jnp.asarray(coords))
            step = jax.jit(md.step_nve)
            compiled = step.lower(state).compile()
            ca = compiled.cost_analysis() or {}
            flops = float(ca.get("flops", float("nan")))
            hlo = compiled.as_text()
            rows[d] = {
                "flops_per_device": flops,
                "rows_per_device": -(-state.nbr_idx.shape[0] // d),
                "collectives": census(hlo),
            }
            print(
                f"atoms={atoms} devices={d}: "
                f"per-device GFLOP/step={flops / 1e9:.3f}, "
                f"atom rows/device={rows[d]['rows_per_device']}",
                flush=True,
            )
            for op, shapes in rows[d]["collectives"].items():
                from collections import Counter

                print(f"    {op}: {dict(Counter(shapes))}", flush=True)
        r = rows[1]["flops_per_device"] / rows[8]["flops_per_device"]
        # Amdahl: flops(d) = repl + shard/d  ->  sharded fraction s solves
        # 1/r = (1 - s) + s/8
        s = (1.0 - 1.0 / r) / (1.0 - 1.0 / 8.0)
        print(
            f"atoms={atoms}: FLOP scaling 1->8 devices = {r:.2f}x; "
            f"sharded FLOP fraction = {100 * s:.1f}% "
            f"(replicated {100 * (1 - s):.1f}%)",
            flush=True,
        )
        # projected step time on real chips from the measured v5e stage
        # split.  r5 re-measured every stage at reps=250 (the r1-r4
        # numbers carried a +0.6 ms fetch-RTT floor each — CLAUDE.md) and
        # DOMAIN-DECOMPOSED the refresh (parallel/md.py ExchangeTables:
        # bucket-shard select kernels + one all_to_all slot->row
        # redistribution), so the refresh now scales too:
        #   sharded: AEV 3.43 + NN 3.15 + refresh 3.02 (of which ~0.2 ms
        #            of all_to_all + halo comms stay per-chip: 12.5 MB of
        #            slot rows split D ways, both AD directions, ICI)
        #   replicated: integrator+Verlet check ~0.15, cell-list rebuild
        #            15.1 ms amortized over the ~21-step window (~0.7;
        #            a multi-chip skin retune that stretches the window
        #            to ~34 steps cuts it to ~0.45 at +8% refresh work)
        # — scaled linearly in atoms from the 10k box.
        # Rebuild amortization is MEASURED, not assumed: the r5 bench's
        # 250-step NVE windows recorded ONE rebuild per ~500 steps at the
        # 300 K-initialized water box (BENCH_r05 rebuilds_in_window) —
        # bound water oscillates rather than diffusing ballistically, so
        # the top-2 skin criterion trips far less often than the early
        # equilibration cadence r1-r4 quoted.  Project both that and a
        # conservative fully-thermalized 1-per-50-steps cadence.
        scale = atoms / 10002.0
        shard = (3.43 + 3.15 + 3.02 - 0.2) * scale
        comm = 0.2 * scale  # per-chip all_to_all payload ~1/D of 12.5 MB
        for note, rebuild in (
            ("bench cadence ~1/500", 0.06),
            ("thermalized ~1/50", 0.3),
        ):
            repl = (0.15 + rebuild) * scale
            proj = {
                d: repl + comm + shard / d for d in (1, 2, 4, 8, 16)
            }
            t1 = repl + shard  # single chip pays no comm
            print(
                f"atoms={atoms} [{note}]: projected v5e step ms vs chips "
                + ", ".join(f"{d}: {t:.2f}" for d, t in proj.items())
                + f"  (8-chip speedup {t1 / proj[8]:.1f}x, ceiling "
                f"{t1 / (repl + comm):.1f}x — replicated rebuild bound; "
                "see docs/performance.md)",
                flush=True,
            )


if __name__ == "__main__":
    main()
