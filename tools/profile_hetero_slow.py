"""Profile the config-5 MTS SLOW lane (D3 dispersion, 8 A) on TPU.

tools/ablate_hetero.py (r5) measured the slow-lane force eval at 38.9 ms
f+b of which only 10.0 is the full-width refresh — the D3 math plus its
backward claims ~29 ms, far above any roofline for ~3.4M pair lanes of
damped r^-6/r^-8 FMAs.  This captures a jax.profiler trace of the slow
eval and aggregates device ops; map names to sources with
tools/dump_hetero_slow_hlo.py-style as_text if needed.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/profile_hetero_slow.py
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

PDB_DIR = "/root/reference/dataset/pdb"


def main():
    import torchani_tpu as tt
    from torchani_tpu.md import MultipleTimestepMD
    from torchani_tpu.testing import make_solvated_system

    z, coords, cell = make_solvated_system(
        f"{PDB_DIR}/1hz5.pdb", f"{PDB_DIR}/water-0.8nm.pdb", box=55.0,
        clash=2.2,
    )
    model = tt.simple_ani(
        ("H", "C", "N", "O", "S", "F", "Cl"),
        "wb97x-631gd",
        ensemble_size=8,
        repulsion=True,
        dispersion=True,
    )
    eq = MultipleTimestepMD(
        model, z[None], cell=cell, pbc=True, every=4, timestep_fs=0.25
    )
    st = eq.init(coords[None], temperature=300.0)
    st = eq.run(st, 400, ensemble="langevin", temperature=300.0,
                friction_per_fs=0.1)
    coords_eq = np.asarray(st.coords)
    print("equilibrated; building driver", flush=True)
    mts = MultipleTimestepMD(model, z[None], cell=cell, pbc=True, every=4)
    state = mts.init(jnp.asarray(coords_eq))
    slow_st = state.slow
    c0 = state.fast.coords

    def slow_ef(c):
        e, f = mts.slow._energy_and_forces(slow_st, c)
        return e + jnp.sum(f)

    reps = 30
    scanned = jax.jit(
        lambda x0: jax.lax.fori_loop(
            0, reps, lambda i, acc: acc + slow_ef(x0 + i * 1e-7), 0.0
        )
    )
    _ = float(scanned(c0))
    print("compiled; tracing...", flush=True)
    logdir = "/tmp/heteroslowprof"
    with jax.profiler.trace(logdir):
        _ = float(scanned(c0))
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    path = max(paths)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    by_name = defaultdict(float)
    count = defaultdict(int)
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        by_name[e.get("name", "")] += e.get("dur", 0) / 1e3
        count[e.get("name", "")] += 1
    print(f"trace: {path}")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/reps:9.3f} ms/rep  x{count[name]:<6d} {name[:110]}")

    # dump HLO for source mapping
    text = scanned.lower(c0).compile().as_text()
    out = Path("/tmp/hetero_slow_hlo.txt")
    out.write_text(text)
    print("wrote", out, len(text), "chars", flush=True)


if __name__ == "__main__":
    main()
