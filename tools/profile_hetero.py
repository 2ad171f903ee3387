"""Profile one heterogeneous-MD step (NNP + repulsion + D3) on TPU.

Same trace-aggregation approach as profile_training.py, applied to the MD
driver step on the solvated-1hz5 system — attributes where the
dispersion-enabled step goes (268 ms/step vs 45 without dispersion).

  python tools/profile_hetero.py [--box 55.0] [--no-dispersion]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PDB_DIR = "/root/reference/dataset/pdb"


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    import torchani_tpu as tt
    from torchani_tpu.md import MolecularDynamics
    from torchani_tpu.testing import make_solvated_system

    box = float(
        next((a.split("=")[1] for a in sys.argv if a.startswith("--box=")), 55.0)
    )
    z, coords, cell = make_solvated_system(
        f"{PDB_DIR}/1hz5.pdb", f"{PDB_DIR}/water-0.8nm.pdb", box=box
    )
    print(f"{len(z)} atoms", flush=True)
    model = tt.simple_ani(
        ("H", "C", "N", "O", "S", "F", "Cl"),
        "wb97x-631gd",
        ensemble_size=1,
        repulsion=True,
        dispersion="--no-dispersion" not in sys.argv,
    )
    md = MolecularDynamics(model, z[None], cell=cell, pbc=True)
    state = md.init(coords[None], temperature=300.0)
    reps = 3
    state = md.run_nve(state, reps)
    _ = float(state.energy)
    print("compiled; tracing...", flush=True)
    logdir = "/tmp/heteroprof"
    with jax.profiler.trace(logdir):
        state = md.run_nve(state, reps)
        _ = float(state.energy)
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
        print(f"{dur/reps:9.3f} ms/step  x{count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
