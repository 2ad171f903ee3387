"""Profile the Verlet cache rebuild (cell list + lane sort + partner map).

Measured at ~104 ms on the 10k-atom box — ~4 ms/step amortized at the
bench's rebuild rate.  Aggregates device-op durations like profile_aev.py.

    python tools/profile_build.py
"""

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    import torchani_tpu as tt
    from torchani_tpu.md import MolecularDynamics
    from torchani_tpu.testing import make_water_box

    species, coords, cell = make_water_box(10002)
    model = tt.models.ANI2x(pretrained=False)
    md = MolecularDynamics(
        model, jnp.asarray(species), cell=jnp.asarray(cell), pbc=True
    )
    state = md.init(jnp.asarray(coords))
    c0 = state.coords

    def build_fn(c):
        idx, mask, shift, nbr_elem, rev, overflow, tables, _aux = md._build_cache(c)
        tot = shift.sum() + (idx + nbr_elem + rev).sum() + mask.sum()
        if tables is not None:
            tot = tot + sum(
                jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(tables)
            )
        return tot

    reps = 10
    scanned = jax.jit(
        lambda x0: jax.lax.fori_loop(
            0, reps, lambda i, acc: acc + build_fn(x0 + i * 1e-7), 0.0
        )
    )
    _ = float(scanned(c0))

    logdir = "/tmp/buildprof"
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
        print(f"{dur/reps:9.3f} ms/rep  x{count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
