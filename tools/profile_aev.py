"""Profile the table-path AEV fwd+bwd on TPU and aggregate op durations.

The ablation (tools/ablate_md.py) shows `aev_tbl f+b` at ~38 ms while its
measured components sum to ~15 ms.  This captures a jax.profiler trace of
the scanned loop and aggregates device-op durations by fusion name so the
missing time can be attributed.

    python tools/profile_aev.py [mode]   # mode: tbl (default) | full | fwd
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
    from torchani_tpu.md import MolecularDynamics, _refresh_neighbors
    from torchani_tpu.neighbors import narrow_to_cutoff
    from torchani_tpu.testing import make_water_box

    mode = sys.argv[1] if len(sys.argv) > 1 else "tbl"
    species, coords, cell = make_water_box(10002)
    sp = jnp.asarray(species)
    model = tt.models.ANI2x(pretrained=False)
    md = MolecularDynamics(model, sp, cell=jnp.asarray(cell), pbc=True)
    model = md.model
    state = md.init(jnp.asarray(coords))
    elem = md.elem_idxs
    c0 = state.coords
    aevc = model.potentials["nnp"].aev_computer

    def refresh_and_narrow(c):
        return narrow_to_cutoff(_refresh_neighbors(state, c), md.cutoff)

    def batched(nb):
        return jax.tree.map(
            lambda x: x[None] if getattr(x, "ndim", 0) > 0 else x, nb
        )

    nb0 = jax.jit(refresh_and_narrow)(c0)

    def aev_tbl(diff):
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        nb = nb0.replace(
            dist=jnp.where(nb0.mask, d, 1.0),
            diff=jnp.where(nb0.mask[..., None], diff, 0.0),
        )
        return aevc.compute_from_neighbors(elem, c0[None], batched(nb))

    def aev_full(c):
        return aevc.compute_from_neighbors(
            elem, c[None], batched(refresh_and_narrow(c))
        )

    if mode == "tbl":
        fn = jax.grad(lambda d: jnp.sum(aev_tbl(d) ** 2))
        x = nb0.diff
    elif mode == "fwd":
        fn = lambda d: jnp.sum(aev_tbl(d))  # noqa: E731
        x = nb0.diff
    elif mode == "ef":
        # the MD driver's whole cached-topology force eval (refresh + AEV +
        # NN, fwd+bwd) — what md_ms_per_step is made of between rebuilds
        fn = lambda c: sum(  # noqa: E731
            jnp.sum(o) for o in md._energy_and_forces(state, c)
        )
        x = c0
    else:
        fn = jax.grad(lambda c: jnp.sum(aev_full(c) ** 2))
        x = c0

    reps = 30
    scanned = jax.jit(
        lambda x0: jax.lax.fori_loop(
            0, reps, lambda i, acc: acc + jnp.sum(fn(x0 + i * 1e-7)), 0.0
        )
    )
    _ = float(scanned(x))  # compile + warm

    logdir = f"/tmp/aevprof_{mode}"
    with jax.profiler.trace(logdir):
        _ = float(scanned(x))

    # aggregate the perfetto trace
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("NO TRACE FILES under", logdir)
        return
    path = max(paths)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # keep only device-track complete events
    by_name = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        args = e.get("args") or {}
        lane = str(args.get("group_id", "")) + str(e.get("tid", ""))
        if "run_id" in args or "device" in str(args.get("l", "")).lower():
            pass
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[name] += dur
        count[name] += 1
        total += dur
    print(f"trace: {path}  events={len(events)}")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:45]
    for name, dur in rows:
        print(f"{dur/reps:9.3f} ms/rep  x{count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
