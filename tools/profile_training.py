"""Profile one force-training step on TPU and aggregate op durations.

Same trace-aggregation approach as tools/profile_aev.py, applied to the
training step (batch 2560 x 26-atom synthetic molecules): captures a
jax.profiler trace of N scanned optimizer steps and reports device-op time
by fusion name, to attribute where a training step goes.

    python tools/profile_training.py [--energy-only] [--batch-size N]
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
import numpy as np


def main():
    import optax

    from torchani_tpu import simple_ani
    from torchani_tpu.testing import make_molecs
    from torchani_tpu.training import make_train_step

    energy_only = "--energy-only" in sys.argv
    batch_size = int(
        next(
            (a.split("=")[1] for a in sys.argv if a.startswith("--batch-size=")),
            2560,
        )
    )
    model = simple_ani(
        ("H", "C", "N", "O"),
        ensemble_size=1,
        repulsion=False,
        cutoff_fn="cosine",
        radial_start=0.9,
        radial_cutoff=5.2,
        angular_start=0.9,
        activation="celu",
        bias=True,
    )
    model = model.replace(
        energy_shifter=model.energy_shifter.replace(enabled=False)
    )
    cap = next(
        (a.split("=")[1] for a in sys.argv if a.startswith("--angular-capacity=")),
        None,
    )
    if cap is not None:
        from torchani_tpu.training.loop import _model_with_angular_capacity

        model = _model_with_angular_capacity(model, int(cap))
    species, coords = make_molecs(batch_size, 26, seed=0)
    batch = {
        "species": jnp.asarray(species),
        "coordinates": jnp.asarray(coords),
        "energies": jnp.asarray(
            np.random.RandomState(1).randn(batch_size).astype(np.float32)
        ),
        "forces": jnp.zeros_like(jnp.asarray(coords)),
    }
    if "--partition" in sys.argv:
        from torchani_tpu.training import tune_species_partition

        model = tune_species_partition(model, [batch])
        print(
            "caps:",
            model.potentials["nnp"].neural_networks.partition,
            flush=True,
        )
    init_fn, step_fn = make_train_step(
        model, optax.adamw(1e-3), force_training=not energy_only
    )
    state = init_fn()
    reps = 3

    # batch rides as a jit ARGUMENT (traced species), matching real epochs
    # and tools/training_benchmark.py — closing over it would let
    # trace-time constant folding specialize paths no real run gets
    @jax.jit
    def chunk(state, batch):
        def body(st, _):
            st, metrics = step_fn(st, batch)
            return st, metrics["loss"]

        return jax.lax.scan(body, state, None, length=reps)

    print("compiling...", flush=True)
    st2, losses = chunk(state, batch)
    _ = float(losses[-1])
    print("compiled; tracing...", flush=True)

    mode = "e" if energy_only else "ef"
    logdir = f"/tmp/trainprof_{mode}"
    with jax.profiler.trace(logdir):
        st2, losses = chunk(state, batch)
        _ = float(losses[-1])

    print("parsing trace...", flush=True)
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("NO TRACE FILES under", logdir)
        return
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
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:45]
    for name, dur in rows:
        print(f"{dur/reps:9.3f} ms/step  x{count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
