"""Per-stage ablation of the config-5 heterogeneous MD step (r5, task 3).

Measures, at the EQUILIBRATED solvated-1hz5 configuration (the honest r4
protocol) with the production MTS split (every=4):

  fast eval f+b   — NNP + xTB repulsion on the 5.2 A lane (per inner step)
  slow refresh    — the 8 A full-width table refresh alone (f+b)
  slow eval f+b   — D3 dispersion on the 8 A lane (refresh + D3 math;
                    evaluated once per `every` inner steps)
  fast/slow rebuild — cell-list rebuilds of each lane (amortized)

All timings use the reps>=250 protocol (the fetch-RTT floor of reps=50
timings is ~0.6 ms/stage — CLAUDE.md).

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/ablate_hetero.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

PDB_DIR = "/root/reference/dataset/pdb"


def timeit(fn, x, extra=None, reps=250):
    """`extra` (a pytree, e.g. an MDState) rides as a RUNTIME argument:
    closing over a state whose pair_aux holds ~450 MB would bake it into
    the program as a constant and blow the remote-compile request limit
    (HTTP 413, observed r5)."""

    def prog(x0, e):
        def body(i, acc):
            xx = x0 + i * 1e-7
            return acc + jnp.sum(fn(e, xx) if e is not None else fn(xx))

        return jax.lax.fori_loop(0, reps, body, 0.0)

    scanned = jax.jit(prog)
    for attempt in range(4):
        try:
            _ = float(scanned(x, extra))
            break
        except Exception:
            if attempt == 3:
                raise
            time.sleep(10)
    t0 = time.perf_counter()
    _ = float(scanned(x, extra))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import torchani_tpu as tt
    from torchani_tpu.md import MultipleTimestepMD, _refresh_neighbors
    from torchani_tpu.testing import make_solvated_system

    z, coords, cell = make_solvated_system(
        f"{PDB_DIR}/1hz5.pdb", f"{PDB_DIR}/water-0.8nm.pdb", box=55.0,
        clash=2.2,
    )
    print(f"solvated 1hz5: {len(z)} atoms", flush=True)
    model = tt.simple_ani(
        ("H", "C", "N", "O", "S", "F", "Cl"),
        "wb97x-631gd",
        ensemble_size=8,
        repulsion=True,
        dispersion=True,
    )

    # equilibrate (untimed) exactly like tools/hetero_md_benchmark.py
    eq = MultipleTimestepMD(
        model, z[None], cell=cell, pbc=True, every=4, timestep_fs=0.25
    )
    st = eq.init(coords[None], temperature=300.0)
    st = eq.run(st, 800, ensemble="langevin", temperature=300.0,
                friction_per_fs=0.1)
    coords_eq = np.asarray(st.coords)
    assert np.isfinite(coords_eq).all()
    print("equilibrated; building fresh driver", flush=True)

    mts = MultipleTimestepMD(model, z[None], cell=cell, pbc=True, every=4)
    state = mts.init(jnp.asarray(coords_eq))
    fast_st, slow_st = state.fast, state.slow
    c0 = fast_st.coords
    print(
        f"fast K={fast_st.nbr_idx.shape[1]} slow K={slow_st.nbr_idx.shape[1]}"
        f" fast bucket c={mts.fast._bucket_c} slow bucket c={mts.slow._bucket_c}",
        flush=True,
    )

    # --- per-stage timings ---
    def fast_ef(st, c):
        e, f = mts.fast._energy_and_forces(st, c)
        return e + jnp.sum(f)

    def slow_ef(st, c):
        e, f = mts.slow._energy_and_forces(st, c)
        return e + jnp.sum(f)

    def slow_refresh(st, c):
        return jnp.sum(_refresh_neighbors(st, c).dist ** 2)

    def fast_refresh(st, c):
        return jnp.sum(_refresh_neighbors(st, c).dist ** 2)

    print(f"fast eval f+b     {timeit(fast_ef, c0, fast_st):8.2f} ms", flush=True)
    print(f"fast refresh f+b  {timeit(lambda st, c: jnp.sum(jax.grad(lambda cc: fast_refresh(st, cc))(c)), c0, fast_st):8.2f} ms", flush=True)
    print(f"slow eval f+b     {timeit(slow_ef, c0, slow_st):8.2f} ms", flush=True)
    print(f"slow refresh f+b  {timeit(lambda st, c: jnp.sum(jax.grad(lambda cc: slow_refresh(st, cc))(c)), c0, slow_st):8.2f} ms", flush=True)

    def fast_build(c):
        out = mts.fast._build_cache(c)
        tot = 0.0
        for x in jax.tree.leaves(out):
            tot = tot + jnp.sum(x).astype(jnp.float32)
        return tot

    def slow_build(c):
        out = mts.slow._build_cache(c)
        tot = 0.0
        for x in jax.tree.leaves(out):
            tot = tot + jnp.sum(x).astype(jnp.float32)
        return tot

    print(f"fast rebuild      {timeit(fast_build, c0, reps=100):8.2f} ms", flush=True)
    print(f"slow rebuild      {timeit(slow_build, c0, reps=100):8.2f} ms", flush=True)

    # whole outer step (4 inner + 1 slow eval), Langevin cadence
    run = mts._runner_cache  # noqa: F841  (forces attr existence)
    state = mts.run(state, 96, ensemble="langevin", temperature=300.0)
    _ = float(state.energy)
    t0 = time.perf_counter()
    state = mts.run(state, 96, ensemble="langevin", temperature=300.0)
    _ = float(state.energy)
    dt = (time.perf_counter() - t0) / 96
    print(f"whole MTS step    {dt * 1e3:8.2f} ms  (96-step segment)", flush=True)
    print(f"rebuilds fast={int(state.fast.rebuilds)} slow={int(state.slow.rebuilds)}", flush=True)


if __name__ == "__main__":
    main()
