"""Headline benchmark: ANI-2x energy+forces on a 10k-atom periodic water box.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: MD throughput in ns/day (1 fs timestep) for ANI-2x (full 8-member
ensemble) on a 10k-atom periodic water box with the jitted MD driver
(Verlet-cached cell-list neighbors) — the BASELINE.json north star ("ANI-2x
MD on a 10k-atom periodic water box on one v5e at >= cuAEV-on-A100 ns/day").

Baseline assumption (documented, refined as better data appears): cuAEV on
A100 runs ANI-2x MD on ~10k atoms at roughly 1.0 ns/day at 1 fs.
vs_baseline > 1 means faster than that estimate.  Extras include the raw
(non-amortized) energies+forces step time.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_US_PER_ATOM = 1.157  # cuAEV-on-A100 estimate, see module docstring


def _wait_for_backend(max_wait_s: float = 900.0) -> None:
    """Retry TPU backend init through transient tunnel outages.

    The tunneled chip occasionally reports UNAVAILABLE for a few minutes;
    a bench run that lands in that window should wait, not fail.
    """
    import jax

    t0 = time.perf_counter()
    while True:
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if time.perf_counter() - t0 > max_wait_s:
                raise
            print(f"# backend unavailable, retrying: {e}", flush=True)
            time.sleep(30.0)


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (off by default in this env).

    The bench compiles ~20 programs (MD scans, smoke lanes); over the
    tunneled chip that is tens of minutes of pure compilation.  The disk
    cache makes repeat runs (and the driver's end-of-round run after a
    local warmup) near-instant on the compile side.
    """
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        cache = Path(__file__).resolve().parent / ".jax_cache"
        cache.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    _wait_for_backend()

    import jax

    _enable_compile_cache()
    import jax.numpy as jnp

    from torchani_tpu.grad import energies_and_forces
    from torchani_tpu.models import ANI2x
    from torchani_tpu.neighbors import CellList
    from torchani_tpu.testing import make_water_box

    target_atoms = 10002
    species_np, coords_np, cell_np = make_water_box(target_atoms)
    num_atoms = species_np.shape[1]

    model = ANI2x(pretrained=False)
    model = model.replace(neighborlist=CellList(capacity=96))

    species = jnp.asarray(species_np)
    coords = jnp.asarray(coords_np)
    cell = jnp.asarray(cell_np)
    pbc = jnp.asarray([True, True, True])

    iters = 30

    @jax.jit
    def raw_chunk(coords):
        # `iters` full from-scratch evaluations scanned inside ONE program:
        # a per-call scalar fetch costs a ~30 ms tunnel RTT, which is
        # measurement-harness latency, not device time (same methodology as
        # the MD timing below).  The RTT amortizes as ~30/iters ms over
        # each measured unit (r5, tools/loop_overhead_probe.py), so iters
        # matters: the r1-r4 raw number at iters=10 carried ~+3 ms.
        # The per-iteration perturbation defeats CSE
        # without changing the neighbor structure.
        def body(i, acc):
            c = coords + i * jnp.asarray(1e-6, coords.dtype)
            e, f = energies_and_forces(model, species, c, cell, pbc)
            return acc + jnp.sum(e) + jnp.sum(f)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    # warmup / compile (the fetched scalar forces completion of the whole
    # chunk; block_until_ready on the tunneled device can return early)
    _ = float(raw_chunk(coords))

    t0 = time.perf_counter()
    _ = float(raw_chunk(coords))
    dt = (time.perf_counter() - t0) / iters

    us_per_atom = dt * 1e6 / num_atoms

    # MD driver rate (Verlet-cached neighbors, whole step jitted + scanned) —
    # the configuration behind the ns/day north star
    from torchani_tpu.md import MolecularDynamics

    md = MolecularDynamics(model, species_np, cell=cell_np, pbc=True)
    state = md.init(coords_np, temperature=300.0)
    # 250 steps: the one scalar fetch's ~30 ms tunnel RTT amortizes as
    # RTT/steps over each step (r5, tools/loop_overhead_probe.py), so the
    # r1-r4 headline at md_iters=50 carried a +0.6 ms/step measurement
    # floor; 250 keeps it at ~0.12 ms and averages ~10 Verlet windows.
    md_iters = 250
    # warm up with the SAME step count (scan length is part of the compiled
    # program signature)
    state = md.run_nve(state, md_iters)
    _ = float(state.energy)
    t0 = time.perf_counter()
    state = md.run_nve(state, md_iters)
    _ = float(state.energy)
    md_dt = (time.perf_counter() - t0) / md_iters
    md_ns_per_day = (86400.0 / md_dt) * 1e-6  # 1 fs timestep

    # Cached single-point rate: repeated same-topology E+F (optimizers, ASE
    # loops) through the Verlet-cache machinery instead of the from-scratch
    # build that raw_ef pays.  Perturbations are generated device-side (a
    # host-side (A,3) upload per call would cost ~10 ms on the tunnel).
    from torchani_tpu.md import CachedSinglePoint

    sp = CachedSinglePoint(
        model, species_np, cell=cell_np, pbc=True, nn_precision="high"
    )
    coords0 = jnp.asarray(coords_np[0])
    perturb = jax.jit(lambda c, i: c + i * 2e-4)
    e0, _ = sp(coords0)
    e1, _ = sp(perturb(coords0, 1.0))  # compile the cached runner
    _ = float(e1)
    sp_iters = 20
    t0 = time.perf_counter()
    e = e1
    for i in range(sp_iters):
        e, _f = sp(perturb(coords0, float(i + 2)))
    _ = float(e)
    cached_sp_ms = (time.perf_counter() - t0) / sp_iters * 1e3

    # Heterogeneous MD (BASELINE config 5): solvated 1hz5 protein,
    # ANI-2dr-class stack under the RESPA multiple-timestep driver —
    # same configuration as tools/hetero_md_benchmark.py --mts 4 (shared
    # shapes keep the persistent compile cache hot across both).
    try:
        from torchani_tpu.md import MultipleTimestepMD
        from torchani_tpu.testing import make_solvated_system
        import torchani_tpu as tt

        pdb_dir = "/root/reference/dataset/pdb"
        hz, hcoords, hcell = make_solvated_system(
            f"{pdb_dir}/1hz5.pdb", f"{pdb_dir}/water-0.8nm.pdb", box=55.0,
            clash=2.2,
        )
        hmodel = tt.simple_ani(
            ("H", "C", "N", "O", "S", "F", "Cl"),
            "wb97x-631gd",
            ensemble_size=8,
            repulsion=True,
            dispersion=True,
        )
        # EQUILIBRATE (dt 0.25, strong Langevin), RE-MEASURE with a fresh
        # driver at the settled configuration, then time thermostatted
        # 1 fs steps — the raw solvated start relaxes for 100+ steps and
        # timing that window measures a chaotic rebuild storm
        # (tools/hetero_md_benchmark.py documents the protocol).
        eq = MultipleTimestepMD(
            hmodel, hz[None], cell=hcell, pbc=True, every=4,
            timestep_fs=0.25,
        )
        hstate = eq.init(hcoords[None], temperature=300.0)
        hstate = eq.run(
            hstate, 800, ensemble="langevin", temperature=300.0,
            friction_per_fs=0.1,
        )
        hc_eq = np.asarray(hstate.coords)
        hv_eq = jnp.asarray(np.asarray(hstate.velocities))
        hmd = MultipleTimestepMD(
            hmodel, hz[None], cell=hcell, pbc=True, every=4
        )
        hsteps = 96  # RTT floor ~0.3 ms/step; must stay a multiple of every=4
        hstate = hmd.init(hc_eq)
        hstate = hstate.replace(
            fast=hstate.fast.replace(velocities=hv_eq)
        )
        hrun = lambda st: hmd.run(  # noqa: E731
            st, hsteps, ensemble="langevin", temperature=300.0
        )
        hstate = hrun(hstate)  # warmup, same scan length
        _ = float(hstate.energy)
        t0 = time.perf_counter()
        hstate = hrun(hstate)
        _ = float(hstate.energy)
        h_dt = (time.perf_counter() - t0) / hsteps
        hetero = {
            "atoms": int(len(hz)),
            "ms_per_step": round(h_dt * 1e3, 3),
            "ns_per_day": round(86400.0 / h_dt * 1e-6, 3),
            "mts_every": 4,
            "protocol": "equilibrated, Langevin-timed",
            "energy_finite": bool(np.isfinite(float(hstate.energy))),
        }
    except Exception as exc:  # record, don't kill the bench line
        hetero = {"error": str(exc)[:200]}

    # On-device golden parity (no pytest runs on the real chip; this is the
    # per-round numerical check, tools/tpu_smoke.py)
    try:
        sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
        import tpu_smoke

        parity = tpu_smoke.run()
    except Exception as exc:  # record, don't kill the bench line
        parity = {"tpu_parity": f"ERROR: {exc}"}

    print(
        json.dumps(
            {
                "metric": "ani2x_water10k_md_ns_per_day",
                "value": round(md_ns_per_day, 4),
                "unit": "ns/day (1 fs)",
                "vs_baseline": round(md_ns_per_day / 1.0, 3),
                "extra": {
                    "atoms": int(num_atoms),
                    "md_ms_per_step": round(md_dt * 1e3, 3),
                    "raw_ef_ms_per_step": round(dt * 1e3, 3),
                    "cached_sp_ms": round(cached_sp_ms, 3),
                    "raw_ef_us_per_atom": round(us_per_atom, 4),
                    "hetero_mts": hetero,
                    "tpu_parity": parity.get("tpu_parity"),
                    "tpu_parity_detail": {
                        k: parity.get(k)
                        for k in (
                            "strategies", "zoo", "pbc", "md", "hetero",
                            "npt", "packed_refresh",
                        )
                    },
                    "rebuilds_in_window": int(state.rebuilds),
                    "neighbor_overflow": bool(state.overflow),
                    "energy_finite": bool(jnp.isfinite(state.energy)),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
