"""On-device numerical parity smoke: goldens computed ON the current chip.

The pytest suite forces the CPU platform (tests/conftest.py), so no test
ever executes on the real TPU; this closes that gap (reference analog: the
device-parametrized test axis, ``/root/reference/torchani/_testing.py:25-83``).
Seven lanes, each evaluated on whatever device JAX picked (the TPU during
bench runs):

- ``strategies``: stored reference goldens (`tests/resources/
  model_goldens.npz`: reference-generated weights + E/F for 6 molecules)
  through a 2-member HCNO model, for both the ``xla`` and ``pallas`` AEV
  strategies.
- ``zoo``: the full ANI-2x published scheme (7 species, 8 members,
  `tests/resources/zoo_goldens_ani2x.npz` reference-scheme state dict),
  both strategies — the exact model class the headline bench runs.
- ``pbc``: a periodic water cell, chip E/F vs the same code on the CPU
  backend of this process (device-axis parity for the PBC path), plus an
  on-chip ``pallas``-strategy variant vs the chip ``xla`` result (the
  reference runs its extension parity on the real device,
  ``tests/test_cuaev.py:22-27``).
- ``md``: a 20-step jitted NVE trajectory on the chip vs the identical
  trajectory on CPU — final-step energy and force match plus an energy-
  drift guard (covers the Verlet-cache/bucket-refresh code the headline
  bench exercises, on-device) — plus an on-chip ``pallas`` trajectory vs
  the chip ``xla`` one.
- ``hetero``: the ANI-2dr model class (NNP + xTB repulsion + 8 A D3
  dispersion on a small solvated HCNO peptide) — the per-potential
  lane-prefix + pair-table + bucket-select + MTS machinery the config-5
  bench runs, validated ON the chip against the plain ``single_point``
  path (whose own chip-vs-CPU parity lanes 1-3 anchor): monolithic
  lane-prefix driver E/F vs plain-path E/F, the RESPA lane split's
  exactness at init, and an NVE conserved-energy drift gate on a short
  k=4 segment proving the impulse split is sound on-device.  (A
  chip-vs-CPU form was measured and rejected: the CPU side costs >10 min
  of compiles at these shapes.)
- ``npt`` (r5): the Berendsen NPT pressure path on the chip — fused
  scaling-trick virial (``md._energy_forces_virial``) vs an on-chip
  finite difference of the public scaled-cell energy, a finite 12-step
  NPT segment, and chip-vs-CPU agreement of the virial and end state.
- ``packed_refresh`` (r5): the atom-packed bucket-refresh kernel variant
  (``bucket_refresh_packed.py``) vs the production slot layout, both on
  the chip: E/F at init and a short NVE segment.

Importable (`run()` returns a dict, used by bench.py to record a
``tpu_parity`` field per round) or runnable:

    python tools/tpu_smoke.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

#: Gates: strict f32 ("highest") NN matmuls; the remaining device-vs-CPU
#: difference is f32 reduction order (~1 ulp of the ~500 Ha totals).
E_ATOL = 5e-5
F_ATOL = 1e-4
#: 20-step MD lane: reduction-order differences are amplified by the
#: trajectory (measured max |dE| ~2e-5 Ha, |dF| ~6e-4 Ha/A on v5e; gates
#: give ~10x margin).  Drift gate is vs the CPU trajectory's own drift.
MD_E_ATOL = 5e-4
MD_F_ATOL = 1e-2


def _resources() -> Path:
    return Path(__file__).resolve().parent.parent / "tests" / "resources"


def _load(fname: str) -> dict:
    with np.load(_resources() / fname, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}


def _split_sd(golden):
    sd = {k[len("sd."):]: v for k, v in golden.items() if k.startswith("sd.")}
    data = {k: v for k, v in golden.items() if not k.startswith("sd.")}
    return sd, data


def _with_strategy(model, strategy: str):
    nnp = model.potentials["nnp"]
    pots = dict(model.potentials)
    pots["nnp"] = nnp.replace(
        aev_computer=nnp.aev_computer.set_strategy(strategy)
    )
    return model.replace(potentials=pots)


def _ef_lane(model, data, strategies=("xla", "pallas")) -> dict:
    import jax
    import jax.numpy as jnp

    from torchani_tpu.grad import energies_and_forces

    species = jnp.asarray(data["species"])
    coords = jnp.asarray(data["coords"])
    lane: dict = {}
    ok = True
    for strategy in strategies:
        m = _with_strategy(model, strategy)
        e, f = jax.jit(
            lambda s, c, _m=m: energies_and_forces(_m, s, c)
        )(species, coords)
        e_err = float(np.max(np.abs(np.asarray(e) - data["energies"])))
        f_err = float(np.max(np.abs(np.asarray(f) - data["forces"])))
        s_ok = bool(
            np.isfinite(e_err)
            and np.isfinite(f_err)
            and e_err < E_ATOL
            and f_err < F_ATOL
        )
        ok = ok and s_ok
        lane[strategy] = {
            "e_maxerr": round(e_err, 9),
            "f_maxerr": round(f_err, 9),
            "ok": s_ok,
        }
    lane["ok"] = ok
    return lane


def _simple_model():
    import torchani_tpu as tt
    from torchani_tpu.convert import load_state_dict

    golden = _load("model_goldens.npz")
    sd, data = _split_sd(golden)
    model = load_state_dict(
        tt.simple_ani(("H", "C", "N", "O"), ensemble_size=2), sd
    )
    return model, {
        "species": golden["species"],
        "coords": golden["coords"],
        "energies": golden["energies"],
        "forces": golden["forces"],
    }


def _zoo_model():
    from torchani_tpu import models as zoo
    from torchani_tpu.convert import load_state_dict

    sd, data = _split_sd(_load("zoo_goldens_ani2x.npz"))
    return load_state_dict(zoo.ANI2x(pretrained=False), sd), data


def _pbc_ef(model, species, coords, cell):
    """E/F for one periodic cell on the CURRENT default device."""
    import jax
    import jax.numpy as jnp

    from torchani_tpu.grad import energies_and_forces

    s = jnp.asarray(np.asarray(species))
    c = jnp.asarray(np.asarray(coords))
    cl = jnp.asarray(np.asarray(cell))
    pbc = jnp.asarray([True, True, True])
    # cell stays closed-over (concrete): the all-pairs PBC image-shift range
    # is derived from its value at trace time
    e, f = jax.jit(
        lambda s_, c_, _m=model: energies_and_forces(
            _m, s_, c_, cell=cl, pbc=pbc
        )
    )(s, c)
    return np.asarray(e), np.asarray(f)


def _md_trajectory(model, species, coords, cell, steps=20):
    """Deterministic 20-step NVE on the CURRENT default device.

    nn_precision="highest" so the only chip-vs-CPU difference is f32
    reduction order, not the 3-pass bf16 matmul mode MD defaults to.
    """
    import jax
    import jax.numpy as jnp

    from torchani_tpu.md import MolecularDynamics

    md = MolecularDynamics(
        model,
        jnp.asarray(np.asarray(species)),
        cell=jnp.asarray(np.asarray(cell)),
        pbc=True,
        timestep_fs=0.2,
        skin=1.0,
        nn_precision="highest",
    )
    state = md.init(
        jnp.asarray(np.asarray(coords)),
        temperature=50.0,
        key=jax.random.PRNGKey(7),
    )
    e0 = float(state.energy)
    state = md.run_nve(state, steps)
    return (
        e0,
        float(state.energy),
        np.asarray(state.forces),
        bool(state.overflow),
    )


def _hetero_model():
    """Deterministic ANI-2dr-class stack (NNP + repulsion + D3 at 8 A).

    Random-init weights are identical across backends (threefry PRNG is
    platform-independent), so chip-vs-CPU comparisons are exact-model.
    """
    import jax

    import torchani_tpu as tt

    return tt.simple_ani(
        ("H", "C", "N", "O", "S", "F", "Cl"),
        ensemble_size=1,
        repulsion=True,
        dispersion=True,
        key=jax.random.PRNGKey(42),
    )


def _hetero_system(box: float = 32.0):
    from torchani_tpu.testing import make_solvated_system

    pdb = Path("/root/reference/dataset/pdb")
    return make_solvated_system(
        str(pdb / "small.pdb"), str(pdb / "water-0.8nm.pdb"), box=box
    )


def _hetero_plain_ef(model, z, coords, cell):
    """E/F through the plain ``single_point`` path (cell-list neighborlist,
    full-width tables — no lane prefixes, no bucket kernels) on the
    CURRENT device.  This is the reference formulation the driver
    machinery must agree with; its own chip-vs-CPU parity is anchored by
    lanes 1-3."""
    import jax
    import jax.numpy as jnp

    import torchani_tpu as tt
    from torchani_tpu.neighbors import CellList

    m = model.replace(neighborlist=CellList())
    cl = jnp.asarray(np.asarray(cell))  # concrete BEFORE tracing: the
    pbc = jnp.asarray([True, True, True])  # grid shape derives from its value

    out = jax.jit(
        lambda s, c: tt.single_point(
            m, s, c, cell=cl, pbc=pbc, forces=True
        )
    )(jnp.asarray(z[None]), jnp.asarray(coords[None]))
    return (
        float(np.sum(np.asarray(out["energies"]))),
        np.asarray(out["forces"])[0],
    )


def _no_shifter(model):
    """Disable the SAE shifter: a coordinate-independent ~-50k Ha offset
    whose f32 ulp (~4 mHa) would swamp both the energy gates and any
    drift measurement."""
    return model.replace(
        energy_shifter=model.energy_shifter.replace(enabled=False)
    )


def _hetero_drivers(model, z, coords, cell, steps=8, every=4):
    """One monolithic lane-prefix driver + one RESPA driver on the
    CURRENT device, each built ONCE (compiles are this lane's dominant
    cost): E/F at init from both (lane prefixes + folded pair tables +
    D3 lane-select kernels; RESPA split exactness), then a short NVE
    segment on the SAME instances for the conserved-energy drift
    comparison."""
    import jax
    import jax.numpy as jnp

    from torchani_tpu.md import (
        ACCEL_UNIT,
        MolecularDynamics,
        MultipleTimestepMD,
    )

    def tot(md, s_):
        ke = 0.5 * float(
            jnp.sum(md.masses[:, None] * s_.velocities**2)
        ) / ACCEL_UNIT
        return float(s_.energy) + ke

    mono = MolecularDynamics(
        model, z[None], cell=cell, pbc=True, timestep_fs=0.5,
        nn_precision="highest",
    )
    st = mono.init(coords, temperature=50.0, key=jax.random.PRNGKey(5))
    e_mono, f_mono = float(st.energy), np.asarray(st.forces)
    e0 = tot(mono, st)
    st = mono.run_nve(st, steps)
    d_mono = tot(mono, st) - e0
    ov = bool(st.overflow)

    mts = MultipleTimestepMD(
        model, z[None], cell=cell, pbc=True, every=every,
        timestep_fs=0.5, nn_precision="highest",
    )
    s2 = mts.init(coords, temperature=50.0, key=jax.random.PRNGKey(5))
    e_mts, f_mts = float(s2.energy), np.asarray(s2.forces)
    e0 = tot(mts, s2)
    s2 = mts.run(s2, steps)
    d_mts = tot(mts, s2) - e0
    ov = ov or bool(s2.overflow)
    return e_mono, f_mono, e_mts, f_mts, d_mts, d_mono, ov


def _npt_segment(model, species, coords, cell, steps=12):
    """Berendsen NPT segment + fused virial on the CURRENT device.

    Returns (E_init, dU/dscale at init, E_end, scale_end, overflow).
    """
    import jax
    import jax.numpy as jnp

    from torchani_tpu.md import MolecularDynamics

    md = MolecularDynamics(
        model,
        jnp.asarray(np.asarray(species)),
        cell=jnp.asarray(np.asarray(cell)),
        pbc=True,
        timestep_fs=0.2,
        skin=1.0,
        nn_precision="highest",
        npt_compression=0.1,
    )
    st = md.init(
        jnp.asarray(np.asarray(coords)),
        temperature=50.0,
        key=jax.random.PRNGKey(9),
    )
    st = st.replace(scale=jnp.ones(()))
    e0, _f0, du_ds = jax.jit(md._energy_forces_virial)(
        st, st.coords, jnp.ones(())
    )
    st = md.run_npt_berendsen(
        st, steps, temperature=50.0, pressure_bar=1.0, tau_p_fs=200.0
    )
    return (
        float(e0),
        float(du_ds),
        float(st.energy),
        float(st.scale),
        bool(st.overflow),
    )


def _scaled_energy(model, species, coords, cell, s):
    """E under joint coordinate+cell scaling (public path) on the CURRENT
    device — the finite-difference oracle for the fused virial."""
    import jax
    import jax.numpy as jnp

    import torchani_tpu as tt

    cl = jnp.asarray(np.asarray(cell)) * s
    pbc = jnp.asarray([True] * 3)  # concrete BEFORE tracing
    out = jax.jit(
        lambda sp, c: tt.single_point(model, sp, c, cell=cl, pbc=pbc)
    )(jnp.asarray(np.asarray(species)), jnp.asarray(np.asarray(coords)) * s)
    return float(np.sum(np.asarray(out["energies"])))


def _bucket_mode_ef(model, species, coords, cell, mode, steps=8):
    """E/F at init + a short NVE segment with the given bucket_refresh
    mode ('slot' pins the slot-row kernel layout, 'packed' the atom-packed
    rows of bucket_refresh_packed.py) on the CURRENT device."""
    import jax
    import jax.numpy as jnp

    from torchani_tpu.md import MolecularDynamics

    md = MolecularDynamics(
        model,
        jnp.asarray(np.asarray(species)),
        cell=jnp.asarray(np.asarray(cell)),
        pbc=True,
        timestep_fs=0.25,
        skin=0.6,
        nn_precision="highest",
        bucket_refresh=mode,
    )
    st = md.init(
        jnp.asarray(np.asarray(coords)),
        temperature=50.0,
        key=jax.random.PRNGKey(4),
    )
    e0, f0 = float(st.energy), np.asarray(st.forces)
    st = md.run_nve(st, steps)
    return e0, f0, float(st.energy), bool(st.overflow), md._bucket_c


def run(fast: bool = False) -> dict:
    import jax

    import torchani_tpu  # noqa: F401  (device selection side effects)

    # persistent compile cache (standalone runs; bench.py sets it too)
    if jax.config.jax_compilation_cache_dir is None:
        cache = Path(__file__).resolve().parent.parent / ".jax_cache"
        cache.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )

    out: dict = {"device": str(jax.devices()[0])}

    # lane 1: HCNO reference goldens, both strategies (original lane)
    model, data = _simple_model()
    out["strategies"] = _ef_lane(model, data)

    # lane 2: ANI-2x zoo scheme (7 species, 8 members), both strategies
    zoo_model, zoo_data = _zoo_model()
    out["zoo"] = _ef_lane(zoo_model, zoo_data)

    ok = out["strategies"]["ok"] and out["zoo"]["ok"]

    if not fast:
        from torchani_tpu.testing import make_water_box

        cpu = jax.devices("cpu")[0]
        species, coords, cell = make_water_box(48, seed=3)  # 16 waters

        # lane 3: PBC water cell, chip vs CPU backend (device axis)
        e_dev, f_dev = _pbc_ef(model, species, coords, cell)
        with jax.default_device(cpu):
            e_cpu, f_cpu = _pbc_ef(model, species, coords, cell)
        pbc_e = float(np.max(np.abs(e_dev - e_cpu)))
        pbc_f = float(np.max(np.abs(f_dev - f_cpu)))
        # the energy gate must scale with |E|: a ~-1216 Ha cell total has
        # f32 ulp 1.22e-4, and chip-vs-CPU reduction order legitimately
        # differs by a few ulps (measured 2 ulps post exact_matmul fix;
        # the 24%-force bug this lane caught was unpinned position matmuls)
        pbc_gate = max(E_ATOL, 8.0 * float(np.spacing(np.abs(e_cpu).max())))
        pbc_ok = bool(
            np.isfinite(pbc_e) and np.isfinite(pbc_f)
            and pbc_e < pbc_gate and pbc_f < F_ATOL
        )
        # pallas variant ON the chip, gated against the chip xla result
        e_pal, f_pal = _pbc_ef(_with_strategy(model, "pallas"), species,
                               coords, cell)
        pal_e = float(np.max(np.abs(e_pal - e_dev)))
        pal_f = float(np.max(np.abs(f_pal - f_dev)))
        pal_ok = bool(
            np.isfinite(pal_e) and np.isfinite(pal_f)
            and pal_e < pbc_gate and pal_f < F_ATOL
        )
        pbc_ok = pbc_ok and pal_ok
        out["pbc"] = {
            "e_maxerr": round(pbc_e, 9),
            "f_maxerr": round(pbc_f, 9),
            "pallas": {
                "e_maxerr": round(pal_e, 9),
                "f_maxerr": round(pal_f, 9),
                "ok": pal_ok,
            },
            "ok": pbc_ok,
        }

        # lane 4: 20-step NVE trajectory, chip vs CPU
        e0_dev, e_dev, f_dev, ov_dev = _md_trajectory(
            model, species, coords, cell
        )
        with jax.default_device(cpu):
            e0_cpu, e_cpu, f_cpu, ov_cpu = _md_trajectory(
                model, species, coords, cell
            )
        md_e = abs(e_dev - e_cpu)
        md_f = float(np.max(np.abs(f_dev - f_cpu)))
        # drift guard: chip potential-energy change over the trajectory must
        # track the CPU one (integration error, not chip error)
        md_drift = abs((e_dev - e0_dev) - (e_cpu - e0_cpu))
        md_ok = bool(
            not ov_dev and not ov_cpu
            and np.isfinite(md_e) and np.isfinite(md_f)
            and md_e < MD_E_ATOL and md_f < MD_F_ATOL
            and md_drift < MD_E_ATOL
        )
        # pallas trajectory ON the chip vs the chip xla trajectory
        e0_pal, e_pal, f_pal, ov_pal = _md_trajectory(
            _with_strategy(model, "pallas"), species, coords, cell
        )
        mdp_e = abs(e_pal - e_dev)
        mdp_f = float(np.max(np.abs(f_pal - f_dev)))
        mdp_ok = bool(
            not ov_pal
            and np.isfinite(mdp_e) and np.isfinite(mdp_f)
            and mdp_e < MD_E_ATOL and mdp_f < MD_F_ATOL
        )
        md_ok = md_ok and mdp_ok
        out["md"] = {
            "e_abserr": round(md_e, 9),
            "f_maxerr": round(md_f, 9),
            "drift_abserr": round(md_drift, 9),
            "pallas": {
                "e_abserr": round(mdp_e, 9),
                "f_maxerr": round(mdp_f, 9),
                "ok": mdp_ok,
            },
            "ok": md_ok,
        }
        ok = ok and pbc_ok and md_ok

        # lane 6: NPT/virial machinery ON the chip — the Berendsen
        # pressure path (`md._energy_forces_virial`: the scaling-trick
        # virial fused into the force backward) ran only in CPU tests
        # before r5.  Three gates: (a) the fused dU/dscale matches an
        # on-chip finite difference of the PUBLIC scaled-cell energy,
        # (b) a 12-step NPT segment stays finite without overflow,
        # (c) chip-vs-CPU agreement of the segment's end state.
        e0_npt, du_ds, e_npt, s_npt, ov_npt = _npt_segment(
            model, species, coords, cell
        )
        h = 1e-3
        fd = (
            _scaled_energy(model, species, coords, cell, 1.0 + h)
            - _scaled_energy(model, species, coords, cell, 1.0 - h)
        ) / (2 * h)
        vir_err = abs(du_ds - fd)
        with jax.default_device(cpu):
            _, du_cpu, e_npt_cpu, s_npt_cpu, ov_npt_cpu = _npt_segment(
                model, species, coords, cell
            )
        npt_e = abs(e_npt - e_npt_cpu)
        npt_s = abs(s_npt - s_npt_cpu)
        npt_ok = bool(
            not ov_npt and not ov_npt_cpu
            and np.isfinite(e_npt) and np.isfinite(du_ds)
            and vir_err < 3e-2 * abs(fd) + 2e-2
            and npt_e < MD_E_ATOL
            and abs(du_ds - du_cpu) < 5e-3 * abs(du_cpu) + 5e-3
            # the barostat integrates the virial, so reduction-order noise
            # amplifies along the segment; gate the trajectory-end scale
            # loosely (its per-step input |mu - 1| is clipped at 3e-2)
            and npt_s < 5e-4
        )
        out["npt"] = {
            "virial_du_ds": round(du_ds, 6),
            "virial_fd_abserr": round(vir_err, 6),
            "e_abserr_vs_cpu": round(npt_e, 9),
            "scale_abserr_vs_cpu": round(npt_s, 9),
            "ok": npt_ok,
        }
        ok = ok and npt_ok

        # lane 7: packed bucket-refresh variant ON the chip vs the slot
        # layout (bucket_refresh_packed.py ran only in CPU tests before
        # r5; the kernels are documented bit-exact vs slot on HW — gate
        # at the same reduction-order tolerances as the other lanes).
        # Low density so the bucket grid gets >= 3 cells per axis.
        from torchani_tpu.testing import make_water_box as _mwb

        psp, pco, pcell = _mwb(150, density_molec_per_a3=0.008, seed=3)
        es, fs, es_end, ovs, cs = _bucket_mode_ef(
            model, psp, pco, pcell, "slot"
        )
        ep, fp, ep_end, ovp, cp = _bucket_mode_ef(
            model, psp, pco, pcell, "packed"
        )
        pk_e = abs(ep - es)
        pk_f = float(np.max(np.abs(fp - fs)))
        pk_e_end = abs(ep_end - es_end)
        pk_ok = bool(
            not ovs and not ovp and cs is not None and cp is not None
            and np.isfinite(pk_e) and np.isfinite(pk_f)
            and pk_e < MD_E_ATOL and pk_f < F_ATOL
            and pk_e_end < MD_E_ATOL
        )
        out["packed_refresh"] = {
            "e_abserr": round(pk_e, 9),
            "f_maxerr": round(pk_f, 9),
            "e_end_abserr": round(pk_e_end, 9),
            "ok": pk_ok,
        }
        ok = ok and pk_ok

        # lane 5: heterogeneous (ANI-2dr class), all ON the chip: the
        # lane-prefix/bucket/MTS machinery vs the plain single_point path.
        # The SAE shifter (a constant ~-50k Ha with ~4 mHa f32 ulp) is
        # disabled so both the energy gates and the drift measurement
        # resolve the interaction physics, not the offset's rounding.
        hmodel = _no_shifter(_hetero_model())
        z, hcoords, hcell = _hetero_system()
        he_ref, hf_ref = _hetero_plain_ef(hmodel, z, hcoords, hcell)
        (
            he_dev, hf_dev, he_mts, hf_mts, drift_mts, drift_mono, mov,
        ) = _hetero_drivers(hmodel, z, hcoords, hcell)
        het_e = abs(he_dev - he_ref)
        het_f = float(np.max(np.abs(hf_dev - hf_ref)))
        het_gate = max(E_ATOL, 8.0 * float(np.spacing(abs(he_ref))))
        het_ok = bool(
            not mov
            and np.isfinite(het_e) and np.isfinite(het_f)
            and het_e < het_gate and het_f < F_ATOL
        )
        # RESPA lane split exactness at init (fast + slow == monolithic)
        split_e = abs(he_mts - he_dev)
        split_f = float(np.max(np.abs(hf_mts - hf_dev)))
        split_ok = bool(
            np.isfinite(split_e) and np.isfinite(split_f)
            and split_e < het_gate and split_f < F_ATOL
        )
        # NVE conserved-energy drift of the k=4 impulse split, on-chip,
        # anchored against the monolithic integrator's drift on the same
        # segment (the system has random weights and solvation contacts:
        # "how much drift is the integrator's own" needs a baseline)
        mts_ok = bool(
            np.isfinite(drift_mts) and np.isfinite(drift_mono)
            and abs(drift_mts) < max(5e-3, 10.0 * abs(drift_mono))
        )
        het_ok = het_ok and split_ok and mts_ok
        out["hetero"] = {
            "e_abserr": round(het_e, 9),
            "f_maxerr": round(het_f, 9),
            "split_e_abserr": round(split_e, 9),
            "split_f_maxerr": round(split_f, 9),
            "mts_nve_drift_ha": round(float(drift_mts), 9),
            "mono_nve_drift_ha": round(float(drift_mono), 9),
            "ok": het_ok,
        }
        ok = ok and het_ok

    out["tpu_parity"] = "pass" if ok else "FAIL"
    return out


if __name__ == "__main__":
    print(json.dumps(run(fast="--fast" in sys.argv)))
