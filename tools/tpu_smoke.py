"""On-device numerical parity smoke: goldens computed ON the current chip.

The pytest suite forces the CPU platform (tests/conftest.py), so no test
ever executes on the real TPU; this closes that gap (reference analog: the
device-parametrized test axis, ``/root/reference/torchani/_testing.py:25-83``).
Four lanes, each evaluated on whatever device JAX picked (the TPU during
bench runs):

- ``strategies``: stored reference goldens (`tests/resources/
  model_goldens.npz`: reference-generated weights + E/F for 6 molecules)
  through a 2-member HCNO model, for both the ``xla`` and ``pallas`` AEV
  strategies.
- ``zoo``: the full ANI-2x published scheme (7 species, 8 members,
  `tests/resources/zoo_goldens_ani2x.npz` reference-scheme state dict),
  both strategies — the exact model class the headline bench runs.
- ``pbc``: a periodic water cell, chip E/F vs the same code on the CPU
  backend of this process (device-axis parity for the PBC path).
- ``md``: a 20-step jitted NVE trajectory on the chip vs the identical
  trajectory on CPU — final-step energy and force match plus an energy-
  drift guard (covers the Verlet-cache/bucket-refresh code the headline
  bench exercises, on-device).

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


def run(fast: bool = False) -> dict:
    import jax

    import torchani_tpu  # noqa: F401  (device selection side effects)

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
        out["pbc"] = {
            "e_maxerr": round(pbc_e, 9),
            "f_maxerr": round(pbc_f, 9),
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
        out["md"] = {
            "e_abserr": round(md_e, 9),
            "f_maxerr": round(md_f, 9),
            "drift_abserr": round(md_drift, 9),
            "ok": md_ok,
        }
        ok = ok and pbc_ok and md_ok

    out["tpu_parity"] = "pass" if ok else "FAIL"
    return out


if __name__ == "__main__":
    print(json.dumps(run(fast="--fast" in sys.argv)))
