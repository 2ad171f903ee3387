"""On-device numerical parity smoke: golden E+F computed ON the current chip.

The pytest suite forces the CPU platform (tests/conftest.py), so no test
ever executes on the real TPU; this closes that gap (reference analog: the
device-parametrized test axis, ``/root/reference/torchani/_testing.py:25-83``).
It loads the stored reference goldens (`tests/resources/model_goldens.npz`:
reference-generated weights + E/F for 6 molecules), evaluates them on
whatever device JAX picked (the TPU during bench runs), for both the `xla`
and `pallas` AEV strategies, and compares against the golden values.

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


def run() -> dict:
    import jax
    import jax.numpy as jnp

    import torchani_tpu as tt
    from torchani_tpu.convert import load_state_dict
    from torchani_tpu.grad import energies_and_forces

    res_dir = Path(__file__).resolve().parent.parent / "tests" / "resources"
    with np.load(res_dir / "model_goldens.npz", allow_pickle=False) as data:
        golden = {k: data[k] for k in data.files}
    sd = {k[len("sd."):]: v for k, v in golden.items() if k.startswith("sd.")}
    model = load_state_dict(
        tt.simple_ani(("H", "C", "N", "O"), ensemble_size=2), sd
    )
    species = jnp.asarray(golden["species"])
    coords = jnp.asarray(golden["coords"])

    out: dict = {"device": str(jax.devices()[0]), "strategies": {}}
    ok = True
    for strategy in ("xla", "pallas"):
        nnp = model.potentials["nnp"]
        pots = dict(model.potentials)
        pots["nnp"] = nnp.replace(
            aev_computer=nnp.aev_computer.set_strategy(strategy)
        )
        m = model.replace(potentials=pots)
        e, f = jax.jit(
            lambda s, c, _m=m: energies_and_forces(_m, s, c)
        )(species, coords)
        e_err = float(np.max(np.abs(np.asarray(e) - golden["energies"])))
        f_err = float(np.max(np.abs(np.asarray(f) - golden["forces"])))
        s_ok = bool(
            np.isfinite(e_err)
            and np.isfinite(f_err)
            and e_err < E_ATOL
            and f_err < F_ATOL
        )
        ok = ok and s_ok
        out["strategies"][strategy] = {
            "e_maxerr": round(e_err, 9),
            "f_maxerr": round(f_err, 9),
            "ok": s_ok,
        }
    out["tpu_parity"] = "pass" if ok else "FAIL"
    return out


if __name__ == "__main__":
    print(json.dumps(run()))
