"""Compilation and serialization: the JAX analog of TorchScript.

The reference tutorial ``/root/reference/examples/just_in_time_compilation.py``
serializes models with TorchScript so they can run without Python. The
TPU-native equivalents are:

* ``jax.jit`` — trace-once/compile-once execution (automatic here; models are
  pytrees so they pass straight through transforms),
* AOT lowering (``jit(f).lower(...).compile()``) — inspect or pre-build the
  XLA executable, including cost analysis,
* ``jax.export`` — serialize the lowered StableHLO to bytes, reloadable in a
  process without the model's Python code,
* ``save_state_dict`` / orbax checkpoints — parameter-only persistence.

    python examples/jit_and_export.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import torchani_tpu as tt

    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=2,
                          key=jax.random.PRNGKey(0))
    species = jnp.asarray([[8, 1, 1]])
    coords = jnp.asarray([[[0.0, 0.0, 0.12], [0.0, 0.76, -0.48],
                           [0.0, -0.76, -0.48]]])

    # --- jit: compile once per input shape ------------------------------
    efn = jax.jit(lambda m, z, c: m(z, c))
    print("jit energy:", float(efn(model, species, coords)[0]))

    # --- AOT: lower, inspect, compile ahead of time ---------------------
    lowered = jax.jit(lambda z, c: model(z, c)).lower(species, coords)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = (cost or {}).get("flops")
    print(f"AOT-compiled; XLA-estimated flops/call: {flops}")
    print("AOT energy:", float(compiled(species, coords)[0]))

    # --- jax.export: a serialized, Python-free executable ---------------
    try:
        from jax import export as jax_export

        exported = jax_export.export(jax.jit(lambda z, c: model(z, c)))(
            jax.ShapeDtypeStruct(species.shape, species.dtype),
            jax.ShapeDtypeStruct(coords.shape, coords.dtype),
        )
        blob = exported.serialize()
        roundtrip = jax_export.deserialize(blob)
        e = roundtrip.call(species, coords)
        print(f"exported blob: {len(blob)} bytes; reloaded energy {float(e[0]):.6f}")
    except Exception as err:  # jax.export availability varies by version
        print(f"jax.export unavailable here ({type(err).__name__}): {err}")

    # --- parameters only: state dict round trip -------------------------
    import numpy as np

    from torchani_tpu.convert import load_state_dict, save_state_dict

    with tempfile.TemporaryDirectory() as d:
        path = Path(d) / "model.npz"
        np.savez(path, **save_state_dict(model))
        sd = dict(np.load(path))
        reloaded = load_state_dict(
            tt.simple_ani(("H", "C", "N", "O"), ensemble_size=2), sd
        )
        print("state-dict reload energy:", float(reloaded(species, coords)[0]))


if __name__ == "__main__":
    main()
