"""Dump optimized HLO of the force-training chunk (see profile_training.py).

Writes /tmp/train_hlo.txt; grep the hot fusion names from the profile in it
to map them to source lines (metadata op_name/source_file fields).

    python tools/dump_training_hlo.py [--angular-capacity=N]
"""

import sys
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
    species, coords = make_molecs(2560, 26, seed=0)
    batch = {
        "species": jnp.asarray(species),
        "coordinates": jnp.asarray(coords),
        "energies": jnp.asarray(
            np.random.RandomState(1).randn(2560).astype(np.float32)
        ),
        "forces": jnp.zeros_like(jnp.asarray(coords)),
    }
    if "--partition" in sys.argv:
        from torchani_tpu.training import tune_species_partition

        model = tune_species_partition(model, [batch])
    init_fn, step_fn = make_train_step(
        model, optax.adamw(1e-3), force_training=True
    )
    state = init_fn()

    # batch rides as a jit ARGUMENT (traced species) to match
    # profile_training.py exactly — a closed-over concrete batch would
    # compile the static-species specialization, different fusions
    @jax.jit
    def chunk(state, batch):
        def body(st, _):
            st, metrics = step_fn(st, batch)
            return st, metrics["loss"]

        return jax.lax.scan(body, state, None, length=3)

    print("lowering+compiling...", flush=True)
    compiled = chunk.lower(state, batch).compile()
    text = compiled.as_text()
    Path("/tmp/train_hlo.txt").write_text(text)
    print(f"wrote /tmp/train_hlo.txt ({len(text)} chars)", flush=True)


if __name__ == "__main__":
    main()
