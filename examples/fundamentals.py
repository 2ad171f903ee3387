"""Fundamentals: computing energies, forces, and ensemble statistics.

TPU-native analog of the reference tutorial
``/root/reference/examples/fundamentals.py``. The main object here is a JAX
array instead of a torch Tensor, and a model is an immutable pytree you can
pass straight through ``jax.jit`` / ``jax.grad``.

    python examples/fundamentals.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import torchani_tpu as tt
    from torchani_tpu.grad import energies_and_forces

    # Pretrained zoo models (tt.models.ANI2x() etc.) need local weight files
    # in this offline environment, so this tutorial builds a randomly
    # initialised model with the same architecture instead.
    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=8,
                          key=jax.random.PRNGKey(0))

    # A single methane molecule. Models take atomic numbers (Z) and Angstrom
    # coordinates; batches are padded with Z = -1.
    species = jnp.asarray([[6, 1, 1, 1, 1]])
    coords = jnp.asarray(
        [[[0.03192167, 0.00638559, 0.01301679],
          [-0.83140486, 0.39370209, -0.26395324],
          [-0.66518241, -0.84461308, 0.20759389],
          [0.45554739, 0.54289633, 0.81170881],
          [0.66091919, -0.16799635, -0.91037834]]]
    )

    # Energy (Hartree). The model is a pytree, so pass it through jit as
    # an ARGUMENT — retracing only happens when shapes/statics change.
    efn = jax.jit(lambda m, z, c: m(z, c))
    energy = efn(model, species, coords)
    print(f"energy: {float(energy[0]):.6f} Ha")

    # Forces come from jax.grad; energies_and_forces fuses both in one pass.
    e, f = energies_and_forces(model, species, coords)
    print("force on atom 0:", [round(float(x), 4) for x in f[0, 0]])

    # Batching: pad species with -1 and coordinates with anything.
    batch_species = jnp.asarray([[6, 1, 1, 1, 1], [8, 1, 1, -1, -1]])
    batch_coords = jnp.concatenate(
        [coords, jnp.asarray([[[0.0, 0.0, 0.12], [0.0, 0.76, -0.48],
                               [0.0, -0.76, -0.48], [0.0, 0.0, 0.0],
                               [0.0, 0.0, 0.0]]])]
    )
    batch_e = efn(model, batch_species, batch_coords)
    print("batch energies:", [round(float(x), 6) for x in batch_e])

    # Ensembles expose query-by-committee statistics for active learning.
    out = model.energies_qbcs(batch_species, batch_coords)
    print("QBC uncertainty:", [round(float(x), 6) for x in out.qbcs])

    members = model.members_energies(batch_species, batch_coords)
    print(f"member spread (mol 0): {float(members[:, 0].std()):.6f} Ha")


if __name__ == "__main__":
    main()
