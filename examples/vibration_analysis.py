"""Analytic vibrational frequencies from exact Hessians.

Analog of ``/root/reference/examples/vibration_analysis.py``. The reference
computes Hessians with a loop of backward passes; here one
forward-over-reverse ``jax.jacfwd(jax.grad)`` produces the whole batch of
Hessians, and ``vibrational_analysis`` diagonalizes the mass-weighted form.
Geometry optimization uses the built-in jitted FIRE minimizer instead of ASE.

    python examples/vibration_analysis.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import torchani_tpu as tt
    from torchani_tpu.grad import hessians, vibrational_analysis
    from torchani_tpu.optimize import minimize_fire
    from torchani_tpu.utils import get_atomic_masses

    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1,
                          key=jax.random.PRNGKey(0))
    species = jnp.asarray([[8, 1, 1]])  # water
    coords = jnp.asarray([[[0.0, 0.0, 0.12], [0.0, 0.77, -0.48],
                           [0.0, -0.77, -0.48]]])

    # 1) Relax the geometry (FIRE runs fully inside one jit).
    state = minimize_fire(lambda c: model(species, c[None])[0], coords,
                          max_steps=200, fmax=0.005)
    relaxed = state.coords[None]
    fmax = float(jnp.abs(state.forces).max())
    print(f"relaxed in {int(state.step)} steps, |F|max = {fmax:.5f} Ha/A")

    # 2) Exact Hessian (3A x 3A per molecule) in one jacfwd.
    h = hessians(model, species, relaxed)
    print("hessian shape:", h.shape)

    # 3) Normal-mode analysis (MDU modes, reference convention).
    masses = get_atomic_masses(species)
    vib = vibrational_analysis(masses, h, mode_type="MDU")
    freqs = [round(float(f), 1) for f in vib.freqs[0, -3:]]
    print("highest 3 wavenumbers (cm^-1):", freqs)
    print("force constants (mDyne/A), top 3:",
          [round(float(f), 3) for f in vib.fconstants[0, -3:]])


if __name__ == "__main__":
    main()
