"""Using the ASE calculator interface.

Analog of ``/root/reference/examples/ase_interface.py``. ``torchani_tpu.ase``
exposes a standard ``ase.calculators`` Calculator wrapping any ANI model
(energy, forces, stress for periodic cells) so existing ASE scripts — NVT/NPT
dynamics, optimizers, phonons — work unchanged on top of the TPU stack.

ASE is not installed in this build environment, so this example degrades to a
message; with ase installed it runs a short Langevin NVT trajectory.

    python examples/ase_interface.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    try:
        import ase  # noqa: F401
        from ase.md.langevin import Langevin
        from ase import units
    except ImportError:
        print("ase is not installed in this environment — skipping. "
              "The calculator lives in torchani_tpu/ase.py; with ase "
              "installed: model.ase() or Calculator(model).")
        return

    import jax

    import torchani_tpu as tt
    from torchani_tpu.ase import Calculator

    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1,
                          key=jax.random.PRNGKey(0))
    from ase.build import molecule

    atoms = molecule("H2O")
    atoms.calc = Calculator(model)
    print("E =", atoms.get_potential_energy(), "eV")
    print("F[0] =", atoms.get_forces()[0])

    dyn = Langevin(atoms, 0.5 * units.fs, temperature_K=300, friction=0.02)
    dyn.run(20)
    print("after 20 NVT steps: E =", atoms.get_potential_energy(), "eV")


if __name__ == "__main__":
    main()
