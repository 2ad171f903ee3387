"""ASE calculator adapter.

Counterpart of ``/root/reference/torchani/ase.py:32-173``: implements
energy/free_energy/forces/stress through the jitted model, with the three
stress kinds (``scaling`` strain trick, ``fdotr`` virial, ``numerical``).
The ``ase`` package is an optional dependency — importing this module without
it raises an informative error only on use.
"""

import typing as tp

import numpy as np

from torchani_tpu.units import HARTREE_TO_EV

__all__ = ["Calculator"]

try:
    import ase.calculators.calculator as _ase_calc

    _BASE: tp.Any = _ase_calc.Calculator
    _ASE_AVAILABLE = True
except ImportError:  # pragma: no cover - environment dependent
    _BASE = object
    _ASE_AVAILABLE = False


class Calculator(_BASE):
    """ASE calculator backed by a `torchani_tpu.arch.ANI` model.

    Energies are returned in eV and forces in eV/Angstrom (ASE units).
    """

    implemented_properties = ["energy", "forces", "stress", "free_energy"]

    def __init__(
        self,
        model,
        overwrite: bool = False,
        stress_kind: str = "scaling",
        **kwargs,
    ):
        if not _ASE_AVAILABLE:
            raise ImportError(
                "The 'ase' package is required for torchani_tpu.ase.Calculator"
            )
        super().__init__(**kwargs)
        import jax

        self.model = model
        self.overwrite = overwrite
        if stress_kind not in ("scaling", "fdotr", "numerical"):
            raise ValueError(f"Unsupported stress kind: {stress_kind}")
        self.stress_kind = stress_kind
        self._jit_ef = jax.jit(self._energy_and_forces)
        self._jit_stress = jax.jit(self._stress)

    def _energy_and_forces(self, species, coords, cell, pbc):
        from torchani_tpu.grad import energies_and_forces

        return energies_and_forces(self.model, species, coords, cell, pbc)

    def _stress(self, species, coords, cell, pbc):
        from torchani_tpu.grad import stress_scaling, stress_fdotr

        if self.stress_kind == "scaling":
            return stress_scaling(self.model, species, coords, cell, pbc)
        return stress_fdotr(self.model, species, coords, cell, pbc)

    def calculate(self, atoms=None, properties=("energy",), system_changes=None):
        import jax.numpy as jnp
        from ase.calculators.calculator import all_changes
        from ase.stress import full_3x3_to_voigt_6_stress

        super().calculate(
            atoms, list(properties), system_changes or all_changes
        )
        atoms = self.atoms
        species = jnp.asarray(np.asarray(atoms.numbers, dtype=np.int64)[None])
        coords = jnp.asarray(
            np.asarray(atoms.positions, dtype=np.float32)[None]
        )
        if atoms.pbc.any():
            cell = jnp.asarray(np.asarray(atoms.cell, dtype=np.float32))
            pbc = jnp.asarray(np.asarray(atoms.pbc))
        else:
            cell = None
            pbc = None

        energies, forces = self._jit_ef(species, coords, cell, pbc)
        energy = float(np.asarray(energies)[0]) * HARTREE_TO_EV
        self.results["energy"] = energy
        self.results["free_energy"] = energy
        self.results["forces"] = (
            np.asarray(forces)[0] * HARTREE_TO_EV
        )

        if "stress" in properties:
            if cell is None:
                raise RuntimeError("Stress requires a periodic cell")
            if self.stress_kind == "numerical":
                stress = self.calculate_numerical_stress(atoms)
            else:
                s = np.asarray(self._jit_stress(species, coords, cell, pbc))
                stress = full_3x3_to_voigt_6_stress(s * HARTREE_TO_EV)
            self.results["stress"] = stress
