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
        # Jitted runners cached per (kind, cell, pbc): the cell must be a
        # trace-time CONSTANT — the neighborlist derives its PBC repeat
        # count and static capacities from it on the host (a traced cell
        # cannot size static shapes).  Keyed by value, so a moving-cell
        # workflow (NPT relaxations) recompiles only on actual cell change.
        self._runners: tp.Dict[tp.Any, tp.Any] = {}

    def _runner(self, kind: str, cell, pbc):
        import jax
        import jax.numpy as jnp

        key = (
            kind,
            None if cell is None else np.asarray(cell).tobytes(),
            None if pbc is None else np.asarray(pbc).tobytes(),
        )
        fn = self._runners.get(key)
        if fn is None:
            cell_j = None if cell is None else jnp.asarray(cell)
            pbc_j = None if pbc is None else jnp.asarray(pbc)
            if kind == "ef":
                from torchani_tpu.grad import energies_and_forces

                fn = jax.jit(
                    lambda s, c: energies_and_forces(
                        self.model, s, c, cell_j, pbc_j
                    )
                )
            elif self.stress_kind == "scaling":
                from torchani_tpu.grad import stress_scaling

                fn = jax.jit(
                    lambda s, c: stress_scaling(self.model, s, c, cell_j, pbc_j)
                )
            else:
                from torchani_tpu.grad import stress_fdotr

                fn = jax.jit(
                    lambda s, c: stress_fdotr(self.model, s, c, cell_j, pbc_j)
                )
            self._runners[key] = fn
        return fn

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
            cell = np.asarray(atoms.cell, dtype=np.float32)
            pbc = np.asarray(atoms.pbc)
        else:
            cell = None
            pbc = None

        energies, forces = self._runner("ef", cell, pbc)(species, coords)
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
                s = np.asarray(
                    self._runner("stress", cell, pbc)(species, coords)
                )
                stress = full_3x3_to_voigt_6_stress(s * HARTREE_TO_EV)
            self.results["stress"] = stress
