"""ASE Calculator glue, tested against a minimal stubbed ``ase`` package.

The real ``ase`` is not installed in this environment, so these tests
register a spec-faithful stub (base Calculator contract, ``all_changes``,
``full_3x3_to_voigt_6_stress``) before importing `torchani_tpu.ase`.  The
underlying physics (analytic vs numerical stress) is already covered by
`tests/test_gradcheck.py`; what is validated here is the Calculator
surface the reference ships (``/root/reference/torchani/ase.py:32-173``):
result keys, eV unit conversion, Voigt stress, PBC handling and errors.
"""

import importlib
import sys
import types

import numpy as np
import pytest

import torchani_tpu as tt


def _install_ase_stub():
    if "ase" in sys.modules and getattr(sys.modules["ase"], "_tt_stub", False):
        return sys.modules["ase"]

    ase = types.ModuleType("ase")
    ase._tt_stub = True
    calculators = types.ModuleType("ase.calculators")
    calculator = types.ModuleType("ase.calculators.calculator")
    stress_mod = types.ModuleType("ase.stress")

    all_changes = [
        "positions", "numbers", "cell", "pbc", "initial_charges",
        "initial_magmoms",
    ]

    class Calculator:
        def __init__(self, restart=None, label=None, atoms=None, **kwargs):
            self.results = {}
            self.atoms = atoms

        def calculate(self, atoms=None, properties=("energy",),
                      system_changes=all_changes):
            if atoms is not None:
                self.atoms = atoms
            self.results = {}

    def full_3x3_to_voigt_6_stress(s):
        s = np.asarray(s)
        return np.array([
            s[0, 0], s[1, 1], s[2, 2],
            (s[1, 2] + s[2, 1]) / 2,
            (s[0, 2] + s[2, 0]) / 2,
            (s[0, 1] + s[1, 0]) / 2,
        ])

    calculator.Calculator = Calculator
    calculator.all_changes = all_changes
    stress_mod.full_3x3_to_voigt_6_stress = full_3x3_to_voigt_6_stress
    ase.calculators = calculators
    calculators.calculator = calculator
    ase.stress = stress_mod
    sys.modules["ase"] = ase
    sys.modules["ase.calculators"] = calculators
    sys.modules["ase.calculators.calculator"] = calculator
    sys.modules["ase.stress"] = stress_mod
    return ase


class _Atoms:
    """Just enough of ase.Atoms for the Calculator."""

    def __init__(self, numbers, positions, cell=None, pbc=False):
        self.numbers = np.asarray(numbers)
        self.positions = np.asarray(positions, dtype=float)
        self.cell = np.zeros((3, 3)) if cell is None else np.asarray(cell)
        self.pbc = np.asarray([pbc] * 3 if isinstance(pbc, bool) else pbc)


@pytest.fixture(scope="module")
def ase_mod():
    _install_ase_stub()
    import torchani_tpu.ase as tase

    return importlib.reload(tase)


@pytest.fixture(scope="module")
def model():
    return tt.simple_ani(("H", "O"), ensemble_size=1)


def test_energy_forces_ev_units(ase_mod, model):
    import jax.numpy as jnp

    from torchani_tpu.units import HARTREE_TO_EV

    calc = ase_mod.Calculator(model)
    numbers = [8, 1, 1]
    pos = [[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]]
    atoms = _Atoms(numbers, pos)
    calc.calculate(atoms, properties=["energy", "forces"])
    out = tt.single_point(
        model, jnp.asarray([numbers]), jnp.asarray([pos], jnp.float32),
        forces=True,
    )
    assert calc.results["energy"] == pytest.approx(
        float(out["energies"][0]) * HARTREE_TO_EV, rel=1e-6
    )
    assert calc.results["free_energy"] == calc.results["energy"]
    np.testing.assert_allclose(
        calc.results["forces"],
        np.asarray(out["forces"][0]) * HARTREE_TO_EV,
        atol=1e-5,
    )


def test_stress_kinds_agree(ase_mod, model):
    from torchani_tpu.testing import make_water_box

    species, coords, cell = make_water_box(24)
    atoms = _Atoms(
        np.asarray(species[0]), np.asarray(coords[0]), cell=np.asarray(cell),
        pbc=True,
    )
    results = {}
    for kind in ("scaling", "fdotr"):
        calc = ase_mod.Calculator(model, stress_kind=kind)
        calc.calculate(atoms, properties=["energy", "forces", "stress"])
        stress = calc.results["stress"]
        assert stress.shape == (6,)
        results[kind] = stress
    np.testing.assert_allclose(
        results["scaling"], results["fdotr"], atol=5e-6
    )


def test_stress_without_cell_raises(ase_mod, model):
    calc = ase_mod.Calculator(model)
    atoms = _Atoms([8, 1, 1], np.random.RandomState(0).rand(3, 3) * 2)
    with pytest.raises(RuntimeError, match="periodic cell"):
        calc.calculate(atoms, properties=["energy", "stress"])


def test_bad_stress_kind_raises(ase_mod, model):
    with pytest.raises(ValueError, match="stress kind"):
        ase_mod.Calculator(model, stress_kind="bogus")
