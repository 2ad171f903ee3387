"""Atomic constants and density-functional constants.

Physical-constants data ported from the reference implementation
(``/root/reference/torchani/constants.py:47-302`` and
``torchani/resources/*.json``); see ``tools/import_reference_data.py`` for the
provenance of the bundled resource files.  Citations for the values live in the
resource files' original papers (Cardenas et al. hardness, IUPAC 2013 masses,
Grimme D3/xTB parameter sets).

Everything in this module is plain Python data (dicts/tuples) — JAX arrays are
built lazily by the modules that consume them, so importing this module never
touches a device.
"""

import json
import math
import typing as tp
from functools import lru_cache

from torchani_tpu.paths import resources_dir

__all__ = [
    "ATOMIC_CONSTANTS",
    "ATOMIC_NUMBER",
    "ATOMIC_MASS",
    "ATOMIC_HARDNESS",
    "ATOMIC_COVALENT_RADIUS",
    "ATOMIC_SQRT_EMPIRICAL_CHARGE",
    "ATOMIC_ELECTRONEGATIVITY",
    "ATOMIC_XTB_REPULSION_ALPHA",
    "ATOMIC_XTB_REPULSION_YEFF",
    "MASS",
    "XTB_REPULSION_ALPHA",
    "XTB_REPULSION_YEFF",
    "COVALENT_RADIUS",
    "SQRT_EMPIRICAL_CHARGE",
    "HARDNESS",
    "ELECTRONEGATIVITY",
    "PERIODIC_TABLE",
    "FUNCTIONAL_D3BJ_CONSTANTS",
    "GSAES",
]


def _load_json(name: str) -> dict:
    with open(resources_dir() / name, "rt") as f:
        return json.load(f)


#: Per-element constants table: symbol -> {znumber, mass, hardness, ...}
ATOMIC_CONSTANTS: tp.Dict[str, tp.Dict[str, float]] = _load_json(
    "atomic_constants.json"
)

#: DFT-D3(BJ) damping parameters (s6, s8, a1, a2) per density functional
FUNCTIONAL_D3BJ_CONSTANTS: tp.Dict[str, tp.Dict[str, float]] = _load_json(
    "functional_d3bj_constants.json"
)

#: Ground-state atomic energies (Hartree), keyed by level-of-theory string
#: then by element symbol (reference ``constants.py:78-196``)
GSAES: tp.Dict[str, tp.Dict[str, float]] = _load_json("gsaes.json")


# Convenience per-property mappings (symbol -> value)
ATOMIC_NUMBER: tp.Dict[str, int] = {}
ATOMIC_HARDNESS: tp.Dict[str, float] = {}
ATOMIC_ELECTRONEGATIVITY: tp.Dict[str, float] = {}
ATOMIC_MASS: tp.Dict[str, float] = {}
ATOMIC_SQRT_EMPIRICAL_CHARGE: tp.Dict[str, float] = {}
ATOMIC_COVALENT_RADIUS: tp.Dict[str, float] = {}
ATOMIC_XTB_REPULSION_ALPHA: tp.Dict[str, float] = {}
ATOMIC_XTB_REPULSION_YEFF: tp.Dict[str, float] = {}

_PROPERTY_TARGETS = (
    ("znumber", ATOMIC_NUMBER, int),
    ("hardness", ATOMIC_HARDNESS, float),
    ("electronegativity", ATOMIC_ELECTRONEGATIVITY, float),
    ("mass", ATOMIC_MASS, float),
    ("sqrt_empirical_charge", ATOMIC_SQRT_EMPIRICAL_CHARGE, float),
    ("covalent_radius", ATOMIC_COVALENT_RADIUS, float),
    ("xtb_repulsion_alpha", ATOMIC_XTB_REPULSION_ALPHA, float),
    ("xtb_repulsion_yeff", ATOMIC_XTB_REPULSION_YEFF, float),
)

for _symbol, _values in ATOMIC_CONSTANTS.items():
    if not _symbol:
        continue
    for _key, _target, _cast in _PROPERTY_TARGETS:
        _v = _values.get(_key)
        if _v is not None:
            _target[_symbol] = _cast(_v)

#: ``PERIODIC_TABLE[z]`` is the chemical symbol of atomic number ``z``
#: (index 0 is the empty string)
PERIODIC_TABLE: tp.Tuple[str, ...] = ("",) + tuple(
    kv[0] for kv in sorted(ATOMIC_NUMBER.items(), key=lambda kv: kv[1])
)


def mapping_to_znumber_indexed_seq(
    symbols_map: tp.Mapping[str, float],
) -> tp.Tuple[float, ...]:
    """Sort values of a {symbol: value} map by atomic number.

    Output index 0 (the non-element) is NaN.  All atomic numbers up to the
    highest present must be covered by the mapping.
    """
    seq = [math.nan] * (len(symbols_map) + 1)
    try:
        for k, v in symbols_map.items():
            seq[ATOMIC_NUMBER[k]] = v
    except IndexError:
        raise ValueError(f"There are missing elements in {symbols_map}") from None
    return tuple(seq)


def znumber_indexed_seq_to_mapping(
    seq: tp.Sequence[float],
) -> tp.Dict[str, float]:
    """Inverse of `mapping_to_znumber_indexed_seq`."""
    if not math.isnan(seq[0]):
        raise ValueError("The first element of the input iterable must be NaN")
    return {PERIODIC_TABLE[j]: v for j, v in enumerate(seq) if j != 0}


# znumber-indexed tuples (index 0 = NaN)
MASS = mapping_to_znumber_indexed_seq(ATOMIC_MASS)
ELECTRONEGATIVITY = mapping_to_znumber_indexed_seq(ATOMIC_ELECTRONEGATIVITY)
HARDNESS = mapping_to_znumber_indexed_seq(ATOMIC_HARDNESS)
COVALENT_RADIUS = mapping_to_znumber_indexed_seq(ATOMIC_COVALENT_RADIUS)
SQRT_EMPIRICAL_CHARGE = mapping_to_znumber_indexed_seq(ATOMIC_SQRT_EMPIRICAL_CHARGE)
XTB_REPULSION_ALPHA = mapping_to_znumber_indexed_seq(ATOMIC_XTB_REPULSION_ALPHA)
XTB_REPULSION_YEFF = mapping_to_znumber_indexed_seq(ATOMIC_XTB_REPULSION_YEFF)


@lru_cache(maxsize=None)
def load_c6_constants() -> tp.Dict[str, "tp.Any"]:
    """Load the DFT-D3 reference-C6 interpolation tables.

    Returns a dict with arrays ``constants``, ``coordnums_a``, ``coordnums_b``
    each of shape ``(95, 95, 5, 5)`` (indexed by the two atomic numbers and
    the 5x5 reference-coordination grid).  Missing grid entries are marked
    with negative values in ``constants``.
    """
    import numpy as np

    with np.load(resources_dir() / "c6_constants.npz") as data:
        return {
            "constants": np.asarray(data["all.constants"]),
            "coordnums_a": np.asarray(data["all.coordnums_a"]),
            "coordnums_b": np.asarray(data["all.coordnums_b"]),
        }
