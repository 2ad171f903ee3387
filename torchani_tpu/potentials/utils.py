"""Pair-potential inspection helpers.

TPU-native counterpart of ``/root/reference/torchani/potentials/utils.py:20-98``
(the matplotlib curve plotter for ``PairPotential``).  Instead of a Python
loop of per-distance model calls, the whole r-grid is evaluated as ONE
batched dimer system — ``(steps, 2)`` atoms — in a single jitted call, and
forces come from one ``jax.grad`` through that batch.  `pair_curves` is the
array-returning core (testable without matplotlib); `plot` wraps it.
"""

import itertools
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from torchani_tpu.constants import ATOMIC_NUMBER
from torchani_tpu.potentials.core import BasePairPotential
from torchani_tpu.units import ANGSTROM_TO_BOHR, HARTREE_TO_EV, HARTREE_TO_KCALPERMOL

__all__ = ["pair_curves", "plot"]

_EFACTORS = {"ev": HARTREE_TO_EV, "kcalpermol": HARTREE_TO_KCALPERMOL, "hartree": 1.0}
_RFACTORS = {"angstrom": 1.0, "bohr": ANGSTROM_TO_BOHR}


def pair_curves(
    pot: BasePairPotential,
    symbol_pairs: tp.Sequence[tp.Tuple[str, str]] = (),
    xmin: float = 0.1,
    xmax: tp.Optional[float] = None,
    steps: int = 1000,
    force: bool = False,
    eunits: str = "hartree",
    runits: str = "angstrom",
) -> tp.Tuple[np.ndarray, tp.Dict[tp.Tuple[str, str], np.ndarray]]:
    """Dimer energy (or force-on-atom-0-along-r) curves for element pairs.

    Returns ``(r, {pair: values})`` with ``r`` in ``runits`` and values in
    ``eunits`` (/ ``runits`` for forces).  Defaults match the reference
    plotter: all ``combinations_with_replacement`` of the potential's
    symbols, 1000 steps from 0.1 A to the cutoff (or 10 A if infinite).
    """
    efactor = _EFACTORS.get(eunits.lower())
    if efactor is None:
        raise ValueError(
            f"Unsupported unit {eunits}. Supported are {set(_EFACTORS)}"
        )
    rfactor = _RFACTORS.get(runits.lower())
    if rfactor is None:
        raise ValueError(
            f"Unsupported unit {runits}. Supported are {set(_RFACTORS)}"
        )
    if not symbol_pairs:
        symbol_pairs = tuple(
            itertools.combinations_with_replacement(pot.symbols, 2)
        )
    if xmax is None:
        xmax = pot.cutoff if not math.isinf(pot.cutoff) else 10.0
    # r is generated in display units then converted to Angstrom internally
    # (mirrors the reference, which multiplies by rfactor before the call —
    # a bohr-axis plot samples the same numeric grid).
    r_display = np.linspace(xmin, xmax, steps, dtype=np.float32)
    r_ang = jnp.asarray(r_display * rfactor)

    def batch_energies(r: jnp.ndarray, atomic_nums: jnp.ndarray) -> jnp.ndarray:
        coords = jnp.zeros((r.shape[0], 2, 3), dtype=r.dtype)
        coords = coords.at[:, 0, 0].set(r)
        return pot(atomic_nums, coords) * efactor

    if force:
        # d/dr in display units: chain rule picks up rfactor
        def per_pair(r, atomic_nums):
            grads = jax.grad(lambda rr: jnp.sum(batch_energies(rr, atomic_nums)))(r)
            return -grads * rfactor

        fn = jax.jit(per_pair)
    else:
        fn = jax.jit(batch_energies)

    curves: tp.Dict[tp.Tuple[str, str], np.ndarray] = {}
    for pair in symbol_pairs:
        atomic_nums = np.zeros((steps, 2), dtype=np.int32)
        atomic_nums[:, 0] = ATOMIC_NUMBER[pair[0]]
        atomic_nums[:, 1] = ATOMIC_NUMBER[pair[1]]
        curves[tuple(pair)] = np.asarray(fn(r_ang, jnp.asarray(atomic_nums)))
    return r_display, curves


def plot(
    pot: BasePairPotential,
    title: str = "",
    symbol_pairs: tp.Sequence[tp.Tuple[str, str]] = (),
    xmin: float = 0.1,
    xmax: tp.Optional[float] = None,
    ymin: tp.Optional[float] = None,
    ymax: tp.Optional[float] = None,
    steps: int = 1000,
    force: bool = False,
    eunits: str = "hartree",
    runits: str = "angstrom",
    ylog: bool = False,
    block: bool = True,
) -> None:
    """Plot dimer curves for a pair potential (reference-parity signature)."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:
        raise RuntimeError(
            "Please install matplotlib to plot this potential"
        ) from e
    r, curves = pair_curves(
        pot,
        symbol_pairs=symbol_pairs,
        xmin=xmin,
        xmax=xmax,
        steps=steps,
        force=force,
        eunits=eunits,
        runits=runits,
    )
    fig, ax = plt.subplots()
    for (s0, s1), values in curves.items():
        ax.plot(r, values, label=f"{s0}-{s1}")
    ax.legend()
    if not title:
        title = pot.__class__.__name__
    if title != "no":
        ax.set_title(title)
    runit_sym = {"angstrom": r"\AA", "bohr": r"a_0"}[runits.lower()]
    eunit_sym = {
        "hartree": r"E_h",
        "ev": r"\mathrm{eV}",
        "kcalpermol": r"\text{kcal}/\text{mol}",
    }[eunits.lower()]
    ax.set_xlabel(r"Inter atomic distance, $\left(" f"{runit_sym}" r"\right)$")
    if force:
        ax.set_ylabel(r"Force, $\left(" f"{eunit_sym}/{runit_sym}" r"\right)$")
    else:
        ax.set_ylabel(r"Energy, $\left(" f"{eunit_sym}" r"\right)$")
    if ylog:
        ax.set_yscale("log")
    ax.set_ylim(ymin, ymax)
    plt.show(block=block)
