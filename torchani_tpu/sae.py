"""1-body self energies (ground-state atomic energies).

Counterpart of ``/root/reference/torchani/sae.py:16-64``.
"""

import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array, Symbols
from torchani_tpu.constants import ATOMIC_NUMBER, GSAES

__all__ = ["SelfEnergy", "EnergyShifter", "sorted_gsaes"]


def sorted_gsaes(
    symbols: tp.Sequence[str], functional: str, basis_set: str
) -> tp.List[float]:
    """GSAEs for ``symbols`` in order; functional/basis are case-insensitive."""
    gsaes = GSAES[f"{functional.lower()}-{basis_set.lower()}"]
    return [gsaes[e] for e in symbols]


class SelfEnergy(struct.PyTreeNode):
    """Adds constant atomic energies depending only on the element."""

    self_energies: Array  # (S,)
    symbols: Symbols = struct.field(pytree_node=False)
    enabled: bool = struct.field(pytree_node=False, default=True)

    @property
    def atomic_numbers(self) -> tp.Tuple[int, ...]:
        return tuple(ATOMIC_NUMBER[s] for s in self.symbols)

    @classmethod
    def make(
        cls, symbols: tp.Sequence[str], self_energies: tp.Sequence[float]
    ) -> "SelfEnergy":
        symbols = tuple(symbols)
        if len(self_energies) != len(symbols):
            raise ValueError("self_energies must have one value per symbol")
        return cls(
            self_energies=jnp.asarray(np.asarray(self_energies, dtype=np.float64).astype(np.float32)),
            symbols=symbols,
        )

    @classmethod
    def with_gsaes(
        cls, symbols: tp.Sequence[str], functional: str, basis_set: str
    ) -> "SelfEnergy":
        """Instantiate with ground-state atomic energies for a level of theory."""
        return cls.make(symbols, sorted_gsaes(symbols, functional, basis_set))

    @classmethod
    def from_lot(cls, symbols: tp.Sequence[str], lot: str) -> "SelfEnergy":
        """``lot`` is e.g. ``"wb97x-631gd"`` (functional-basis)."""
        functional, basis = lot.split("-")
        return cls.with_gsaes(symbols, functional, basis)

    def __call__(self, elem_idxs: Array, atomic: bool = False) -> Array:
        e = jnp.take(self.self_energies, jnp.where(elem_idxs < 0, 0, elem_idxs), axis=0)
        e = jnp.where(elem_idxs < 0, 0.0, e)
        if atomic:
            return e
        return jnp.sum(e, axis=-1)


#: Backwards-compatible alias (the reference exported ``EnergyShifter``)
EnergyShifter = SelfEnergy
