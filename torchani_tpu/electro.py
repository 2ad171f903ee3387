"""Utilities for charged systems: charge normalization and dipoles.

Counterpart of ``/root/reference/torchani/electro.py:22-179``.
"""

import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array, Symbols
from torchani_tpu.constants import ATOMIC_NUMBER, ELECTRONEGATIVITY, HARDNESS
from torchani_tpu.utils import get_atomic_masses

__all__ = [
    "BaseChargeNormalizer",
    "ChargeNormalizer",
    "DipoleComputer",
    "compute_dipole",
]

Reference = tp.Literal["center_of_mass", "center_of_geometry", "origin"]


class BaseChargeNormalizer(struct.PyTreeNode):
    """No-op normalizer base (reference ``electro.py:22-26``): passes raw
    charges through.  Subclass and override ``__call__`` to normalize."""

    def __call__(
        self, elem_idxs: Array, raw_charges: Array, charge: tp.Union[int, Array] = 0
    ) -> Array:
        return raw_charges


class ChargeNormalizer(struct.PyTreeNode):
    """Redistribute excess charge so atomic charges sum to the total charge.

    Excess is distributed proportionally to per-element weights (by default
    all-ones; `from_electronegativity_and_hardness` uses (chi/eta)^2).
    """

    weights: Array  # (S,)
    symbols: Symbols = struct.field(pytree_node=False)
    scale_weights_by_charges_squared: bool = struct.field(
        pytree_node=False, default=False
    )

    @classmethod
    def make(
        cls,
        symbols: tp.Sequence[str],
        weights: tp.Sequence[float] = (),
        scale_weights_by_charges_squared: bool = False,
    ) -> "ChargeNormalizer":
        symbols = tuple(symbols)
        if not weights:
            weights = [1.0] * len(symbols)
        return cls(
            weights=jnp.asarray(np.asarray(weights, dtype=np.float32)),
            symbols=symbols,
            scale_weights_by_charges_squared=scale_weights_by_charges_squared,
        )

    @classmethod
    def from_electronegativity_and_hardness(
        cls,
        symbols: tp.Sequence[str],
        electronegativity: tp.Sequence[float] = (),
        hardness: tp.Sequence[float] = (),
        scale_weights_by_charges_squared: bool = False,
    ) -> "ChargeNormalizer":
        znums = [ATOMIC_NUMBER[s] for s in symbols]
        if not electronegativity:
            electronegativity = [ELECTRONEGATIVITY[z] for z in znums]
        if not hardness:
            hardness = [HARDNESS[z] for z in znums]
        weights = [(e / h) ** 2 for e, h in zip(electronegativity, hardness)]
        return cls.make(symbols, weights, scale_weights_by_charges_squared)

    def factor(self, elem_idxs: Array, raw_charges: Array) -> Array:
        w = jnp.take(self.weights, jnp.where(elem_idxs < 0, 0, elem_idxs), axis=0)
        w = jnp.where(elem_idxs < 0, 0.0, w)
        if self.scale_weights_by_charges_squared:
            w = w * raw_charges**2
        return w / jnp.sum(w, axis=-1, keepdims=True)

    def __call__(
        self, elem_idxs: Array, raw_charges: Array, charge: tp.Union[int, Array] = 0
    ) -> Array:
        excess = charge - jnp.sum(raw_charges, axis=-1, keepdims=True)
        return raw_charges + excess * self.factor(elem_idxs, raw_charges)


class DipoleComputer(struct.PyTreeNode):
    """Callable dipole computer (reference ``electro.py:120-179``).

    Functional wrapper over :func:`compute_dipole` with a fixed reference
    frame; custom per-element masses are accepted for mass-weighted centers.
    """

    reference: Reference = struct.field(pytree_node=False, default="center_of_mass")
    masses: tp.Optional[Array] = None  # optional custom masses keyed by znum

    @classmethod
    def make(
        cls,
        masses: tp.Iterable[float] = (),
        reference: Reference = "center_of_mass",
    ) -> "DipoleComputer":
        m = tuple(masses)
        return cls(
            reference=reference,
            masses=None if not m else jnp.asarray(np.asarray(m, np.float32)),
        )

    def __call__(
        self, species: Array, coordinates: Array, charges: Array
    ) -> Array:
        if self.masses is not None and self.reference == "center_of_mass":
            mask = species < 0
            w = jnp.take(self.masses, jnp.where(mask, 0, species), axis=0)
            w = jnp.where(mask, 0.0, w)
            w = w / jnp.sum(w, axis=-1, keepdims=True)
            center = jnp.sum(coordinates * w[..., None], axis=1, keepdims=True)
            coordinates = jnp.where(mask[..., None], 0.0, coordinates - center)
            return jnp.sum(charges[..., None] * coordinates, axis=1)
        return compute_dipole(species, coordinates, charges, self.reference)


def compute_dipole(
    species: Array,  # (C, A) atomic numbers, -1 padding
    coordinates: Array,  # (C, A, 3)
    charges: Array,  # (C, A) in e
    reference: Reference = "center_of_mass",
) -> Array:
    """Dipoles (e*Angstrom), shape ``(C, 3)``, about a reference frame."""
    mask = species < 0
    if reference != "origin":
        if reference == "center_of_mass":
            weights = get_atomic_masses(species)
        elif reference == "center_of_geometry":
            weights = (~mask).astype(coordinates.dtype)
        else:
            raise ValueError(f"Unsupported reference: {reference}")
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
        center = jnp.sum(coordinates * weights[..., None], axis=1, keepdims=True)
        coordinates = jnp.where(mask[..., None], 0.0, coordinates - center)
    return jnp.sum(charges[..., None] * coordinates, axis=1)
