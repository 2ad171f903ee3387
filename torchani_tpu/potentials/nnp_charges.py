"""Charge-predicting NN potentials.

Counterparts of ``MergedChargesNNPotential``/``SeparateChargesNNPotential``
(``/root/reference/torchani/potentials/nnp.py:29-102``): networks that emit
per-atom charges alongside (or separately from) energies, normalized so the
total matches the molecular charge.
"""

import typing as tp

import jax.numpy as jnp
from flax import struct

from torchani_tpu.annotations import Array
from torchani_tpu.electro import ChargeNormalizer
from torchani_tpu.neighbors import Neighbors
from torchani_tpu.potentials.nnp import NNPotential
from torchani_tpu.tuples import EnergiesScalars

__all__ = ["MergedChargesNNPotential", "SeparateChargesNNPotential"]


class MergedChargesNNPotential(NNPotential):
    """One network with a 2-wide output head: ``[:, 0]`` energy, ``[:, 1]`` charge."""

    charge_normalizer: tp.Optional[ChargeNormalizer] = None

    @classmethod
    def make(
        cls,
        symbols: tp.Sequence[str],
        aev_computer,
        neural_networks,
        charge_normalizer: tp.Optional[ChargeNormalizer] = None,
    ) -> "MergedChargesNNPotential":
        if charge_normalizer is None:
            charge_normalizer = ChargeNormalizer.make(tuple(symbols))
        return cls(
            symbols=tuple(symbols),
            cutoff=aev_computer.radial.cutoff,
            aev_computer=aev_computer,
            neural_networks=neural_networks,
            charge_normalizer=charge_normalizer,
        )

    def compute_from_neighbors(
        self,
        elem_idxs: Array,
        coords: tp.Optional[Array],
        neighbors: Neighbors,
        charge: int = 0,
        atomic: bool = False,
        ensemble_values: bool = False,
        ghost_flags: tp.Optional[Array] = None,
    ) -> EnergiesScalars:
        aevs = self.aev_computer.compute_from_neighbors(elem_idxs, coords, neighbors)
        # networks output per-atom (..., C, A, 2): energies and raw charges
        out = self.neural_networks(
            elem_idxs, aevs, atomic=True, ensemble_values=ensemble_values
        )
        energies = out[..., 0]
        raw_qs = out[..., 1]
        if not atomic:
            energies = jnp.sum(energies, axis=-1)
        qs = self.charge_normalizer(elem_idxs, raw_qs, charge)
        return EnergiesScalars(energies, qs)


class SeparateChargesNNPotential(NNPotential):
    """Independent energy and charge networks over shared AEVs."""

    charge_networks: tp.Any = None
    charge_normalizer: tp.Optional[ChargeNormalizer] = None

    @classmethod
    def make(
        cls,
        symbols: tp.Sequence[str],
        aev_computer,
        neural_networks,
        charge_networks,
        charge_normalizer: tp.Optional[ChargeNormalizer] = None,
    ) -> "SeparateChargesNNPotential":
        if charge_normalizer is None:
            charge_normalizer = ChargeNormalizer.make(tuple(symbols))
        return cls(
            symbols=tuple(symbols),
            cutoff=aev_computer.radial.cutoff,
            aev_computer=aev_computer,
            neural_networks=neural_networks,
            charge_networks=charge_networks,
            charge_normalizer=charge_normalizer,
        )

    def compute_from_neighbors(
        self,
        elem_idxs: Array,
        coords: tp.Optional[Array],
        neighbors: Neighbors,
        charge: int = 0,
        atomic: bool = False,
        ensemble_values: bool = False,
        ghost_flags: tp.Optional[Array] = None,
    ) -> EnergiesScalars:
        aevs = self.aev_computer.compute_from_neighbors(elem_idxs, coords, neighbors)
        energies = self.neural_networks(
            elem_idxs, aevs, atomic=atomic, ensemble_values=ensemble_values
        )
        raw_qs = self.charge_networks(elem_idxs, aevs, atomic=True)
        qs = self.charge_normalizer(elem_idxs, raw_qs, charge)
        return EnergiesScalars(energies, qs)
