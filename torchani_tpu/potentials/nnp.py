"""The neural-network potential as a `Potential` term.

Adapter wrapping (AEVComputer + atomic networks) so the NN is just another
term in a model's potentials dict — counterpart of
``/root/reference/torchani/potentials/nnp.py:14-102``.
"""

import math
import typing as tp

import jax.numpy as jnp
from flax import struct

from torchani_tpu.aev import AEVComputer
from torchani_tpu.annotations import Array
from torchani_tpu.neighbors import Neighbors
from torchani_tpu.potentials.core import Potential
from torchani_tpu.tuples import EnergiesScalars

__all__ = ["NNPotential"]


class NNPotential(Potential):
    aev_computer: AEVComputer = None
    neural_networks: tp.Any = None  # AtomicNetworks | Ensemble

    @classmethod
    def make(
        cls,
        symbols: tp.Sequence[str],
        aev_computer: AEVComputer,
        neural_networks,
    ) -> "NNPotential":
        return cls(
            symbols=tuple(symbols),
            cutoff=aev_computer.radial.cutoff,
            aev_computer=aev_computer,
            neural_networks=neural_networks,
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
        return EnergiesScalars(energies)
