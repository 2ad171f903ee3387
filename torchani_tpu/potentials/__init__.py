"""Analytical potentials (pair potentials, NNP adapter)."""

from torchani_tpu.potentials.core import (
    BasePairPotential,
    DummyPotential,
    Potential,
)
from torchani_tpu.potentials.nnp import NNPotential
from torchani_tpu.potentials.repulsion import RepulsionXTB, RepulsionZBL

__all__ = [
    "BasePairPotential",
    "DummyPotential",
    "Potential",
    "NNPotential",
    "RepulsionXTB",
    "RepulsionZBL",
]
