"""Analytical potentials (pair potentials, NNP adapter)."""

from torchani_tpu.potentials.core import (
    BasePairPotential,
    DummyPotential,
    PairPotential,
    Potential,
)
from torchani_tpu.potentials.dispersion import TwoBodyDispersionD3
from torchani_tpu.potentials.fixed_coulomb import FixedCoulomb, FixedMNOK
from torchani_tpu.potentials.lj import DispersionLJ, LennardJones, RepulsionLJ
from torchani_tpu.potentials.nnp import NNPotential
from torchani_tpu.potentials.nnp_charges import (
    MergedChargesNNPotential,
    SeparateChargesNNPotential,
)
from torchani_tpu.potentials.repulsion import RepulsionXTB, RepulsionZBL

__all__ = [
    "BasePairPotential",
    "DummyPotential",
    "PairPotential",
    "Potential",
    "NNPotential",
    "MergedChargesNNPotential",
    "SeparateChargesNNPotential",
    "RepulsionXTB",
    "RepulsionZBL",
    "TwoBodyDispersionD3",
    "FixedCoulomb",
    "FixedMNOK",
    "LennardJones",
    "RepulsionLJ",
    "DispersionLJ",
]
