"""Atomic neural network containers."""

from torchani_tpu.nn.shared import ANISharedNetworks, SingleNN
from torchani_tpu.nn.containers import (
    ANINetworks,
    AtomicNetworks,
    AtomicNetworksDiscardFirstScalar,
    Ensemble,
    GenericEnsemble,
    SpeciesConverter,
    parse_activation,
)
from torchani_tpu.nn.core import (
    AtomicContainer,
    AtomicEmbedding,
    AtomicNetwork,
    AtomicOneHot,
    BmmAtomicNetwork,
    BmmEnsemble,
    BmmLinear,
    MNPNetworks,
    Sequential,
    TightCELU,
)

#: Legacy alias: the reference exports ``ANIModel`` as the pre-2.x name of
#: ``ANINetworks`` (reference ``nn/_internal.py:13-20``).
ANIModel = ANINetworks

__all__ = [
    "ANIModel",
    "ANISharedNetworks",
    "SingleNN",
    "ANINetworks",
    "AtomicNetworks",
    "AtomicNetworksDiscardFirstScalar",
    "GenericEnsemble",
    "AtomicContainer",
    "AtomicEmbedding",
    "AtomicNetwork",
    "AtomicOneHot",
    "BmmAtomicNetwork",
    "BmmEnsemble",
    "BmmLinear",
    "MNPNetworks",
    "Ensemble",
    "Sequential",
    "SpeciesConverter",
    "TightCELU",
    "parse_activation",
]
