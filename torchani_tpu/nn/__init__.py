"""Atomic neural network containers."""

from torchani_tpu.nn.shared import ANISharedNetworks, SingleNN
from torchani_tpu.nn.containers import (
    ANINetworks,
    AtomicNetworks,
    Ensemble,
    SpeciesConverter,
    parse_activation,
)

__all__ = [
    "ANISharedNetworks",
    "SingleNN",
    "ANINetworks",
    "AtomicNetworks",
    "Ensemble",
    "SpeciesConverter",
    "parse_activation",
]
