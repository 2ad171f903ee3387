"""Atomic neural network containers."""

from torchani_tpu.nn.containers import (
    ANINetworks,
    AtomicNetworks,
    Ensemble,
    SpeciesConverter,
    parse_activation,
)

__all__ = [
    "ANINetworks",
    "AtomicNetworks",
    "Ensemble",
    "SpeciesConverter",
    "parse_activation",
]
