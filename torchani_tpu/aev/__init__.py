"""Atomic environment vector (AEV) computation."""

from torchani_tpu.aev.computer import AEVComputer
from torchani_tpu.aev.terms import (
    ANIAngular,
    ANIRadial,
    Angular,
    AngularArg,
    BaseAngular,
    BaseRadial,
    Radial,
    RadialArg,
    parse_angular_term,
    parse_radial_term,
)

__all__ = [
    "AEVComputer",
    "ANIAngular",
    "ANIRadial",
    "Angular",
    "AngularArg",
    "Radial",
    "RadialArg",
    "BaseAngular",
    "BaseRadial",
    "parse_angular_term",
    "parse_radial_term",
]
