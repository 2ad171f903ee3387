"""TorchANI-TPU: a TPU-native (JAX/XLA/Pallas) framework for ANI-style
neural network interatomic potentials.

A ground-up rebuild of the capabilities of TorchANI (the reference ANI
implementation) designed for TPU hardware: fixed-capacity padded neighbor
structures, masked one-hot contractions on the MXU, functional pytree models,
``jax.grad`` forces/Hessians, and ``shard_map`` data parallelism.
"""

from torchani_tpu import (
    cli,
    constants,
    cutoffs,
    datasets,
    electro,
    grad,
    io,
    legacy_data,
    md,
    models,
    neb,
    neighbors,
    neurochem,
    optimize,
    potentials,
    profiling,
    replica,
    sae,
    sae_estimation,
    transforms,
    units,
    utils,
)
from torchani_tpu.aev import AEVComputer
from torchani_tpu.arch import ANI, ANIq, Assembler, simple_ani, simple_aniq
from torchani_tpu.grad import single_point
from torchani_tpu.md import CachedSinglePoint
from torchani_tpu.nn import ANINetworks, AtomicNetworks, Ensemble, SpeciesConverter
from torchani_tpu.sae import EnergyShifter, SelfEnergy

__version__ = "0.1.0"

#: Legacy alias kept for reference API parity (/root/reference/torchani/nn.py
#: exported ``ANIModel`` as the pre-2.x name of ``ANINetworks``).
ANIModel = ANINetworks

__all__ = [
    "AEVComputer",
    "ANI",
    "ANIq",
    "ANIModel",
    "ANINetworks",
    "Assembler",
    "AtomicNetworks",
    "CachedSinglePoint",
    "Ensemble",
    "SelfEnergy",
    "EnergyShifter",
    "SpeciesConverter",
    "simple_ani",
    "simple_aniq",
    "single_point",
    "cli",
    "constants",
    "datasets",
    "electro",
    "io",
    "legacy_data",
    "md",
    "models",
    "neb",
    "neurochem",
    "optimize",
    "potentials",
    "profiling",
    "replica",
    "cutoffs",
    "grad",
    "neighbors",
    "sae",
    "sae_estimation",
    "transforms",
    "units",
    "utils",
]
