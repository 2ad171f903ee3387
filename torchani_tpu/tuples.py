"""Output NamedTuples (pytree-compatible result containers).

Counterparts of ``/root/reference/torchani/tuples.py``.
"""

import typing as tp

from torchani_tpu.annotations import Array


class SpeciesEnergies(tp.NamedTuple):
    species: Array
    energies: Array


class SpeciesAEV(tp.NamedTuple):
    species: Array
    aevs: Array


class SpeciesCoordinates(tp.NamedTuple):
    species: Array
    coordinates: Array


class EnergiesScalars(tp.NamedTuple):
    energies: Array
    scalars: tp.Optional[Array] = None


class SpeciesEnergiesQBC(tp.NamedTuple):
    species: Array
    energies: Array
    qbcs: Array


class SpeciesForces(tp.NamedTuple):
    species: Array
    energies: Array
    forces: Array


class ForceStress(tp.NamedTuple):
    energies: Array
    forces: Array
    stress: Array


class VibAnalysis(tp.NamedTuple):
    freqs: Array
    modes: Array
    fconstants: Array
    rmasses: Array
