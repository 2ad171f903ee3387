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


class EnergiesForces(tp.NamedTuple):
    energies: Array
    forces: Array


class EnergiesForcesHessians(tp.NamedTuple):
    energies: Array
    forces: Array
    hessians: Array


class ForcesHessians(tp.NamedTuple):
    forces: Array
    hessians: Array


class SpeciesEnergiesAtomicCharges(tp.NamedTuple):
    species: Array
    energies: Array
    atomic_charges: Array


class EnergiesAtomicCharges(tp.NamedTuple):
    energies: Array
    atomic_charges: Array


class SpeciesAtomicCharges(tp.NamedTuple):
    # field names mirror the reference's (``tuples.py:70-72``), which uses
    # ``energies`` for the first slot despite the class name
    energies: Array
    atomic_charges: Array


class AtomicStdev(tp.NamedTuple):
    species: Array
    energies: Array
    stdev_atomic_energies: Array


class ForceStdev(tp.NamedTuple):
    species: Array
    magnitudes: Array
    relative_stdev: Array
    relative_range: Array


class ForceMagnitudes(tp.NamedTuple):
    species: Array
    magnitudes: Array
