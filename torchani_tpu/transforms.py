"""Composable batch transforms (applied at batching or training time).

Counterpart of ``/root/reference/torchani/transforms.py:43-230``: subtract
self energies / analytical potentials from target energies (and forces), and
convert atomic numbers to model element indices.  Transforms are host-side
callables over property dicts (numpy in, numpy out).
"""

import typing as tp

import jax.numpy as jnp
import numpy as np

from torchani_tpu.nn import SpeciesConverter
from torchani_tpu.sae import SelfEnergy

__all__ = [
    "Transform",
    "Compose",
    "Identity",
    "AtomicNumbersToIndices",
    "SubtractSAE",
    "SubtractEnergyAndForce",
    "SubtractRepulsionXTB",
    "SubtractTwoBodyDispersionD3",
    "identity",
]

Properties = tp.Dict[str, np.ndarray]


class Transform:
    """Base transform: maps a property dict to a property dict."""

    def __call__(self, properties: Properties) -> Properties:
        raise NotImplementedError


class Compose(Transform):
    def __init__(self, transforms: tp.Sequence[Transform]) -> None:
        self.transforms = list(transforms)

    def __call__(self, properties: Properties) -> Properties:
        for t in self.transforms:
            properties = t(properties)
        return properties


class Identity(Transform):
    """Pass-through transform (reference ``transforms.py:67-75``)."""

    def __call__(self, properties: Properties) -> Properties:
        return properties


_Identity = Identity  # old internal name
identity = Identity()


class AtomicNumbersToIndices(Transform):
    """Convert the ``species`` key from atomic numbers to element indices."""

    def __init__(self, symbols: tp.Sequence[str]) -> None:
        self.converter = SpeciesConverter(tuple(symbols))

    def __call__(self, properties: Properties) -> Properties:
        out = dict(properties)
        out["species"] = np.asarray(
            self.converter(jnp.asarray(np.asarray(properties["species"])))
        )
        return out


class SubtractSAE(Transform):
    """Subtract per-element self energies from the ``energies`` key."""

    def __init__(
        self,
        symbols: tp.Sequence[str],
        self_energies: tp.Union[tp.Sequence[float], SelfEnergy],
    ) -> None:
        if isinstance(self_energies, SelfEnergy):
            self.shifter = self_energies
        else:
            self.shifter = SelfEnergy.make(tuple(symbols), self_energies)
        self.converter = SpeciesConverter(self.shifter.symbols)

    def __call__(self, properties: Properties) -> Properties:
        out = dict(properties)
        species = jnp.asarray(np.asarray(properties["species"]))
        # species may be znums or already element idxs; detect via range
        if int(np.asarray(species).max(initial=0)) >= len(self.shifter.symbols):
            elem = self.converter(species)
        else:
            elem = species
        sae = np.asarray(self.shifter(elem)).astype(np.float64)
        out["energies"] = np.asarray(properties["energies"]) - sae
        return out


class SubtractEnergyAndForce(Transform):
    """Subtract an analytical potential's energies (and forces) from targets.

    Used to train NNs on residuals (e.g. total minus ZBL repulsion minus D3
    dispersion), mirroring reference ``SubtractEnergy``/``SubtractForce``.
    """

    def __init__(self, potential, subtract_forces: bool = True) -> None:
        self.potential = potential
        self.subtract_forces = subtract_forces

    def __call__(self, properties: Properties) -> Properties:
        import jax

        out = dict(properties)
        species = jnp.asarray(np.asarray(properties["species"]))
        coords = jnp.asarray(
            np.asarray(properties["coordinates"], dtype=np.float32)
        )

        def esum(c):
            return jnp.sum(self.potential(species, c))

        if self.subtract_forces and "forces" in properties:
            e, g = jax.value_and_grad(esum)(coords)
            pot_e = self.potential(species, coords)
            out["forces"] = np.asarray(properties["forces"]) - np.asarray(-g)
        else:
            pot_e = self.potential(species, coords)
        out["energies"] = np.asarray(properties["energies"]) - np.asarray(
            pot_e
        ).astype(np.float64)
        return out


class SubtractRepulsionXTB(Transform):
    """Subtract xTB repulsion energies/forces (reference ``transforms.py:109``).

    Takes the arguments of `torchani_tpu.potentials.RepulsionXTB.make`.
    """

    def __init__(self, *args, subtract_force: bool = True, **kwargs) -> None:
        from torchani_tpu.potentials import RepulsionXTB

        self._transform = SubtractEnergyAndForce(
            RepulsionXTB.make(*args, **kwargs), subtract_forces=subtract_force
        )

    def __call__(self, properties: Properties) -> Properties:
        return self._transform(properties)


class SubtractTwoBodyDispersionD3(Transform):
    """Subtract 2-body DFT-D3 energies/forces (reference ``transforms.py:131``).

    Takes the arguments of
    `torchani_tpu.potentials.TwoBodyDispersionD3.from_functional`.
    """

    def __init__(self, *args, subtract_force: bool = True, **kwargs) -> None:
        from torchani_tpu.potentials import TwoBodyDispersionD3

        self._transform = SubtractEnergyAndForce(
            TwoBodyDispersionD3.from_functional(*args, **kwargs),
            subtract_forces=subtract_force,
        )

    def __call__(self, properties: Properties) -> Properties:
        return self._transform(properties)
