"""Lennard-Jones family (12-6, and its repulsion/dispersion halves).

Math from ``/root/reference/torchani/potentials/lj.py:60-141``:
Lorentz-Berthelot combination rules; ff19SB parameter preset.
"""

import math
import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array
from torchani_tpu.cutoffs import CutoffArg, CutoffDummy, parse_cutoff_fn
from torchani_tpu.neighbors import Neighbors
from torchani_tpu.potentials.core import BasePairPotential
from torchani_tpu.units import HARTREE_TO_KCALPERMOL

__all__ = ["LennardJones", "RepulsionLJ", "DispersionLJ"]

_EPS_DEFAULT = 0.1 / HARTREE_TO_KCALPERMOL  # Hartree
_SIGMA_DEFAULT = 1.5  # Angstrom

# ff19SB-based presets (Amber atom types; see reference lj.py:23-56)
_FF19SB_SIGMAS = {
    "H": 1.4870, "C": 1.9080, "N": 1.8240, "O": 1.6612, "F": 1.7500,
    "Ne": 2.782, "P": 2.1000, "S": 1.9825, "Cl": 1.948, "Ar": 3.346,
    "Br": 2.22, "I": 2.35,
}
_FF19SB_EPS = {
    "H": 0.0157, "C": 0.0860, "N": 0.1700, "O": 0.2100, "F": 0.0610,
    "Ne": 0.0711, "P": 0.2000, "S": 0.2824, "Cl": 0.265, "Ar": 0.24979,
    "Br": 0.320, "I": 0.40,
}


class _LJ(BasePairPotential):
    """Base LJ potential; ``sigma`` in Angstrom, ``eps`` in Hartree."""

    eps: Array = None  # (S,)
    sigma: Array = None  # (S,)

    @classmethod
    def make(
        cls,
        symbols: tp.Sequence[str],
        eps: tp.Sequence[float] = (),
        sigma: tp.Sequence[float] = (),
        cutoff: float = math.inf,
        cutoff_fn: CutoffArg = "smooth",
    ):
        symbols = tuple(symbols)
        s = len(symbols)
        eps_v = np.asarray(eps if eps else [_EPS_DEFAULT] * s, dtype=np.float32)
        sigma_v = np.asarray(
            sigma if sigma else [_SIGMA_DEFAULT] * s, dtype=np.float32
        )
        if len(eps_v) != s or len(sigma_v) != s:
            raise ValueError("eps and sigma need one value per symbol")
        return cls(
            symbols=symbols,
            cutoff=cutoff,
            cutoff_fn=(
                parse_cutoff_fn(cutoff_fn) if not math.isinf(cutoff) else CutoffDummy()
            ),
            eps=jnp.asarray(eps_v),
            sigma=jnp.asarray(sigma_v),
        )

    @classmethod
    def ff19SB(cls, symbols: tp.Sequence[str], **kwargs):
        """ff19SB-derived defaults (debug/convenience)."""
        sigma = [_FF19SB_SIGMAS[s] for s in symbols]
        eps = [_FF19SB_EPS[s] / HARTREE_TO_KCALPERMOL for s in symbols]
        return cls.make(symbols, eps, sigma, **kwargs)

    def _combined(self, elem_flat: Array, neighbors: Neighbors):
        ec, en = self.elem_pairs(elem_flat, neighbors)
        eps_t = jnp.sqrt(self.eps[:, None] * self.eps[None, :])  # Berthelot
        sigma_t = (self.sigma[:, None] + self.sigma[None, :]) / 2  # Lorentz
        eps, sigma = self.pair_tables(ec, en, eps_t, sigma_t)
        x = sigma / self.clamp(neighbors.dist)
        return eps, x


class LennardJones(_LJ):
    def pair_energies(self, elem_flat: Array, neighbors: Neighbors) -> Array:
        eps, x = self._combined(elem_flat, neighbors)
        return 4 * eps * (x**12 - x**6)


class RepulsionLJ(_LJ):
    def pair_energies(self, elem_flat: Array, neighbors: Neighbors) -> Array:
        eps, x = self._combined(elem_flat, neighbors)
        return 4 * eps * x**12


class DispersionLJ(_LJ):
    def pair_energies(self, elem_flat: Array, neighbors: Neighbors) -> Array:
        eps, x = self._combined(elem_flat, neighbors)
        return -4 * eps * x**6
