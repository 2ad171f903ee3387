"""Fixed-charge electrostatics (Coulomb and MNOK-damped).

Math from ``/root/reference/torchani/potentials/fixed_coulomb.py:13-75``.
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

__all__ = ["FixedCoulomb", "FixedMNOK"]


class FixedCoulomb(BasePairPotential):
    """Per-element fixed-charge Coulomb: q_a q_b / (eps_r r)."""

    charges: Array = None  # (S,)
    dielectric: float = struct.field(pytree_node=False, default=1.0)

    @classmethod
    def make(
        cls,
        symbols: tp.Sequence[str],
        charges: tp.Sequence[float],
        dielectric: float = 1.0,
        cutoff: float = math.inf,
        cutoff_fn: CutoffArg = "smooth",
    ) -> "FixedCoulomb":
        symbols = tuple(symbols)
        if len(charges) != len(symbols):
            raise ValueError("charges needs one value per symbol")
        return cls(
            symbols=symbols,
            cutoff=cutoff,
            cutoff_fn=(
                parse_cutoff_fn(cutoff_fn) if not math.isinf(cutoff) else CutoffDummy()
            ),
            charges=jnp.asarray(np.asarray(charges, dtype=np.float32)),
            dielectric=dielectric,
        )

    def pair_energies(self, elem_flat: Array, neighbors: Neighbors) -> Array:
        dists = self.clamp(neighbors.dist) * self.ANGSTROM_TO_BOHR
        ec, en = self.elem_pairs(elem_flat, neighbors)
        (charge_prod,) = self.pair_tables(
            ec, en, self.charges[:, None] * self.charges[None, :]
        )
        return charge_prod / self.dielectric / dists


class FixedMNOK(BasePairPotential):
    """Mataga-Nishimoto-Ohno-Klopman damped fixed-charge electrostatics."""

    charges: Array = None  # (S,)
    eta: Array = None  # (S,)
    dielectric: float = struct.field(pytree_node=False, default=1.0)

    @classmethod
    def make(
        cls,
        symbols: tp.Sequence[str],
        charges: tp.Sequence[float],
        eta: tp.Sequence[float],
        dielectric: float = 1.0,
        cutoff: float = math.inf,
        cutoff_fn: CutoffArg = "smooth",
    ) -> "FixedMNOK":
        symbols = tuple(symbols)
        if len(charges) != len(symbols) or len(eta) != len(symbols):
            raise ValueError("charges and eta need one value per symbol")
        return cls(
            symbols=symbols,
            cutoff=cutoff,
            cutoff_fn=(
                parse_cutoff_fn(cutoff_fn) if not math.isinf(cutoff) else CutoffDummy()
            ),
            charges=jnp.asarray(np.asarray(charges, dtype=np.float32)),
            eta=jnp.asarray(np.asarray(eta, dtype=np.float32)),
            dielectric=dielectric,
        )

    def pair_energies(self, elem_flat: Array, neighbors: Neighbors) -> Array:
        dists = neighbors.dist * self.ANGSTROM_TO_BOHR
        ec, en = self.elem_pairs(elem_flat, neighbors)
        # NOTE: matching the reference, `dielectric` is stored but not applied
        # in the MNOK energy (fixed_coulomb.py:68-75)
        inv_eta_t = 2.0 / (self.eta[:, None] + self.eta[None, :])
        qq_t = self.charges[:, None] * self.charges[None, :]
        inv_eta, charge_prod = self.pair_tables(ec, en, inv_eta_t, qq_t)
        return charge_prod / jnp.sqrt(dists**2 + inv_eta**2)
