"""Short-range repulsion pair potentials (xTB and ZBL).

Math ported from ``/root/reference/torchani/potentials/xtb.py:16-77`` and
``zbl.py:14-81`` (Grimme GFN2-xTB repulsion; Ziegler-Biersack-Littmark
screened nuclear repulsion with the LAMMPS parameterization), re-expressed
over masked padded neighbor tables.
"""

import math
import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array
from torchani_tpu.constants import (
    ATOMIC_NUMBER,
    XTB_REPULSION_ALPHA,
    XTB_REPULSION_YEFF,
)
from torchani_tpu.cutoffs import CutoffArg, CutoffDummy, parse_cutoff_fn
from torchani_tpu.neighbors import Neighbors
from torchani_tpu.potentials.core import BasePairPotential

__all__ = ["RepulsionXTB", "RepulsionZBL"]


def _elem_seq(
    name: str,
    symbols: tp.Sequence[str],
    values: tp.Sequence[float],
    default_by_znum: tp.Optional[tp.Sequence[float]] = None,
) -> np.ndarray:
    """Resolve a per-element parameter sequence (model order)."""
    if values:
        if len(values) != len(symbols):
            raise ValueError(f"{name} must have one value per symbol")
        return np.asarray(values, dtype=np.float32)
    if default_by_znum is None:
        raise ValueError(f"{name} must be provided")
    return np.asarray(
        [default_by_znum[ATOMIC_NUMBER[s]] for s in symbols], dtype=np.float32
    )


class RepulsionXTB(BasePairPotential):
    r"""Grimme GFN2-xTB repulsion: :math:`(Y_{ab}/r) e^{-\sqrt{\alpha_a \alpha_b} r^{k}}`.

    ``k`` is 1.5 except 1.0 for H-H.  Default per-element alpha/yeff come from
    the Grimme parameter tables bundled in `torchani_tpu.constants`.
    """

    y_ab: Array = None  # (S, S)
    sqrt_alpha_ab: Array = None  # (S, S)
    k_rep_ab: Array = None  # (S, S)

    @classmethod
    def make(
        cls,
        symbols: tp.Sequence[str],
        krep_hydrogen: float = 1.0,
        krep: float = 1.5,
        alpha: tp.Sequence[float] = (),
        yeff: tp.Sequence[float] = (),
        cutoff: float = math.inf,
        cutoff_fn: CutoffArg = "smooth",
    ) -> "RepulsionXTB":
        symbols = tuple(symbols)
        alpha_v = _elem_seq("alpha", symbols, alpha, XTB_REPULSION_ALPHA)
        yeff_v = _elem_seq("yeff", symbols, yeff, XTB_REPULSION_YEFF)
        s = len(symbols)
        k_rep = np.full((s, s), krep, dtype=np.float32)
        for i, sym in enumerate(symbols):
            if ATOMIC_NUMBER[sym] == 1:
                k_rep[i, i] = krep_hydrogen
        return cls(
            symbols=symbols,
            cutoff=cutoff,
            cutoff_fn=(
                parse_cutoff_fn(cutoff_fn) if not math.isinf(cutoff) else CutoffDummy()
            ),
            y_ab=jnp.asarray(np.outer(yeff_v, yeff_v)),
            sqrt_alpha_ab=jnp.asarray(np.sqrt(np.outer(alpha_v, alpha_v))),
            k_rep_ab=jnp.asarray(k_rep),
        )

    def pair_energies(self, elem_flat: Array, neighbors: Neighbors) -> Array:
        dists = self.clamp(neighbors.dist) * self.ANGSTROM_TO_BOHR
        ec, en = self.elem_pairs(elem_flat, neighbors)
        # one folded payload gather instead of three per-lane class gathers
        y_ab, sqrt_alpha_ab, k_rep_ab = self.pair_tables(
            ec, en, self.y_ab, self.sqrt_alpha_ab, self.k_rep_ab
        )
        return (y_ab / dists) * jnp.exp(-sqrt_alpha_ab * dists**k_rep_ab)


class RepulsionZBL(BasePairPotential):
    r"""ZBL universal screened nuclear repulsion (LAMMPS parameterization).

    :math:`E = (Z^{eff}_a Z^{eff}_b / r) \phi(r (Z_a^{0.23} + Z_b^{0.23})/k)`
    with a 4-term exponential screening function :math:`\phi`.
    """

    eff_atomic_nums: Array = None  # (S,)
    coeffs: Array = None  # (4,)
    exponents: Array = None  # (4,)
    k: float = struct.field(pytree_node=False, default=0.8853)
    kz: float = struct.field(pytree_node=False, default=0.23)

    @classmethod
    def make(
        cls,
        symbols: tp.Sequence[str],
        k: float = 0.8853,
        screen_coeffs: tp.Sequence[float] = (),
        screen_exponents: tp.Sequence[float] = (),
        eff_exponent: float = 0.23,
        eff_atomic_nums: tp.Sequence[float] = (),
        cutoff: float = math.inf,
        cutoff_fn: CutoffArg = "smooth",
    ) -> "RepulsionZBL":
        symbols = tuple(symbols)
        if len(screen_exponents) != len(screen_coeffs):
            raise ValueError("screen_exponents and screen_coeffs must have the same len")
        if not screen_coeffs:
            # LAMMPS values; last coeff 0.02817 makes the sum exactly 1
            screen_coeffs = [0.18175, 0.50986, 0.28022, 0.02817]
            screen_exponents = [3.19980, 0.94229, 0.40290, 0.20162]
        if not math.isclose(sum(screen_coeffs), 1.0):
            raise ValueError("Screen coeffs must sum to 1")
        eff = _elem_seq(
            "eff_atomic_nums",
            symbols,
            eff_atomic_nums,
            list(range(118)),
        )
        return cls(
            symbols=symbols,
            cutoff=cutoff,
            cutoff_fn=(
                parse_cutoff_fn(cutoff_fn) if not math.isinf(cutoff) else CutoffDummy()
            ),
            eff_atomic_nums=jnp.asarray(eff),
            coeffs=jnp.asarray(np.asarray(screen_coeffs, dtype=np.float32)),
            exponents=jnp.asarray(np.asarray(screen_exponents, dtype=np.float32)),
            k=k,
            kz=eff_exponent,
        )

    def screen_fn(self, dists: Array) -> Array:
        return jnp.sum(
            self.coeffs * jnp.exp(-self.exponents * dists[..., None]), axis=-1
        )

    def pair_energies(self, elem_flat: Array, neighbors: Neighbors) -> Array:
        dists = self.clamp(neighbors.dist) * self.ANGSTROM_TO_BOHR
        ec, en = self.elem_pairs(elem_flat, neighbors)
        # pairwise-combined (S, S) tables via ONE payload gather
        za_zb = self.eff_atomic_nums[:, None] * self.eff_atomic_nums[None, :]
        kz_sum = (
            self.eff_atomic_nums[:, None] ** self.kz
            + self.eff_atomic_nums[None, :] ** self.kz
        )
        prod_ab, kzsum_ab = self.pair_tables(ec, en, za_zb, kz_sum)
        eff_coulomb = prod_ab / dists
        reduced = dists * kzsum_ab / self.k
        return eff_coulomb * self.screen_fn(reduced)
