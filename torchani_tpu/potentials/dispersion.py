"""DFT-D3(BJ) two-body dispersion.

Math ported from ``/root/reference/torchani/potentials/dftd3.py:37-311``
(Grimme DFT-D3 with Becke-Johnson damping): per-atom coordination numbers,
Gaussian-weighted interpolation of the 5x5 reference-C6 tables, C8 from
empirical-charge products, s6/s8/a1/a2 per density functional.

TPU formulation: coordination numbers are masked row sums over the padded
neighbor table (no ``index_add_``); the 25-reference interpolation is a lane
-broadcast ``(N, K, 25)`` computation.
"""

import math
import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array
from torchani_tpu.constants import (
    ATOMIC_NUMBER,
    COVALENT_RADIUS,
    FUNCTIONAL_D3BJ_CONSTANTS,
    SQRT_EMPIRICAL_CHARGE,
    load_c6_constants,
)
from torchani_tpu.cutoffs import CutoffArg, CutoffDummy, parse_cutoff_fn
from torchani_tpu.neighbors import Neighbors
from torchani_tpu.potentials.core import BasePairPotential
from torchani_tpu.potentials.repulsion import _elem_seq

__all__ = ["TwoBodyDispersionD3"]


class TwoBodyDispersionD3(BasePairPotential):
    """Two-body part of the DFT-D3(BJ) dispersion correction."""

    precalc_coeff6: Array = None  # (S, S, 25)
    precalc_cn_a: Array = None  # (S, S, 25)
    precalc_cn_b: Array = None  # (S, S, 25)
    sqrt_charge_ab: Array = None  # (S, S)
    damp_radii: Array = None  # (S, S) BJ cutoff radii (Bohr)
    covalent_radii: Array = None  # (S,) Bohr
    # Factorized CN-reference table (S, 5): Grimme's 25 interpolation
    # channels for pair (i, j) are the product grid of i's and j's <=5
    # per-ELEMENT coordination-number references (verified from the c6
    # tables at construction), so the (N, K, 25) Gaussian weights factor
    # into per-ATOM (N, 5) exponential tables combined per lane by pure
    # FMAs — 25 transcendentals per PAIR become 5 per ATOM.  Rows with
    # fewer than 5 references pad with 1e4 (their exp underflows to an
    # exact 0 and the c6<=0 channel mask removes them anyway).  None =
    # factorization could not be verified; the literal 25-channel pair
    # form runs instead.
    cn_refs: Array = None  # (S, 5)
    s6: float = struct.field(pytree_node=False, default=1.0)
    s8: float = struct.field(pytree_node=False, default=1.0)
    a1: float = struct.field(pytree_node=False, default=0.0)
    a2: float = struct.field(pytree_node=False, default=0.0)

    # Hardcoded Grimme constants
    _K1: tp.ClassVar[int] = 16
    _K2: tp.ClassVar[float] = 4 / 3
    _K3: tp.ClassVar[int] = 4
    _EPS: tp.ClassVar[float] = 1e-35

    @classmethod
    def make(
        cls,
        symbols: tp.Sequence[str],
        s6: tp.Optional[float] = None,
        s8: tp.Optional[float] = None,
        damp_a1: tp.Optional[float] = None,
        damp_a2: tp.Optional[float] = None,
        functional: tp.Optional[str] = None,
        sqrt_empirical_charge: tp.Sequence[float] = (),
        covalent_radii: tp.Sequence[float] = (),
        cutoff: float = math.inf,
        cutoff_fn: CutoffArg = "smooth",
    ) -> "TwoBodyDispersionD3":
        symbols = tuple(symbols)
        if functional is not None:
            d = FUNCTIONAL_D3BJ_CONSTANTS[functional.lower()]
            s6 = d["s6"] if s6 is None else s6
            s8 = d["s8"] if s8 is None else s8
            damp_a1 = d["a1"] if damp_a1 is None else damp_a1
            damp_a2 = d["a2"] if damp_a2 is None else damp_a2
        if None in (s6, s8, damp_a1, damp_a2):
            raise ValueError("Provide either a functional name or s6/s8/a1/a2")

        from torchani_tpu.units import ANGSTROM_TO_BOHR

        sqrt_q = _elem_seq(
            "sqrt_empirical_charge", symbols, sqrt_empirical_charge,
            SQRT_EMPIRICAL_CHARGE,
        )
        rcov = _elem_seq(
            "covalent_radii", symbols, covalent_radii, COVALENT_RADIUS
        ) * ANGSTROM_TO_BOHR

        c6 = load_c6_constants()
        znums = np.asarray([ATOMIC_NUMBER[s] for s in symbols])
        s = len(symbols)
        sel = lambda t: np.asarray(t)[znums][:, znums].reshape(s, s, 25)  # noqa: E731

        # Derive and VERIFY the per-element CN reference factorization
        # (see `cn_refs`); fall back to the literal pair grid on any
        # inconsistency rather than risk wrong physics.
        grid_a = sel(c6["coordnums_a"]).reshape(s, s, 5, 5)
        grid_b = sel(c6["coordnums_b"]).reshape(s, s, 5, 5)
        grid_c = sel(c6["constants"]).reshape(s, s, 5, 5)
        cn_refs = np.full((s, 5), 1.0e4, np.float32)
        factorized = True
        for zi in range(s):
            for r in range(5):
                va = grid_a[zi, :, r, :][grid_c[zi, :, r, :] > 0]
                vb = grid_b[:, zi, :, r][grid_c[:, zi, :, r] > 0]
                vals = np.concatenate([va, vb])
                if vals.size == 0:
                    continue
                if float(vals.max() - vals.min()) > 1e-6:
                    factorized = False
                cn_refs[zi, r] = float(vals[0])

        return cls(
            symbols=symbols,
            cutoff=cutoff,
            cutoff_fn=(
                parse_cutoff_fn(cutoff_fn) if not math.isinf(cutoff) else CutoffDummy()
            ),
            precalc_coeff6=jnp.asarray(sel(c6["constants"])),
            precalc_cn_a=jnp.asarray(sel(c6["coordnums_a"])),
            precalc_cn_b=jnp.asarray(sel(c6["coordnums_b"])),
            sqrt_charge_ab=jnp.asarray(np.outer(sqrt_q, sqrt_q).astype(np.float32)),
            damp_radii=jnp.asarray(
                np.sqrt(3 * np.outer(sqrt_q, sqrt_q)).astype(np.float32)
            ),
            covalent_radii=jnp.asarray(rcov.astype(np.float32)),
            cn_refs=jnp.asarray(cn_refs) if factorized else None,
            s6=float(s6),
            s8=float(s8),
            a1=float(damp_a1),
            a2=float(damp_a2),
        )

    # alias for reference-API parity
    @classmethod
    def from_functional(
        cls, symbols: tp.Sequence[str], functional: str, **kwargs
    ) -> "TwoBodyDispersionD3":
        return cls.make(symbols, functional=functional, **kwargs)

    @staticmethod
    def _select_rows(values: Array, neighbors: Neighbors) -> Array:
        """Per-lane selection of a runtime per-atom scalar (values[idx]).

        The one remaining per-lane value dependence of the D3 stack
        (coordination numbers are computed per step, so they cannot ride
        the rebuild-time payload fold).  Routed through the bucket-dot
        lane-select service when the table carries selection tables (the
        MD driver attaches them): a payload-1 gather costs ~20 ms fwd and
        a ~27 ms scatter backward at solvated-protein shapes, vs ~1 ms
        for the MXU selection."""
        from torchani_tpu.bucket_refresh import select_lane_values

        return select_lane_values(values, neighbors)

    def frozen_window_channels(
        self, elem_flat: Array, neighbors: Neighbors
    ) -> tp.Optional[Array]:
        """(N, K, 33) per-lane TOPOLOGY CONSTANTS for Verlet-window caching.

        Channels: rcov_sum (1), the 5x5 C6 reference grid (25),
        sqrt_charge (1), damping radius (1), and the NEIGHBOR element's 5
        CN reference values (5).  All are element-(pair)-keyed constants —
        caching them across the Verlet window is EXACT, it just moves the
        per-eval folded payload gather cluster (profiled at ~8 ms of the
        config-5 slow eval, tools/profile_hetero_slow.py) to rebuild time.
        The aux path of `pair_energies` then also (a) lane-selects the
        coordination number at P=1 instead of the 5-channel Gaussian table
        (the P=5 select + its layout plumbing profiled at ~9 ms) and (b)
        contracts the interpolation without materializing the (N, K, 25)
        Gaussian tensor.  A WINDOW-FROZEN C6 variant (drop the CN
        machinery entirely between rebuilds) was measured and rejected:
        the dC6/dCN force term rides the steep CN logistic at BONDED
        distances (~5e-3 Ha/A at init) and NVE under 4 fs impulses went
        non-finite at the equilibrated config-5 system.

        Returns None when the factorized CN-reference form is unavailable
        (`cn_refs is None`) — the driver then skips caching.
        """
        if self.cn_refs is None:
            return None
        rcov_pair = (
            self.covalent_radii[:, None] + self.covalent_radii[None, :]
        )
        ec, en = self.elem_pairs(elem_flat, neighbors)
        rcov_sum, pre_c6, sqrt_charge, damp_radii = self.pair_tables(
            ec, en, rcov_pair, self.precalc_coeff6, self.sqrt_charge_ab,
            self.damp_radii,
        )
        refs_nbr = jnp.take(self.cn_refs, en, axis=0)  # (N, K, 5)
        return jnp.concatenate(
            [
                rcov_sum[..., None],
                pre_c6,  # (N, K, 25), channel c = 5*r_i + r_j
                sqrt_charge[..., None],
                damp_radii[..., None],
                refs_nbr,
            ],
            axis=-1,
        )

    def pair_energies(self, elem_flat: Array, neighbors: Neighbors) -> Array:
        dists = self.clamp(neighbors.dist) * self.ANGSTROM_TO_BOHR  # (N, K)
        aux = getattr(neighbors, "pair_aux", None)
        if aux is not None and self.cn_refs is not None:
            c6_coeff, c8_coeff, damp = self._c6_c8_damp_cached(
                elem_flat, neighbors, aux
            )
        else:
            c6_coeff, c8_coeff, damp = self._c6_c8_damp(elem_flat, neighbors)
        e6 = self.s6 * c6_coeff / (dists**6 + damp**6)
        e8 = self.s8 * c8_coeff / (dists**8 + damp**8)
        return -(e6 + e8)

    def _c6_c8_damp_cached(
        self, elem_flat: Array, neighbors: Neighbors, aux: Array
    ) -> tp.Tuple[Array, Array, Array]:
        """Exact C6/C8/damp from the cached constant channels (see
        `frozen_window_channels`): live CN at P=1 select + per-lane
        Gaussian factors + a gauss-free bilinear interpolation."""
        dists = self.clamp(neighbors.dist) * self.ANGSTROM_TO_BOHR
        rcov_sum = aux[..., 0]
        pre_c6 = aux[..., 1:26].reshape(aux.shape[:-1] + (5, 5))
        sqrt_charge = aux[..., 26]
        damp_radii = aux[..., 27]
        refs_nbr = aux[..., 28:33]  # (N, K, 5)

        count_fn = 1.0 / (
            1.0 + jnp.exp(-self._K1 * (self._K2 * rcov_sum / dists - 1.0))
        )
        count_fn = jnp.where(neighbors.mask, count_fn, 0.0)
        coordnums = jnp.sum(count_fn, axis=-1)  # (N,)

        refs = jnp.take(self.cn_refs, jnp.clip(elem_flat, 0), axis=0)
        e_atom = jnp.exp(
            -self._K3 * (coordnums[:, None] - refs) ** 2
        )  # (N, 5)
        cn_nbr = jnp.where(
            neighbors.mask, self._select_rows(coordnums, neighbors), 0.0
        )  # (N, K) — P=1 select
        e_nbr = jnp.exp(
            -self._K3 * (cn_nbr[..., None] - refs_nbr) ** 2
        )  # (N, K, 5), per-lane transcendentals instead of a P=5 select
        e_nbr = jnp.where(neighbors.mask[..., None], e_nbr, 0.0)

        # bilinear interpolation without materializing the (N, K, 25)
        # Gaussian tensor: z = e_atom^T C6ref e_nbr, w = e_atom^T S e_nbr
        # with S the support mask of the reference grid (absent refs ride
        # as pre_c6 == 0, exactly the guard of the uncached path)
        support = (pre_c6 > 0.0).astype(e_nbr.dtype)  # (N, K, 5, 5)
        zc = jnp.sum(pre_c6 * e_nbr[..., None, :], axis=-1)  # (N, K, 5)
        wc = jnp.sum(support * e_nbr[..., None, :], axis=-1)
        z_factor = (
            jnp.sum(e_atom[:, None, :] * zc, axis=-1) + self._EPS
        )
        w_factor = (
            jnp.sum(e_atom[:, None, :] * wc, axis=-1) + self._EPS
        )
        ok = w_factor > 1e-12
        c6_coeff = jnp.where(
            ok, z_factor / jnp.maximum(w_factor, 1e-12), 1.0
        )
        c8_coeff = 3 * c6_coeff * sqrt_charge
        damp = self.a1 * damp_radii + self.a2
        return c6_coeff, c8_coeff, damp

    def _c6_c8_damp(
        self, elem_flat: Array, neighbors: Neighbors
    ) -> tp.Tuple[Array, Array, Array]:
        dists = self.clamp(neighbors.dist) * self.ANGSTROM_TO_BOHR  # (N, K)
        ec, en = self.elem_pairs(elem_flat, neighbors)

        # ONE folded payload gather for every pair-class constant instead
        # of six per-lane class gathers — those profiled at ~120 ms/step
        # of the solvated-protein MD step (tools/profile_hetero.py);
        # constants have no backward.  The factorized path folds 28
        # channels (rcov sum, 25 C6 refs, sqrt charge, damping radius);
        # the literal fallback folds 78 (plus the 2x25 CN-ref grids).
        rcov_pair = (
            self.covalent_radii[:, None] + self.covalent_radii[None, :]
        )  # (S, S)
        if self.cn_refs is not None:
            (rcov_sum, pre_c6, sqrt_charge, damp_radii) = self.pair_tables(
                ec,
                en,
                rcov_pair,
                self.precalc_coeff6,
                self.sqrt_charge_ab,
                self.damp_radii,
            )
        else:
            (
                rcov_sum,
                pre_c6,
                pre_cn_a,
                pre_cn_b,
                sqrt_charge,
                damp_radii,
            ) = self.pair_tables(
                ec,
                en,
                rcov_pair,
                self.precalc_coeff6,
                self.precalc_cn_a,
                self.precalc_cn_b,
                self.sqrt_charge_ab,
                self.damp_radii,
            )

        # Coordination numbers: masked row sum (full table = both directions)
        count_fn = 1.0 / (
            1.0 + jnp.exp(-self._K1 * (self._K2 * rcov_sum / dists - 1.0))
        )
        count_fn = jnp.where(neighbors.mask, count_fn, 0.0)
        coordnums = jnp.sum(count_fn, axis=-1)  # (N,)

        if self.cn_refs is not None:
            # Factorized Gaussian weights (see `cn_refs`):
            #   exp(-K3 ((cn_i - A)^2 + (cn_j - B)^2))
            #     == exp(-K3 (cn_i - A)^2) * exp(-K3 (cn_j - B)^2)
            # with A/B per-ELEMENT reference lists — so the exponentials
            # are (N, 5) per-atom tables (5 transcendentals per atom
            # instead of 25 per PAIR-LANE) and the per-lane combination
            # is a pure outer-product FMA.  The neighbor side rides the
            # scatter-free bucket lane-select like the CN values.
            refs = jnp.take(
                self.cn_refs, jnp.clip(elem_flat, 0), axis=0
            )  # (N, 5)
            e_atom = jnp.exp(
                -self._K3 * (coordnums[:, None] - refs) ** 2
            )  # (N, 5)
            e_nbr = jnp.where(
                neighbors.mask[..., None],
                self._select_rows(e_atom, neighbors),
                0.0,
            )  # (N, K, 5)
            gauss = (
                e_atom[:, None, :, None] * e_nbr[..., None, :]
            ).reshape(pre_c6.shape)  # (N, K, 25), channel c = 5*r_i + r_j
        else:
            cn_center = coordnums[:, None]  # (N, 1)
            cn_nbr = jnp.where(
                neighbors.mask,
                self._select_rows(coordnums, neighbors),
                0.0,
            )
            gauss = (cn_center[..., None] - pre_cn_a) ** 2 + (
                cn_nbr[..., None] - pre_cn_b
            ) ** 2
            gauss = jnp.exp(-self._K3 * gauss)

        # Gaussian-weighted C6 interpolation over 25 reference pairs.
        # Guarded division: when every weight underflows (masked lanes in
        # the factorized path; physically-absurd coordination numbers in
        # either path) the quotient's BACKWARD computes z/w^2 whose w^2
        # underflows to 0 -> inf -> NaN gradients.  Such lanes carry no
        # meaningful interpolation anyway (the reference's eps-over-eps
        # limit is 1); route them through a safe denominator.
        gauss = jnp.where(pre_c6 <= 0.0, 0.0, gauss)
        w_factor = jnp.sum(gauss, axis=-1) + self._EPS
        z_factor = jnp.sum(pre_c6 * gauss, axis=-1) + self._EPS
        ok = w_factor > 1e-12
        c6_coeff = jnp.where(
            ok, z_factor / jnp.maximum(w_factor, 1e-12), 1.0
        )  # (N, K)
        c8_coeff = 3 * c6_coeff * sqrt_charge

        damp = self.a1 * damp_radii + self.a2
        return c6_coeff, c8_coeff, damp
