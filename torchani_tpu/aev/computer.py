"""The AEV computer.

TPU-native redesign of the reference ``AEVComputer``
(``/root/reference/torchani/aev/_computer.py:42-675``).  The reference's
scatter-based pipeline (``index_add_`` keyed on pair/triple species ids) is
re-expressed as **masked one-hot contractions** over fixed-capacity padded
neighbor tables, so the whole computation is static-shaped, fully
differentiable (including grad-of-grad for force training) and maps onto the
MXU:

- radial:  ``aev[i, s, r] = sum_k  terms[i, k, r] * onehot_species[i, k, s]``
  — a per-atom batched matmul (replaces ``_collect_radial``'s index_add,
  reference ``_computer.py:337-350``).
- angular: ``aev[i, p, z] = sum_{j<k} terms[i, j, k, z] * onehot_pair[i, j, k, p]``
  — a per-atom batched matmul over the within-row neighbor-pair grid
  (replaces the sort/tril triples trick + ``_collect_angular``, reference
  ``neighbors.py:968-1002`` / ``_computer.py:302-333``).

Feature layout matches the reference exactly: ``[radial | angular]`` with
radial species-major ``(S, R)`` and angular pair-major ``(P, Z)``, where ``Z``
is shift-major/section-minor.

Strategies (registry parity with ``pyaev``/``cuaev``):
- ``"xla"``: the pure-XLA path in this module (reference ``pyaev`` analog).
  This is the production path on TPU: XLA's fusion of the factored
  radial/angular contractions beats the hand-fused kernel (measured 63 vs
  327 ms at 10k atoms, docs/performance.md "measured and rejected").
- ``"pallas"``: fused Pallas angular kernel (reference ``cuaev`` analog).
  Status: REFERENCE/PARITY LANE ONLY — correct on hardware and validated
  against the XLA path every bench run (``tools/tpu_smoke.py``), but
  ``"auto"`` never selects it.  The regime where hand kernels DO win on
  TPU is overhead-bound exact selection, not bandwidth-bound math — see
  ``bucket_refresh.py`` (the Verlet refresh kernels, which are Pallas and
  production-default in MD).
"""

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array
from torchani_tpu.aev.terms import (
    ANIAngular,
    ANIRadial,
    AngularArg,
    BaseAngular,
    BaseRadial,
    RadialArg,
    parse_angular_term,
    parse_radial_term,
)
from torchani_tpu.cutoffs import CutoffArg
from torchani_tpu.neighbors import (
    Neighbors,
    NeighborlistArg,
    narrow_to_cutoff,
    parse_neighborlist,
    repack_to_capacity,
)

__all__ = ["AEVComputer"]

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _triu_index(num_species: int) -> np.ndarray:
    """Symmetric (S, S) -> packed species-pair index map.

    Same packing as reference ``_calculate_triu_index`` (``_computer.py:183``):
    pair (s1, s2), s1 <= s2, gets index in upper-triangle row-major order.
    """
    s1, s2 = np.triu_indices(num_species)
    pair_index = np.arange(s1.shape[0])
    ret = np.zeros((num_species, num_species), dtype=np.int32)
    ret[s1, s2] = pair_index
    ret[s2, s1] = pair_index
    return ret


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _lowering_targets_tpu() -> bool:
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def _perm_rows(x: Array, order: Array, inv: Array) -> Array:
    """Row permutation ``x[order]`` whose transpose is the INVERSE gather.

    The transpose of a plain row gather is a scatter-add; for a permutation
    the scatter is exactly a gather by the inverse (every output row has one
    unique source), so both AD directions stay in the cheap wide-row-gather
    class at EVERY order of AD — force training differentiates the force
    backward (grad-of-grad), and the r2 custom_vjp form dissolved there
    into a plain ``take`` whose jvp-transpose scattered (measured: e+f
    training 29.7 -> 43 ms/step).  ``inv`` must satisfy
    ``order[inv] == arange``.  See `torchani_tpu.utils.perm_gather`.
    """
    from torchani_tpu.utils import perm_gather

    return perm_gather(x, order, inv)


class AEVComputer(struct.PyTreeNode):
    """Computes atomic environment vectors for batches of molecules.

    Args:
        radial: radial term module (`ANIRadial` or user subclass)
        angular: angular term module
        num_species: number of supported elements
        strategy: ``"xla"`` | ``"pallas"`` | ``"auto"``
        neighborlist: neighborlist used when called on raw coordinates
        atom_block: atoms processed per angular tile (memory knob)
        angular_capacity: packed capacity for the angular neighbor table; None
            derives it from the radial table capacity.
    """

    radial: BaseRadial
    angular: BaseAngular
    num_species: int = struct.field(pytree_node=False)
    strategy: str = struct.field(pytree_node=False, default="auto")
    neighborlist: tp.Any = struct.field(pytree_node=False, default=None)
    atom_block: tp.Optional[int] = struct.field(pytree_node=False, default=None)
    angular_capacity: tp.Optional[int] = struct.field(
        pytree_node=False, default=None
    )
    # Static prefix length for the angular repack.  ONLY valid when the
    # caller guarantees neighbor-table lanes are sorted by (build-time)
    # distance with every angular-range neighbor inside the prefix — the MD
    # driver's Verlet cache does this (md.py:_build_cache) so the per-step
    # top_k repack scans ~56 lanes instead of the full radial capacity.
    angular_preslice: tp.Optional[int] = struct.field(
        pytree_node=False, default=None
    )
    # Count-class angular split ``(k_small, n_dense)``: per step, rows are
    # ordered by valid-lane count; the n_dense densest rows run the angular
    # path at full capacity and the rest at only k_small lanes (pair work
    # scales ~capacity^2, and in a liquid ~85% of rows sit well below the
    # worst-case capacity).  ONLY applied when the angular table was
    # repacked (valid lanes then form a per-row prefix, so the small class
    # is a static lane slice).  More rows over k_small than n_dense would
    # silently truncate — detected and NaN-poisoned like capacity overflow.
    # Set from measured count distributions by the MD driver (md.py); None
    # disables.  An optional third element ``n_rows`` caps the evaluated
    # rows in count order: the tail past it (zero-count rows — padded atoms
    # of a conformer batch) is emitted as exact zeros without running the
    # angular math (see ``_angular_split_xla``).
    angular_split: tp.Optional[tp.Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None
    )

    # ---- dims ----
    @property
    def num_species_pairs(self) -> int:
        return self.num_species * (self.num_species + 1) // 2

    @property
    def radial_len(self) -> int:
        return self.radial.num_feats * self.num_species

    @property
    def angular_len(self) -> int:
        return self.angular.num_feats * self.num_species_pairs

    @property
    def out_dim(self) -> int:
        return self.radial_len + self.angular_len

    # ---- construction ----
    @classmethod
    def make(
        cls,
        radial: RadialArg,
        angular: AngularArg,
        num_species: int,
        strategy: str = "auto",
        cutoff_fn: tp.Optional[CutoffArg] = None,
        neighborlist: NeighborlistArg = "all_pairs",
        **kwargs,
    ) -> "AEVComputer":
        radial = parse_radial_term(radial)
        angular = parse_angular_term(angular)
        if not angular.cutoff_fn.is_same(radial.cutoff_fn):
            raise ValueError("Cutoff fn must be the same for angular and radial terms")
        if angular.cutoff > radial.cutoff:
            raise ValueError(
                f"Angular cutoff {angular.cutoff} should be smaller "
                f"than radial cutoff {radial.cutoff}"
            )
        if strategy not in ("auto", "xla", "pallas"):
            raise ValueError(f"Unsupported strategy {strategy}")
        return cls(
            radial=radial,
            angular=angular,
            num_species=num_species,
            strategy=strategy,
            neighborlist=parse_neighborlist(neighborlist),
            **kwargs,
        )

    @classmethod
    def from_constants(
        cls,
        radial_cutoff: float,
        angular_cutoff: float,
        radial_eta: float,
        radial_shifts: tp.Sequence[float],
        angular_eta: float,
        angular_zeta: float,
        angular_shifts: tp.Sequence[float],
        sections: tp.Sequence[float],
        num_species: int,
        cutoff_fn: CutoffArg = "cosine",
        **kwargs,
    ) -> "AEVComputer":
        """Legacy constructor from raw constants (reference ``from_constants``)."""
        return cls.make(
            radial=ANIRadial.make(radial_eta, radial_shifts, radial_cutoff, cutoff_fn),
            angular=ANIAngular.make(
                angular_eta, angular_zeta, angular_shifts, sections,
                angular_cutoff, cutoff_fn,
            ),
            num_species=num_species,
            **kwargs,
        )

    @classmethod
    def like_1x(cls, num_species: int = 4, **kwargs) -> "AEVComputer":
        return cls.make(
            ANIRadial.like_1x(), ANIAngular.like_1x(), num_species, **kwargs
        )

    @classmethod
    def like_2x(cls, num_species: int = 7, **kwargs) -> "AEVComputer":
        return cls.make(
            ANIRadial.like_2x(), ANIAngular.like_2x(), num_species, **kwargs
        )

    def set_strategy(self, strategy: str) -> "AEVComputer":
        if strategy not in ("auto", "xla", "pallas"):
            raise ValueError("Unknown compute strategy")
        return self.replace(strategy=strategy)

    # ---- entry points ----
    def __call__(
        self,
        elem_idxs: Array,  # (C, A) int, -1 padding
        coords: Array,  # (C, A, 3)
        cell: tp.Optional[Array] = None,
        pbc: tp.Optional[Array] = None,
        neighbors: tp.Optional[Neighbors] = None,
    ) -> Array:
        """Compute AEVs, shape ``(C, A, out_dim)``."""
        assert elem_idxs.ndim == 2
        assert coords.shape == elem_idxs.shape + (3,)
        if neighbors is None:
            nlist = self.neighborlist
            if nlist is None:
                nlist = parse_neighborlist("all_pairs")
            neighbors = nlist(self.radial.cutoff, elem_idxs, coords, cell, pbc)
        return self.compute_from_neighbors(elem_idxs, coords, neighbors)

    def compute_from_neighbors(
        self,
        elem_idxs: Array,  # (C, A)
        coords: tp.Optional[Array],
        neighbors: Neighbors,  # (C, A, K) table
    ) -> Array:
        """Compute AEVs from a padded neighbor table."""
        c, a = elem_idxs.shape
        # Trace-time species specialization must be decided HERE, while
        # `elem_idxs` can still be a concrete (closed-over) array: under an
        # active jit trace even `reshape` on a constant returns a tracer, so
        # deciding inside `_aev_flat` (post-reshape) silently fell back to
        # the all-species grid path in every jitted caller.
        present = self._present_species(elem_idxs)
        radial_nbrs = narrow_to_cutoff(neighbors, self.radial.cutoff)
        angular_src = neighbors
        lslice = self.angular_preslice
        if lslice is not None and lslice < neighbors.capacity:
            angular_src = Neighbors(
                idx=neighbors.idx[..., :lslice],
                mask=neighbors.mask[..., :lslice],
                diff=neighbors.diff[..., :lslice, :],
                dist=neighbors.dist[..., :lslice],
                overflow=neighbors.overflow,
                elem=None
                if neighbors.elem is None
                else neighbors.elem[..., :lslice],
            )
        angular_nbrs = narrow_to_cutoff(angular_src, self.angular.cutoff)
        cap = self._angular_capacity(neighbors.capacity, a)
        packed_prefix = cap < angular_nbrs.capacity
        if packed_prefix:
            angular_nbrs = repack_to_capacity(angular_nbrs, cap)
        # Silent truncation would yield plausibly-wrong physics; poison the
        # output with NaN instead (the TPU-friendly analog of cuAEV's
        # CUDA_KERNEL_ASSERT overflow guard, reference csrc/aev.cu:181-321).
        # Raise `angular_capacity` (or neighborlist capacity) to fix.
        overflow = neighbors.overflow | angular_nbrs.overflow
        poison = jnp.where(overflow, jnp.float32(jnp.nan), jnp.float32(1.0))
        # flatten molecules: neighbor idx are within-molecule; offset them
        offsets = (jnp.arange(c, dtype=jnp.int32) * a)[:, None, None]
        flat = lambda t, extra=(): t.reshape((c * a,) + t.shape[2:])  # noqa: E731
        rn = Neighbors(
            idx=flat(radial_nbrs.idx + offsets),
            mask=flat(radial_nbrs.mask),
            diff=flat(radial_nbrs.diff),
            dist=flat(radial_nbrs.dist),
            overflow=radial_nbrs.overflow,
            elem=None if radial_nbrs.elem is None else flat(radial_nbrs.elem),
        )
        an = Neighbors(
            idx=flat(angular_nbrs.idx + offsets),
            mask=flat(angular_nbrs.mask),
            diff=flat(angular_nbrs.diff),
            dist=flat(angular_nbrs.dist),
            overflow=angular_nbrs.overflow,
            elem=None if angular_nbrs.elem is None else flat(angular_nbrs.elem),
        )
        aev = self._aev_flat(
            elem_idxs.reshape(-1), rn, an, present=present,
            packed_prefix=packed_prefix,
        )
        return aev.reshape(c, a, self.out_dim) * poison

    def _present_species(self, elem: Array) -> tp.Optional[tp.Tuple[int, ...]]:
        """Species present in a concrete element array (None if traced/all)."""
        if isinstance(elem, jax.core.Tracer):
            return None
        host_elem = np.asarray(jax.device_get(elem))
        present = tuple(
            int(t) for t in np.unique(host_elem) if 0 <= t < self.num_species
        )
        return None if len(present) == self.num_species else present

    def _angular_capacity(self, radial_capacity: int, num_atoms: int) -> int:
        if self.angular_capacity is not None:
            return self.angular_capacity
        # Angular cutoff is much smaller than radial (3.5 vs 5.2 A) so for
        # big tables the angular one can be repacked ~(rca/rcr)^3 smaller
        # (cuts the dominant (A, Ka, Ka, Z) work ~3x, the same narrowing the
        # reference does at _computer.py:283-285).  Small tables (molecule
        # batches) are kept at full capacity — shrinking risks overflow on
        # dense clusters and saves little.
        if radial_capacity <= 40:
            return radial_capacity
        # density-based estimate at the angular cutoff (liquid-water-ish
        # density + safety, like the radial default capacity heuristic);
        # overflow is detected by the repack and surfaces via the flag.
        # Angular work scales as capacity^2, so the margin is kept tight
        # (measured: liquid water at 3.5 A has <=23 real neighbors; 15%
        # safety + ceil4 lands on 28, 6% faster than 32 on v5e).
        import math as _math

        est = int(
            _math.ceil(4.0 / 3.0 * _math.pi * self.angular.cutoff**3 * 0.12 * 1.15)
        )
        est = max(24, _ceil_to(est, 4))
        return min(est, radial_capacity)

    # ---- core ----
    def _aev_flat(
        self,
        elem_flat: Array,  # (N,)
        radial_nbrs: Neighbors,  # (N, K)
        angular_nbrs: Neighbors,  # (N, Ka)
        present: tp.Optional[tp.Tuple[int, ...]] = None,
        packed_prefix: bool = False,
    ) -> Array:
        # row count from the table, not elem_flat: for sharded (domain-
        # decomposed) evaluation the tables hold one shard of atom rows while
        # elem_flat stays global (neighbor idx are global atom indices)
        n = radial_nbrs.idx.shape[0]
        s = self.num_species
        p = self.num_species_pairs

        # Trace-time species specialization: when the element array is a
        # concrete constant (e.g. the MD driver jit-closes over a fixed
        # topology), restrict the per-species accumulations to the species
        # actually present — a water box uses 2 of ANI-2x's 7 species, so
        # the angular pair accumulation shrinks from S^2 to S_present^2
        # passes.  Traced element arrays (the normal batched-API path) keep
        # the full set.  Callers with a concrete (C, A) element array pass
        # `present` explicitly (see `_present_species`): by the time this
        # runs, `elem_flat` has gone through a traced `reshape`.
        if present is None:
            present = self._present_species(elem_flat)

        # --- radial ---
        with jax.named_scope("aev:radial"):
            rmask = radial_nbrs.mask
            rterms = self.radial(radial_nbrs.dist) * rmask[..., None]  # (N, K, R)
            nbr_elem = radial_nbrs.nbr_elem(elem_flat)  # (N, K)
            onehot = jax.nn.one_hot(
                jnp.where(rmask, nbr_elem, -1), s, dtype=rterms.dtype
            )  # (N, K, S); -1 rows are all-zero
            # species accumulation as masked VPU sums (an (R x K x S) matmul
            # is a terrible MXU shape; see the angular path)
            rfeats = rterms.shape[-1]
            radial_aev = jnp.stack(
                [
                    jnp.sum(rterms * onehot[:, :, None, t], axis=1)
                    if (present is None or t in present)
                    else jnp.zeros((n, rfeats), rterms.dtype)
                    for t in range(s)
                ],
                axis=1,
            ).reshape(n, self.radial_len)

        # --- angular ---
        amask = angular_nbrs.mask
        adist = jnp.where(amask, angular_nbrs.dist, 1.0)
        adiff = angular_nbrs.diff
        aelem = jnp.where(amask, angular_nbrs.nbr_elem(elem_flat), 0)
        aoh = jax.nn.one_hot(
            jnp.where(amask, aelem, -1), s, dtype=radial_aev.dtype
        )  # (N, Ka, S), zero rows for masked lanes

        atom_block = self._atom_block(angular_nbrs.capacity)
        split = self.angular_split if packed_prefix else None
        if self._use_pallas():
            angular_aev = _angular_pallas_op(
                self._pallas_config(),
                adist,
                adiff,
                amask.astype(adist.dtype),
                aoh,
            )
        elif (
            split is not None
            and 0 < split[1] < n
            and (
                split[0] < angular_nbrs.capacity
                or (len(split) > 2 and split[2] < n)
            )
        ):
            angular_aev = self._angular_split_xla(
                atom_block, adist, adiff, amask.astype(adist.dtype), aoh,
                present,
            )
        else:
            angular_aev = _angular_xla(
                self.angular, s, atom_block, adist, adiff,
                amask.astype(adist.dtype), aoh, present,
            )
        return jnp.concatenate([radial_aev, angular_aev], axis=-1)

    def _angular_split_xla(
        self,
        atom_block: int,
        adist: Array,  # (N, Ka), masked lanes 1.0
        adiff: Array,  # (N, Ka, 3)
        amaskf: Array,  # (N, Ka) float 0/1
        aoh: Array,  # (N, Ka, S)
        present: tp.Optional[tp.Tuple[int, ...]],
    ) -> Array:
        """Count-class angular evaluation (see ``angular_split``).

        Rows are reordered by descending valid-lane count (f32-key top_k;
        the permutation and its inverse are applied through `_perm_rows`,
        keeping both AD directions in the wide-row-gather class).  Because
        the repacked table holds each row's valid lanes as a prefix, the
        sparse class is a *static* lane slice ``[:, :k_small]``.  If more
        than ``n_dense`` rows exceed ``k_small`` lanes, the result would be
        silently truncated — NaN-poisoned instead (capacity-overflow
        convention).

        A 3-tuple split ``(k_small, n_dense, n_rows)`` adds a third,
        EMPTY class: rows past ``n_rows`` in count order are emitted as
        zeros without touching the angular math.  A row with zero valid
        lanes has an exactly-zero angular AEV (every pair term carries the
        lane-mask product), so this is exact as long as no nonzero-count
        row lands in the tail — guarded by the same NaN-poison.  Batched
        training tables are the use case: conformer batches pad the atom
        axis to the batch max (~40% padding rows at GDB-like size
        distributions), and padded rows otherwise ride the full angular
        block loop.  The reference never pays this cost at all — its CUDA
        path enumerates real pairs only (`csrc/aev.cu`) — so the skip is
        what keeps the TPU static-shape design honest against it.
        """
        s = self.num_species
        split = tp.cast(tp.Tuple[int, ...], self.angular_split)
        k_small, n_dense = int(split[0]), int(split[1])
        n = adist.shape[0]
        n_rows = min(int(split[2]), n) if len(split) > 2 else n
        k_small = min(k_small, adist.shape[1])
        n_dense = min(n_dense, n_rows)
        # permutation is topology, not physics: derive it from the
        # stop-gradient mask so no AD pass ever linearizes the count sort
        counts = jnp.sum(jax.lax.stop_gradient(amaskf), axis=1)
        _, order = jax.lax.top_k(counts, n)  # descending, f32 keys
        # inverse of a permutation is a sort, not a scatter: sorting
        # `order`'s (unique, < 2^24 so f32-exact) values carries iota into
        # inverse positions.  The scatter form replays per AD pass under
        # force training's grad-of-grad; f32 sorts are the fast TPU class.
        iota = jnp.arange(n, dtype=jnp.int32)
        if n < (1 << 24):
            _, inv = jax.lax.sort_key_val(order.astype(jnp.float32), iota)
        else:
            inv = jnp.zeros((n,), jnp.int32).at[order].set(iota)
        ok = jnp.sum(counts > k_small) <= n_dense
        if n_rows < n:
            # rectangular permutation: gather only the n_rows evaluated
            # rows in; the inverse with a >= n_rows sentinel emits the
            # zero-count tail as exact zeros on the way out (perm_gather's
            # sentinel convention) — the tail never rides a gather at all
            ok &= jnp.sum(counts > 0) <= n_rows
            order = jax.lax.slice_in_dim(order, 0, n_rows)
            inv = jnp.where(inv < n_rows, inv, jnp.int32(n_rows))
        pd = lambda x: _perm_rows(x, order, inv)  # noqa: E731
        adist, adiff, amaskf, aoh = pd(adist), pd(adiff), pd(amaskf), pd(aoh)
        if k_small >= adist.shape[1]:
            # pure row-skip policy (k_small == capacity): one class over
            # the evaluated rows — a dense/small partition at identical
            # lane capacity would pay a redundant concat and an extra
            # block-loop restart for no work reduction (the counts >
            # k_small poison term is vacuously satisfied).
            body = _angular_xla(
                self.angular, s, atom_block, adist, adiff, amaskf, aoh,
                present,
            )
        else:
            # Dense class as ONE block when its residuals are small: the
            # block loop's backward costs ~3x its forward (replay + carry
            # copies; r5 ef profile), and a single unrematted block skips
            # both.  Guarded by the pair-lane volume so huge systems keep
            # the remat loop (r5 sweep: dense single-block + small @256
            # measured 3.44 vs 3.80 ms aev_tbl f+b at 10k-atom MD shapes;
            # larger SMALL blocks measured worse).
            dense_blk = atom_block
            if n_dense * adist.shape[1] ** 2 <= 2_000_000:
                dense_blk = max(n_dense, 1)
            dense = _angular_xla(
                self.angular, s, dense_blk,
                adist[:n_dense], adiff[:n_dense], amaskf[:n_dense],
                aoh[:n_dense], present,
            )
            small = _angular_xla(
                self.angular, s, self._atom_block(k_small),
                adist[n_dense:, :k_small], adiff[n_dense:, :k_small],
                amaskf[n_dense:, :k_small], aoh[n_dense:, :k_small],
                present,
            )
            body = jnp.concatenate([dense, small], axis=0)
        out = _perm_rows(body, inv, order)
        return out * jnp.where(ok, jnp.float32(1.0), jnp.float32(jnp.nan))

    def _atom_block(self, ka: int) -> int:
        """Atoms per angular tile (None = pair-work budget policy).

        Per-block angular work scales as ``blk * ka^2``.  v5e measurements:
        at MD-class capacities (Ka>=16) 256 is the sweet spot (Ka=28: 256
        best of {256,512,1024,2048}; Ka=18 count-split class: 576 measured
        neutral-to-worse than 256), while small training capacities want a
        ~1.8e5 lane-pair budget per block (Ka=12: 1280 -> 87.5 ms/step vs
        99.7 at 256 — the 260-iteration block loop pays ~40 us each).  Too
        small wastes loop overhead; too large loses the remat/fusion sweet
        spot."""
        if self.atom_block is not None:
            return self.atom_block
        if ka >= 16:
            return 256
        blk = 180_000 // max(ka * ka, 1)
        return int(min(max(_ceil_to(blk, 64), 64), 4096))

    def _use_pallas(self) -> bool:
        if self.strategy == "xla":
            return False
        supported = (
            type(self.angular) is ANIAngular
            and type(self.angular.cutoff_fn).__name__
            in ("CutoffCosine", "CutoffSmooth")
        )
        if self.strategy == "pallas":
            if not supported:
                raise ValueError(
                    "pallas strategy supports ANIAngular with cosine/smooth "
                    "cutoffs only"
                )
            return True
        # auto: the tuned XLA path currently beats the fused kernel on v5e
        # (the kernel is latency-bound at VMEM-fitting tile sizes); opt in
        # with strategy="pallas" explicitly.
        return False

    def _pallas_config(self) -> tp.Tuple:
        cutoff_kind = (
            "cosine"
            if type(self.angular.cutoff_fn).__name__ == "CutoffCosine"
            else "smooth"
        )
        return (
            float(np.asarray(self.angular.eta)[0]),
            float(np.asarray(self.angular.zeta)[0]),
            tuple(np.asarray(self.angular.shifts).tolist()),
            tuple(np.asarray(self.angular.sections).tolist()),
            float(self.angular.cutoff),
            cutoff_kind,
            self.num_species,
            self.atom_block or 1024,
        )


@functools.lru_cache(maxsize=None)
def _packed_pair_selectors(ka: int) -> tp.Tuple[np.ndarray, np.ndarray, int]:
    """Static (Ka, Kp) 0/1 gather matrices for the packed j<k pair axis.

    Gathering neighbor-lane quantities onto the pair axis via ``jnp.take``
    would be a *lane* gather — pathological on TPU (measured: it erases the
    whole packing win).  A one-hot matmul gather runs on the MXU, is exact
    (each output column has a single 1), and its transpose — the backward
    scatter-add — is the same matmul transposed.  Padded pair lanes (beyond
    the true pair count) have all-zero columns, masking them for free.
    """
    pj, pk = np.triu_indices(ka, 1)
    kp0 = pj.shape[0]
    kp = max(_ceil_to(kp0, 8), 8)
    gj = np.zeros((ka, kp), dtype=np.float32)
    gk = np.zeros((ka, kp), dtype=np.float32)
    gj[pj, np.arange(kp0)] = 1.0
    gk[pk, np.arange(kp0)] = 1.0
    return gj, gk, kp0


def _angular_rows_packed(
    angular: BaseAngular,
    num_species: int,
    dist: Array,  # (M, Ka), masked lanes 1.0
    diff: Array,  # (M, Ka, 3)
    maskf: Array,  # (M, Ka) float 0/1
    oh: Array,  # (M, Ka, S), zero rows in masked lanes
    present: tp.Optional[tp.Tuple[int, ...]] = None,
) -> Array:
    """Angular AEV rows over a packed j<k pair axis.

    The grid formulation (`_angular_rows`) computes terms on the full
    (Ka, Ka) neighbor-pair grid and masks the lower triangle — half the
    transcendental work is discarded.  Here the strict upper triangle is
    packed into a flat static-index pair axis (Ka(Ka-1)/2 lanes), halving
    the dominant per-pair term math; the species-pair accumulation becomes
    one masked VPU sum per *present* species pair, so this path wins when
    few species are present (e.g. MD on water: 3 pairs) and loses to the
    two-sided grid contraction for many-species batches.
    """
    m, ka = dist.shape
    s = num_species
    gj_np, gk_np, kp0 = _packed_pair_selectors(ka)
    kp = gj_np.shape[1]
    gj = jnp.asarray(gj_np)
    gk = jnp.asarray(gk_np)
    sp = tuple(range(s)) if present is None else present
    fast = type(angular) is ANIAngular
    # One stacked feature tensor per side: every per-neighbor-lane quantity
    # (distance, diff components, cutoff envelope, per-species one-hots) is
    # gathered onto the pair axis in a single (M*F, Ka) @ (Ka, Kp) matmul.
    feats = [dist, diff[:, :, 0], diff[:, :, 1], diff[:, :, 2]]
    if fast:
        # The cutoff envelope fc(r) factorizes per neighbor lane: evaluate
        # it once on the (M, Ka) table (masked lanes get fc=0, masking every
        # pair that touches them) instead of two transcendental evals per
        # (much longer) pair lane.
        feats.append(angular.cutoff_fn(dist, angular.cutoff) * maskf)
    else:
        feats.append(maskf)
    feats.extend(oh[:, :, t] for t in sp)
    f = len(feats)
    stacked = jnp.stack(feats, axis=1).reshape(m * f, ka)  # (M*F, Ka)
    side_j = jnp.dot(stacked, gj, precision=_HIGHEST).reshape(m, f, kp)
    side_k = jnp.dot(stacked, gk, precision=_HIGHEST).reshape(m, f, kp)
    dj, dk = side_j[:, 0], side_k[:, 0]
    dots = jnp.sum(side_j[:, 1:4] * side_k[:, 1:4], axis=1)  # (M, Kp)
    # padded pair lanes have all-zero selector columns -> dj = dk = 0 there
    cosang = dots / jnp.clip(dj * dk, min=1e-10)
    z = angular.num_feats
    if fast:
        # Fully transposed term math: every tensor keeps the long pair axis
        # LAST (the VPU lane dim) and the short feature axes in the middle —
        # measured ~1.5x faster fwd+bwd than feature-minor layouts at
        # (Ka=28, Z=32) shapes (tools/layout_microbench.py).
        envelope = side_j[:, 4] * side_k[:, 4]
        mean = 0.5 * (dj + dk)
        shifts = angular.shifts[:, None]  # (Sh, 1)
        rad_t = jnp.exp(-angular.eta[0] * (mean[:, None, :] - shifts) ** 2)
        c = 0.95 * cosang
        sin_t = jnp.sqrt(1.0 - c * c)
        sections = angular.sections[:, None]  # (Se, 1)
        cos_dev = (
            c[:, None, :] * jnp.cos(sections)
            + sin_t[:, None, :] * jnp.sin(sections)
        )
        ang_t = 2 * ((1 + cos_dev) / 2) ** angular.zeta[0]  # (M, Se, Kp)
        terms = (rad_t[:, :, None, :] * ang_t[:, None, :, :]).reshape(
            m, z, kp
        ) * envelope[:, None, :]  # (M, Z, Kp)
    else:
        pmaskf = side_j[:, 4] * side_k[:, 4]
        terms = angular(
            jnp.where(pmaskf > 0.5, dj, 1.0),
            jnp.where(pmaskf > 0.5, dk, 1.0),
            cosang,
        ) * pmaskf[..., None]  # (M, Kp, Z)
        terms = jnp.swapaxes(terms, 1, 2)  # (M, Z, Kp)
    ohj = {t: side_j[:, 5 + i] for i, t in enumerate(sp)}  # (M, Kp) each
    ohk = {t: side_k[:, 5 + i] for i, t in enumerate(sp)}
    triu = _triu_index(s)
    slots: tp.Dict[int, Array] = {}
    for i, t1 in enumerate(sp):
        for t2 in sp[i:]:
            if t1 == t2:
                w = ohj[t1] * ohk[t1]
            else:
                w = ohj[t1] * ohk[t2] + ohj[t2] * ohk[t1]
            slots[int(triu[t1, t2])] = jnp.sum(
                terms * w[:, None, :], axis=2
            )  # (M, Z)
    p = s * (s + 1) // 2
    # static-position column stack, NOT `.at[:, pos].set(...)`: the pair
    # positions are Python ints, and the scatter form replays in every AD
    # pass of force training's grad-of-grad
    zero = jnp.zeros((m, z), terms.dtype)
    packed = jnp.stack([slots.get(j, zero) for j in range(p)], axis=1)
    return packed.reshape(m, p * z)


def _angular_rows_packed_atoms_last(
    angular: BaseAngular,
    num_species: int,
    dist: Array,  # (M, Ka), masked lanes 1.0
    diff: Array,  # (M, Ka, 3)
    maskf: Array,  # (M, Ka) float 0/1
    oh: Array,  # (M, Ka, S), zero rows in masked lanes
    present: tp.Optional[tp.Tuple[int, ...]] = None,
) -> Array:
    """Packed-triangle angular path with the ATOM axis last (in lanes).

    `_angular_rows_packed` keeps the pair axis last because at MD
    capacities it is long (Ka=28 -> 378 pair lanes ~ 3 full 128-lane VPU
    tiles).  At training capacities it is short — Ka=12 packs to 66
    lanes, so every (M, Z, Kp) stream runs its tiles at <=56% lane
    utilization and the (M, Z) species sums at ~3% (HLO layouts
    T(8,128)/T(4,128) with 72/4-wide minor dims; r4 profile).  This
    variant transposes every stream so the atom-block axis (>=128 rows)
    rides the lanes and the short pair/feature axes ride sublanes.
    Math identical; selected by `_angular_rows` when the packed pair
    count is below one lane tile.  Measured: e+f training at Ka=12
    30.7 -> 23.3 ms/step (docs/performance.md).
    """
    m, ka = dist.shape
    s = num_species
    gj_np, gk_np, _ = _packed_pair_selectors(ka)
    kp = gj_np.shape[1]
    sp = tuple(range(s)) if present is None else present
    fast = type(angular) is ANIAngular
    feats = [dist, diff[:, :, 0], diff[:, :, 1], diff[:, :, 2]]
    if fast:
        feats.append(angular.cutoff_fn(dist, angular.cutoff) * maskf)
    else:
        feats.append(maskf)
    feats.extend(oh[:, :, t] for t in sp)
    f = len(feats)
    # selector on the LHS: (Kp, Ka) @ (Ka, F*M) — every downstream op
    # then streams over the long atom axis in the lane dimension
    stacked = jnp.stack(feats, axis=0)  # (F, M, Ka)
    st = stacked.transpose(2, 0, 1).reshape(ka, f * m)
    side_j = jnp.dot(
        jnp.asarray(gj_np.T), st, precision=_HIGHEST
    ).reshape(kp, f, m)
    side_k = jnp.dot(
        jnp.asarray(gk_np.T), st, precision=_HIGHEST
    ).reshape(kp, f, m)
    dj, dk = side_j[:, 0], side_k[:, 0]  # (Kp, M)
    dots = jnp.sum(side_j[:, 1:4] * side_k[:, 1:4], axis=1)  # (Kp, M)
    # padded pair lanes have all-zero selector columns -> dj = dk = 0 there
    cosang = dots / jnp.clip(dj * dk, min=1e-10)
    z = angular.num_feats
    if fast:
        envelope = side_j[:, 4] * side_k[:, 4]  # (Kp, M)
        mean = 0.5 * (dj + dk)
        shifts = angular.shifts[:, None, None]  # (Sh, 1, 1)
        rad_t = jnp.exp(
            -angular.eta[0] * (mean[None] - shifts) ** 2
        )  # (Sh, Kp, M)
        c = 0.95 * cosang
        sin_t = jnp.sqrt(1.0 - c * c)
        sections = angular.sections[:, None, None]  # (Se, 1, 1)
        cos_dev = (
            c[None] * jnp.cos(sections) + sin_t[None] * jnp.sin(sections)
        )
        ang_t = 2 * ((1 + cos_dev) / 2) ** angular.zeta[0]  # (Se, Kp, M)
        terms = (
            rad_t[:, None, :, :] * ang_t[None, :, :, :]
        ).reshape(z, kp, m) * envelope[None]  # (Z, Kp, M)
    else:
        pmaskf = side_j[:, 4] * side_k[:, 4]
        terms = angular(
            jnp.where(pmaskf > 0.5, dj, 1.0),
            jnp.where(pmaskf > 0.5, dk, 1.0),
            cosang,
        ) * pmaskf[..., None]  # (Kp, M, Z)
        terms = terms.transpose(2, 0, 1)  # (Z, Kp, M)
    ohj = {t: side_j[:, 5 + i] for i, t in enumerate(sp)}  # (Kp, M) each
    ohk = {t: side_k[:, 5 + i] for i, t in enumerate(sp)}
    triu = _triu_index(s)
    slots: tp.Dict[int, Array] = {}
    for i, t1 in enumerate(sp):
        for t2 in sp[i:]:
            if t1 == t2:
                w = ohj[t1] * ohk[t1]
            else:
                w = ohj[t1] * ohk[t2] + ohj[t2] * ohk[t1]
            slots[int(triu[t1, t2])] = jnp.sum(
                terms * w[None], axis=1
            )  # (Z, M)
    p = s * (s + 1) // 2
    zero = jnp.zeros((z, m), terms.dtype)
    packed = jnp.stack(
        [slots.get(j, zero) for j in range(p)], axis=0
    )  # (P, Z, M)
    return packed.reshape(p * z, m).T


def _angular_rows(
    angular: BaseAngular,
    num_species: int,
    dist: Array,  # (M, Ka), masked lanes 1.0
    diff: Array,  # (M, Ka, 3)
    maskf: Array,  # (M, Ka) float 0/1
    oh: Array,  # (M, Ka, S), zero rows in masked lanes
    present: tp.Optional[tp.Tuple[int, ...]] = None,
) -> Array:
    """Angular AEV rows, pure XLA (the reference 'pyaev' analog and the
    recompute path for the Pallas custom_vjp backward)."""
    s = num_species
    sp_count = s if present is None else len(present)
    # Packed-triangle path: halves the per-pair transcendental work but pays
    # one contraction pass per present species *pair*; wins for few species
    # (MD on molecular liquids), loses for many-species training batches
    # where the two-sided grid contraction is O(S) passes instead of O(S^2).
    ka = dist.shape[1]
    if sp_count <= 4 and ka >= 12:
        # short packed pair axis (under one 128-lane tile): atom-last
        # layout keeps the VPU tiles full (training capacities); long
        # pair axis (MD capacities): pair-last layout streams over it
        if ka * (ka - 1) // 2 < 128 and dist.shape[0] >= 128:
            return _angular_rows_packed_atoms_last(
                angular, num_species, dist, diff, maskf, oh, present
            )
        return _angular_rows_packed(
            angular, num_species, dist, diff, maskf, oh, present
        )
    return _angular_rows_grid(
        angular, num_species, dist, diff, maskf, oh, present
    )


def _angular_rows_grid(
    angular: BaseAngular,
    num_species: int,
    dist: Array,  # (M, Ka), masked lanes 1.0
    diff: Array,  # (M, Ka, 3)
    maskf: Array,  # (M, Ka) float 0/1
    oh: Array,  # (M, Ka, S), zero rows in masked lanes
    present: tp.Optional[tp.Tuple[int, ...]] = None,
) -> Array:
    """Grid formulation: full (Ka, Ka) pair grid with a j<k mask, two-sided
    per-species contraction (O(S) passes)."""
    m, ka = dist.shape
    s = num_species
    iu1, iu2 = np.triu_indices(s)
    mask = maskf > 0.5
    pair_mask = (
        mask[:, :, None]
        & mask[:, None, :]
        & (
            jax.lax.broadcasted_iota(jnp.int32, (ka, ka), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (ka, ka), 1)
        )[None]
    )  # (M, Ka, Ka), j < k strictly
    dprod = jnp.clip(dist[:, :, None] * dist[:, None, :], min=1e-10)
    # explicit 3-term dot: a K=3 batched matmul is a terrible MXU shape;
    # as broadcasts it fuses on the VPU
    dots = (
        diff[:, :, None, 0] * diff[:, None, :, 0]
        + diff[:, :, None, 1] * diff[:, None, :, 1]
        + diff[:, :, None, 2] * diff[:, None, :, 2]
    )
    cosang = dots / dprod
    terms = angular(
        dist[:, :, None] * jnp.ones((1, 1, ka), dist.dtype),
        dist[:, None, :] * jnp.ones((1, ka, 1), dist.dtype),
        cosang,
    )  # (M, Ka, Ka, Z)
    terms = terms * pair_mask[..., None]
    # Two-sided decomposition of the species-pair one-hot:
    #   V[s1, s2, z] = sum_{j<k} T[j, k, z] oh[j, s1] oh[k, s2]
    #   aev[p{s1, s2}] = V[s1, s2] + V[s2, s1]  (s1 < s2; diag once)
    # Contracted as explicit masked sums (NOT einsum): with S ~ 4-7 and
    # Z ~ 32 these are terrible MXU matmul shapes but trivial VPU
    # reductions that XLA sibling-fuses into single passes over terms.
    sp = tuple(range(s)) if present is None else present
    w = jnp.stack(
        [jnp.sum(terms * oh[:, None, :, None, t], axis=2) for t in sp],
        axis=-1,
    )  # (M, Ka_j, Z, Sp)
    v = jnp.stack(
        [jnp.sum(w * oh[:, :, None, None, t2], axis=1) for t2 in sp],
        axis=1,
    )  # (M, Sp_j, Z, Sp_k)
    v = jnp.swapaxes(v, 2, 3)  # (M, Sp_j, Sp_k, Z)
    # Static-position column stack over the packed species-pair axis
    # (absent pairs are exact zero columns; diagonal pairs counted once,
    # off-diagonal symmetrized).  NOT `.at[...].set(...)`: those scatters
    # replay in every AD pass of force training's grad-of-grad.
    z = v.shape[-1]
    pos_of = {t: i for i, t in enumerate(sp)}
    zero = jnp.zeros((m, z), v.dtype)
    cols = []
    for j in range(len(iu1)):
        s1, s2 = int(iu1[j]), int(iu2[j])
        if s1 in pos_of and s2 in pos_of:
            i1, i2 = pos_of[s1], pos_of[s2]
            cols.append(
                v[:, i1, i1]
                if s1 == s2
                else v[:, i1, i2] + v[:, i2, i1]
            )
        else:
            cols.append(zero)
    packed = jnp.stack(cols, axis=1)
    return packed.reshape(m, len(iu1) * z)


def _angular_xla(
    angular: BaseAngular,
    num_species: int,
    atom_block: int,
    dist: Array,
    diff: Array,
    maskf: Array,
    oh: Array,
    present: tp.Optional[tp.Tuple[int, ...]] = None,
) -> Array:
    """Atom-block-tiled XLA angular path with rematerialization."""
    n = dist.shape[0]
    blk = min(atom_block, n)
    n_pad = _ceil_to(n, blk)
    pad = n_pad - n

    def pad0(x, fill=0.0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    args = (pad0(dist, 1.0), pad0(diff), pad0(maskf), pad0(oh))
    nblk = n_pad // blk
    if nblk == 1:
        with jax.named_scope("aev:angular"):
            out = _angular_rows(angular, num_species, *args, present=present)
    else:
        # remat: under reverse-mode AD, scan would otherwise stash every
        # block's (blk, Ka, Ka, Z) intermediates for the backward pass —
        # O(A * Ka^2 * Z) HBM.  Recomputing the block forward during
        # backward keeps memory at one block (the jax.checkpoint analog of
        # cuAEV's kernel-local recomputation).
        #
        # Measured and rejected (r2): a save-names policy stashing the
        # packed path's transcendental outputs (exp/pow/sqrt residuals,
        # ~200 MB at 10k-atom MD shapes) made the step SLOWER (aev_tbl
        # fwd+bwd 7.03 vs 6.41 ms) — the residual HBM traffic costs more
        # than re-running the transcendentals, so full recompute stays.
        reshape_blk = lambda x: x.reshape((nblk, blk) + x.shape[1:])  # noqa: E731
        body = lambda a: _angular_rows(  # noqa: E731
            angular, num_species, *a, present=present
        )
        import os

        if os.environ.get("TORCHANI_TPU_ANGULAR_REMAT", "1") != "0":
            # default: full recompute in backward (one block of residuals;
            # a save-names policy measured SLOWER at MD shapes — see
            # docs/performance.md "measured and rejected")
            body = jax.checkpoint(body)
        # Known residual (r4 HLO audit): XLA lays this loop's accumulator
        # out transposed ({1,0,2}), paying a copy + strided update-slice
        # per block (~1.1 ms/step of the MD AEV stage).  Emitting the
        # block output transposed measured a WASH (4.58 vs 4.66 ms — the
        # copy just moves sides); no jax-level layout control exists for
        # loop carries, so this stays the documented r5 lever.
        out = jax.lax.map(
            body,
            tuple(reshape_blk(x) for x in args),
        ).reshape(n_pad, -1)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _angular_pallas_op(config, dist, diff, maskf, oh):
    """Fused Pallas angular forward with an XLA-recompute backward.

    ``config`` is the hashable parameter tuple from
    `AEVComputer._pallas_config`; the backward re-derives gradients through
    the pure-XLA row function (so grad-of-grad for force training works
    without a hand-written double-backward kernel).
    """
    from torchani_tpu.aev.pallas_kernels import angular_aev_pallas

    eta, zeta, shifts, sections, cutoff, kind, s, tile = config
    return angular_aev_pallas(
        dist,
        diff,
        maskf > 0.5,
        oh,
        eta=eta,
        zeta=zeta,
        shifts=shifts,
        sections=sections,
        cutoff=cutoff,
        cutoff_kind=kind,
        num_species=s,
        tile=16,
        # off-TPU (CPU test/debug runs, and `jax.default_device(cpu)`
        # contexts like the on-chip smoke's CPU anchor) the kernel must
        # interpret — Mosaic only lowers for TPU
        interpret=not _lowering_targets_tpu(),
    )


def _angular_pallas_fwd(config, dist, diff, maskf, oh):
    return _angular_pallas_op(config, dist, diff, maskf, oh), (
        dist,
        diff,
        maskf,
        oh,
    )


def _angular_pallas_bwd(config, residuals, g):
    dist, diff, maskf, oh = residuals
    eta, zeta, shifts, sections, cutoff, kind, s, tile = config
    angular = ANIAngular.make(eta, zeta, shifts, sections, cutoff, kind)

    def f(d, df):
        return _angular_xla(angular, s, tile, d, df, maskf, oh)

    _, vjp = jax.vjp(f, dist, diff)
    dd, ddf = vjp(g)
    return dd, ddf, jnp.zeros_like(maskf), jnp.zeros_like(oh)


_angular_pallas_op.defvjp(_angular_pallas_fwd, _angular_pallas_bwd)
