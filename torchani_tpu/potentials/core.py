"""Base classes for atomic potentials.

TPU-native counterparts of ``/root/reference/torchani/potentials/core.py``.
Pair potentials operate on the padded *full* neighbor table (`Neighbors`,
``(C, A, K)``): per-lane energies are computed with masked broadcasting, and
per-atom / per-molecule reductions are masked sums (each true pair appears in
two lanes, hence the 0.5 factor — replacing the reference's half-pair-list
``index_add_`` scatter, ``core.py:195-207``).
"""

import math
import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array, Symbols
from torchani_tpu.constants import ATOMIC_NUMBER
from torchani_tpu.cutoffs import Cutoff, CutoffArg, CutoffDummy, parse_cutoff_fn
from torchani_tpu.neighbors import Neighbors, all_pairs, adaptive_list
from torchani_tpu.nn import SpeciesConverter
from torchani_tpu.tuples import EnergiesScalars
from torchani_tpu.units import ANGSTROM_TO_BOHR

__all__ = ["Potential", "DummyPotential", "BasePairPotential"]


class Potential(struct.PyTreeNode):
    """Base class for all atomic potentials.

    Subclasses must implement `compute_from_neighbors` and declare their
    (static) ``cutoff``.  ``math.inf`` means "needs all pairs".
    """

    symbols: Symbols = struct.field(pytree_node=False)
    cutoff: float = struct.field(pytree_node=False, default=math.inf)
    enabled: bool = struct.field(pytree_node=False, default=True)

    @property
    def atomic_numbers(self) -> tp.Tuple[int, ...]:
        return tuple(ATOMIC_NUMBER[s] for s in self.symbols)

    @property
    def num_species(self) -> int:
        return len(self.symbols)

    def __call__(
        self,
        species: Array,
        coords: Array,
        cell: tp.Optional[Array] = None,
        pbc: tp.Optional[Array] = None,
        atomic: bool = False,
        ensemble_values: bool = False,
        atomic_nums_input: bool = True,
    ) -> Array:
        """Standalone evaluation: build a neighborlist, then compute."""
        if atomic_nums_input:
            elem_idxs = SpeciesConverter(self.symbols)(species)
        else:
            elem_idxs = species
        assert elem_idxs.ndim == 2
        assert coords.shape == elem_idxs.shape + (3,)
        cutoff = self.cutoff
        if math.isinf(cutoff):
            neighbors = all_pairs(cutoff, elem_idxs, coords, cell, pbc)
        elif elem_idxs.shape[0] == 1:
            neighbors = adaptive_list(cutoff, elem_idxs, coords, cell, pbc)
        else:
            neighbors = all_pairs(cutoff, elem_idxs, coords, cell, pbc)
        return self.compute_from_neighbors(
            elem_idxs, coords, neighbors, atomic=atomic,
            ensemble_values=ensemble_values,
        ).energies

    def compute_from_neighbors(
        self,
        elem_idxs: Array,
        coords: tp.Optional[Array],
        neighbors: Neighbors,
        charge: int = 0,
        atomic: bool = False,
        ensemble_values: bool = False,
        ghost_flags: tp.Optional[Array] = None,
    ) -> EnergiesScalars:
        raise NotImplementedError("Must be implemented by subclasses")


class DummyPotential(Potential):
    def compute_from_neighbors(
        self,
        elem_idxs: Array,
        coords: tp.Optional[Array],
        neighbors: Neighbors,
        charge: int = 0,
        atomic: bool = False,
        ensemble_values: bool = False,
        ghost_flags: tp.Optional[Array] = None,
    ) -> EnergiesScalars:
        shape = elem_idxs.shape if atomic else elem_idxs.shape[:1]
        return EnergiesScalars(jnp.zeros(shape, dtype=jnp.float32))


class BasePairPotential(Potential):
    """Template for 2-body potentials.

    Subclasses implement `pair_energies` over the masked lanes of a
    neighbor table.  The base wraps it with the cutoff-function envelope,
    optional ghost-pair 0.5 scaling (domain-decomposition hook, reference
    ``core.py:170-178``), and masked reductions.
    """

    cutoff_fn: Cutoff = struct.field(pytree_node=False, default=CutoffDummy())

    ANGSTROM_TO_BOHR: tp.ClassVar[float] = ANGSTROM_TO_BOHR

    @staticmethod
    def clamp(distances: Array) -> Array:
        return jnp.clip(distances, min=1e-7)

    def pair_energies(self, elem_idxs: Array, neighbors: Neighbors) -> Array:
        """Per-lane pair energies, shape ``(..., A, K)``.

        ``elem_idxs`` is flat ``(N,)`` over all atoms of the (flattened)
        batch; ``neighbors.idx`` indexes into it.  Masked lanes may hold
        arbitrary values — the caller masks them out.
        """
        raise NotImplementedError("Must be overriden by subclasses")

    def elem_pairs(
        self, elem_flat: Array, neighbors: Neighbors
    ) -> tp.Tuple[Array, Array]:
        """(center, neighbor) element indices per lane, shape ``(N, K)``.

        Uses the table's packed neighbor species (``Neighbors.elem``) when
        present — the per-lane ``elem_flat[idx]`` gather costs ~23 ms/step
        at solvated-protein MD shapes ((9775, 370) lanes, profiled)."""
        center = elem_flat[:, None]
        nbr = neighbors.nbr_elem(elem_flat)
        nbr = jnp.where(neighbors.mask, nbr, 0)
        center = jnp.where(neighbors.mask, center, 0)
        return center, nbr

    def pair_tables(
        self, elem_center: Array, elem_nbr: Array, *tables: Array
    ) -> tp.List[Array]:
        """Look up several element-pair-keyed constant tables with ONE
        folded payload gather.

        Per-lane ``(S, S[, ...])`` advanced indexing lowers to one
        row-gather PER TABLE on TPU (~290M rows/s, 2.5x worse again for
        scalar payloads); the five class-table gathers of the
        dispersion+repulsion stack profiled at ~95 ms/step of the
        solvated-protein MD step.  Folding every class-keyed constant into
        a single ``(S*S, sum_channels)`` payload makes ONE wide-row gather
        — and the tables are constants, so there is no backward at all.
        """
        s = tables[0].shape[0]
        folded = jnp.concatenate(
            [t.reshape(s * s, -1) for t in tables], axis=1
        )  # constant-folded at compile time
        code = elem_center * s + elem_nbr  # masked lanes ride as class 0
        flat = jnp.take(folded, code.reshape(-1), axis=0)
        out = flat.reshape(code.shape + (folded.shape[-1],))
        res: tp.List[Array] = []
        o = 0
        for t in tables:
            if t.ndim > 2:
                c = int(np.prod(t.shape[2:]))
                res.append(out[..., o : o + c].reshape(code.shape + t.shape[2:]))
            else:
                c = 1
                res.append(out[..., o])
            o += c
        return res

    def compute_from_neighbors(
        self,
        elem_idxs: Array,  # (C, A)
        coords: tp.Optional[Array],
        neighbors: Neighbors,  # (C, A, K)
        charge: int = 0,
        atomic: bool = False,
        ensemble_values: bool = False,
        ghost_flags: tp.Optional[Array] = None,
    ) -> EnergiesScalars:
        c, a = elem_idxs.shape
        k = neighbors.capacity
        flat = lambda t: t.reshape((c * a,) + t.shape[3:])  # noqa: E731
        offsets = (jnp.arange(c, dtype=jnp.int32) * a)[:, None, None]
        nb = Neighbors(
            idx=(neighbors.idx + offsets).reshape(c * a, k),
            mask=neighbors.mask.reshape(c * a, k),
            diff=neighbors.diff.reshape(c * a, k, 3),
            dist=neighbors.dist.reshape(c * a, k),
            overflow=neighbors.overflow,
            # keep the packed neighbor species: dropping them here silently
            # re-enabled the per-lane elem_flat[idx] gather in elem_pairs
            elem=(
                None
                if neighbors.elem is None
                else neighbors.elem.reshape(c * a, k)
            ),
            # the lane-select service rows live in flat single-system atom
            # space; only valid when the batch axis is trivial
            select_tables=neighbors.select_tables if c == 1 else None,
            # frozen window channels ride in the same flat space
            pair_aux=getattr(neighbors, "pair_aux", None) if c == 1 else None,
        )
        elem_flat = elem_idxs.reshape(-1)
        e = self.pair_energies(elem_flat, nb)  # (N, K)
        if not isinstance(self.cutoff_fn, CutoffDummy) and not math.isinf(self.cutoff):
            e = e * self.cutoff_fn(nb.dist, self.cutoff)
        if ghost_flags is not None:
            gf = ghost_flags.reshape(-1)
            ghost_pair = gf[:, None] | jnp.where(nb.mask, jnp.take(gf, nb.idx, axis=0), False)
            e = jnp.where(ghost_pair, e * 0.5, e)
        e = jnp.where(nb.mask, e, 0.0)
        atomic_e = 0.5 * jnp.sum(e, axis=-1).reshape(c, a)  # full table: x2 lanes
        if atomic:
            return EnergiesScalars(atomic_e)
        return EnergiesScalars(jnp.sum(atomic_e, axis=-1))

    # ---- element-pair constant helpers ----
    @staticmethod
    def pack_pair_table(values: tp.Sequence[float], num_species: int) -> Array:
        """Pack triu-ordered pair values (HH, HC, HO, CC, ...) into (S, S)."""
        values = np.asarray(values, dtype=np.float32)
        iu = np.triu_indices(num_species)
        table = np.zeros((num_species, num_species), dtype=np.float32)
        table[iu] = values
        table = table + np.triu(table, 1).T
        return jnp.asarray(table)

    def to_pair_values(self, table: Array, elem_center: Array, elem_nbr: Array) -> Array:
        """Look up per-lane values from a symmetric (S, S) table."""
        return table[elem_center, elem_nbr]


class PairPotential(BasePairPotential):
    """User-friendly declarative pair potential (reference ``core.py:222-304``).

    Subclasses declare parameter names in three class attributes —
    ``tensors`` (scalars or same-length vectors), ``elem_tensors`` (shape
    ``(S,)``) and ``pair_elem_tensors`` (triu order ``HH, HC, HO, CC, ...``,
    length ``S(S+1)/2``, stored as a symmetric ``(S, S)`` table) — and
    implement `pair_energies`, reading each value as ``self.<name>``::

        class Square(PairPotential):
            tensors = ["bias"]
            pair_elem_tensors = ["k", "eq"]

            def pair_energies(self, elem_flat, neighbors):
                center, nbr = self.elem_pairs(elem_flat, neighbors)
                eq = self.to_pair_values(self.eq, center, nbr)
                k = self.to_pair_values(self.k, center, nbr)
                return self.bias + k / 2 * (neighbors.dist - eq) ** 2

        pot = Square.make(symbols=("H", "C", "O"), k=k, eq=eq, bias=0.1)

    ``trainable`` is accepted for signature parity; every stored array is a
    pytree leaf, so optax masking decides what actually trains.
    """

    tensors: tp.ClassVar[tp.List[str]] = []
    elem_tensors: tp.ClassVar[tp.List[str]] = []
    pair_elem_tensors: tp.ClassVar[tp.List[str]] = []
    params: tp.Dict[str, Array] = None

    def __getattr__(self, name: str):
        params = object.__getattribute__(self, "params") or {}
        if name in params:
            return params[name]
        raise AttributeError(name)

    @classmethod
    def make(
        cls,
        symbols: tp.Sequence[str],
        *,
        trainable: tp.Union[str, tp.Sequence[str]] = (),
        cutoff: float = math.inf,
        cutoff_fn: CutoffArg = "smooth",
        **kwargs,
    ) -> "PairPotential":
        from torchani_tpu.aev.terms import _validate_user_kwargs

        symbols = tuple(symbols)
        s = len(symbols)
        if isinstance(trainable, str):
            trainable = [trainable]
        _validate_user_kwargs(
            cls.__name__,
            {
                "tensors": cls.tensors,
                "elem_tensors": cls.elem_tensors,
                "pair_elem_tensors": cls.pair_elem_tensors,
            },
            kwargs,
            trainable,
        )
        params = {}
        for k, v in kwargs.items():
            arr = np.asarray(v, dtype=np.float32)
            if k in cls.elem_tensors and arr.shape != (s,):
                raise ValueError(f"{k} must have shape ({s},), got {arr.shape}")
            if k in cls.pair_elem_tensors:
                if arr.shape != (s * (s + 1) // 2,):
                    raise ValueError(
                        f"{k} must have {s * (s + 1) // 2} triu-ordered "
                        f"values, got shape {arr.shape}"
                    )
                params[k] = cls.pack_pair_table(arr, s)
            else:
                params[k] = jnp.asarray(arr)
        return cls(
            symbols=symbols,
            cutoff=cutoff,
            cutoff_fn=parse_cutoff_fn(cutoff_fn),
            params=params,
        )
