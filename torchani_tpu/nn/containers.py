"""Per-element atomic networks, ensembles, and the species converter.

TPU-native redesign of the reference NN containers
(``/root/reference/torchani/nn/_containers.py``, ``nn/_core.py``,
``nn/_infer.py``).  The reference's per-species ``nonzero``/``index_select``
loop (``_containers.py:412-416``) and its C++ MNP / BmmEnsemble inference
runtimes are all replaced by ONE formulation: element networks are stored as
**stacked, zero-padded weight tensors** ``(S, in, out)`` (ensembles add a
leading member axis ``(E, S, in, out)``) and evaluated as masked batched
matmuls.  Under XLA this compiles to a handful of large MXU matmuls — the
kernel-launch-overhead problem that MNP/Bmm solve on GPU does not exist here.

Zero-padding is exact: the activations used by ANI (CELU(a=0.1), GELU)
satisfy ``act(0) = 0``, so padded hidden units carry zeros forward and
receive zero gradients (their weights stay zero under any gradient-descent
update, keeping the padded model exactly equivalent to the ragged one).
"""

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array, Symbols
from torchani_tpu.constants import ATOMIC_NUMBER, PERIODIC_TABLE

__all__ = [
    "AtomicNetworks",
    "ANINetworks",
    "Ensemble",
    "SpeciesConverter",
    "parse_activation",
]

_HIGHEST = jax.lax.Precision.HIGHEST

#: per-symbol hidden dims of the pretrained model families
#: (reference ``nn/_containers.py:448-570``)
DIMS_1X: tp.Dict[str, tp.Tuple[int, ...]] = {
    "H": (160, 128, 96),
    "C": (144, 112, 96),
    "N": (128, 112, 96),
    "O": (128, 112, 96),
}
DIMS_2X: tp.Dict[str, tp.Tuple[int, ...]] = {
    "H": (256, 192, 160),
    "C": (224, 192, 160),
    "N": (192, 160, 128),
    "O": (192, 160, 128),
    "S": (160, 128, 96),
    "F": (160, 128, 96),
    "Cl": (160, 128, 96),
}
DIMS_DR: tp.Dict[str, tp.Tuple[int, ...]] = {
    "H": (256, 192, 160),
    "C": (256, 192, 160),
    "N": (192, 160, 128),
    "O": (192, 160, 128),
    "S": (160, 128, 96),
    "F": (160, 128, 96),
    "Cl": (160, 128, 96),
}
DIMS_ALA: tp.Dict[str, tp.Tuple[int, ...]] = {
    "H": (256, 192, 160),
    "C": (224, 196, 160),
    "N": (192, 160, 128),
    "O": (192, 160, 128),
    "S": (160, 128, 96),
    "F": (160, 128, 96),
    "Cl": (160, 128, 96),
}
_DEFAULT_DIMS = (160, 128, 96)
_DEFAULT_DIMS_1X = (128, 112, 96)


def parse_activation(name: str) -> tp.Callable[[Array], Array]:
    """Activation registry. ``celu`` is CELU(alpha=0.1) ("TightCELU")."""
    if name == "gelu":
        # torch.nn.GELU default is the exact (erf) form
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "celu":
        return lambda x: jax.nn.celu(x, alpha=0.1)
    raise ValueError(f"Unsupported activation: {name}")


def _stack_pad(
    arrays: tp.Sequence[np.ndarray], shape: tp.Tuple[int, ...]
) -> np.ndarray:
    out = np.zeros((len(arrays),) + shape, dtype=np.float32)
    for i, a in enumerate(arrays):
        sl = (i,) + tuple(slice(0, d) for d in a.shape)
        out[sl] = a
    return out


class AtomicNetworks(struct.PyTreeNode):
    """Stacked per-element MLPs predicting atomic scalars.

    The ``ANINetworks`` analog: for each atom, runs the MLP of the atom's
    element on its AEV and (by default) sums the atomic scalars per molecule.

    Attributes:
        weights: per layer, ``(S, in_max, out_max)`` zero-padded weight stacks
            (note the transpose relative to torch's ``(out, in)`` Linear).
        biases: per layer, ``(S, out_max)`` or None when bias=False.
        layer_dims: static per-species true layer dims, e.g.
            ``(((384, 160, 128, 96, 1), ...))`` — documents the ragged shapes
            inside the padding.
        symbols: chemical symbols in model order.
        activation: activation name ("celu" or "gelu").
    """

    weights: tp.Tuple[Array, ...]
    biases: tp.Optional[tp.Tuple[Array, ...]]
    layer_dims: tp.Tuple[tp.Tuple[int, ...], ...] = struct.field(pytree_node=False)
    symbols: Symbols = struct.field(pytree_node=False)
    activation: str = struct.field(pytree_node=False, default="celu")
    #: TPU matmul precision: "highest" (6 bf16 MXU passes, strict f32
    #: parity — the default, honoring the reference's TF32 ban at
    #: reference __init__.py:96-113), or "high" (3 passes, ~2x faster,
    #: max relative force error ~3e-5 on ANI-2x — far inside the
    #: reference's own 5e-4 infer-path tolerance).  Ignored on CPU.
    precision: str = struct.field(pytree_node=False, default="highest")
    #: Static per-species row budgets for TRACED element arrays (training
    #: batches): when set, atom rows are permuted into species-contiguous
    #: blocks and each species' exact-size MLP runs over its own block —
    #: instead of the padded path's every-network-over-every-row matmuls
    #: (S-fold redundant).  Set from data via
    #: `training.tune_species_partition`; overflow NaN-poisons.
    partition: tp.Optional[tp.Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None
    )

    @property
    def num_species(self) -> int:
        return len(self.symbols)

    @property
    def _matmul_precision(self) -> jax.lax.Precision:
        return getattr(jax.lax.Precision, self.precision.upper())

    @property
    def out_dim(self) -> int:
        return self.layer_dims[0][-1]

    @property
    def in_dim(self) -> int:
        return self.layer_dims[0][0]

    @property
    def atomic_numbers(self) -> tp.Tuple[int, ...]:
        return tuple(ATOMIC_NUMBER[s] for s in self.symbols)

    @property
    def total_members_num(self) -> int:
        return 1

    # ---- forward ----
    def atomic_scalars(self, elem_idxs: Array, aevs: Array) -> Array:
        """Per-atom scalars ``(..., C, A, out_dim)``; padding atoms get 0.

        ``aevs`` may carry extra leading (e.g. ensemble-member) axes on the
        weights via vmap — see `Ensemble`.
        """
        act = parse_activation(self.activation)
        c, a = elem_idxs.shape
        x0 = aevs.reshape(c * a, aevs.shape[-1])
        elem = elem_idxs.reshape(c * a)
        num_layers = len(self.weights)
        if self.partition is not None and isinstance(elem_idxs, jax.core.Tracer):
            from torchani_tpu.nn.partition import species_blocks

            caps = self.partition
            if len(caps) != self.num_species:
                raise ValueError(
                    f"partition has {len(caps)} entries for "
                    f"{self.num_species} species"
                )
            blocks = species_blocks(elem, caps)
            return self._atomic_scalars_blocked(act, x0, blocks).reshape(
                c, a, self.out_dim
            )
        # If the species array is a trace-time constant (e.g. MD closes over
        # a fixed system), skip element networks with no atoms — a pure-water
        # box then runs 2 of 7 networks.  Traced species fall back to all.
        species_list: tp.List[int] = list(range(self.num_species))
        if not isinstance(elem_idxs, jax.core.Tracer):
            host_elem = np.asarray(elem_idxs).reshape(-1)
            present = set(np.unique(host_elem).tolist())
            species_list = [s for s in species_list if s in present]
            # Static partition: each species' atom rows are known at trace
            # time, so slice exactly those rows and run that species' MLP at
            # its true (unpadded) layer dims — no all-atoms x all-species or
            # zero-padded-width waste.  This is the trace-time
            # specialization of the reference's nonzero/index_select
            # per-species loop (nn/_containers.py:412).
            #
            # Contiguous blocks (the MD driver species-sorts its internal
            # atom order): true slices.  Scattered rows (e.g. a molecule
            # batch closed over as a constant — on some platforms ops on a
            # closed-over constant stay concrete all the way here): the
            # blocked path with a HOST-precomputed permutation — the
            # per-species row movement is two wide-row constant-index
            # gathers, not the static gathers + at[].set scatters that were
            # profiled at ~22 ms/step, and not the padded path's S-fold
            # redundant matmuls.
            contiguous = all(
                (lambda r: r.size == 0 or int(r[-1]) - int(r[0]) + 1 == r.size)(
                    np.flatnonzero(host_elem == s)
                )
                for s in species_list
            )
            if contiguous:
                return self._atomic_scalars_static(
                    act, host_elem, x0, species_list
                ).reshape(c, a, self.out_dim)
            if host_elem.size >= 512:
                from torchani_tpu.nn.partition import species_blocks_static

                blocks = species_blocks_static(host_elem)
                return self._atomic_scalars_blocked(act, x0, blocks).reshape(
                    c, a, self.out_dim
                )
        sel = np.asarray(species_list)
        # With every species present the [sel] gather is an identity — emit
        # the array itself (a real gather of closed-over constant weights
        # makes XLA constant-fold a full (S, E, in, out) copy: >2s compile
        # per train-step, seen in the sharded-training dryrun HLO).
        if len(species_list) == self.num_species:
            pick = lambda arr: arr  # noqa: E731
        else:
            pick = lambda arr: arr[sel]  # noqa: E731
        # One species-batched matmul chain per layer (batch dim = species)
        # instead of a sequential per-species loop — better MXU scheduling.
        x = jnp.einsum(
            "nf,sfo->sno", x0, pick(self.weights[0]), precision=self._matmul_precision
        )
        if self.biases is not None:
            x = x + pick(self.biases[0])[:, None, :]
        for li in range(1, num_layers):
            x = act(x)
            x = jnp.einsum(
                "snf,sfo->sno", x, pick(self.weights[li]), precision=self._matmul_precision
            )
            if self.biases is not None:
                x = x + pick(self.biases[li])[:, None, :]
        # select each atom's own-species column
        out = jnp.zeros((c * a, self.out_dim), dtype=aevs.dtype)
        for i, s in enumerate(species_list):
            out = jnp.where((elem == s)[:, None], x[i, :, : self.out_dim], out)
        out = jnp.where((elem >= 0)[:, None], out, 0.0)
        return out.reshape(c, a, self.out_dim)

    def _atomic_scalars_static(
        self,
        act: tp.Callable[[Array], Array],
        host_elem: np.ndarray,  # (N,) concrete
        x0: Array,  # (N, feat)
        species_list: tp.List[int],
    ) -> Array:
        n = host_elem.shape[0]
        out = jnp.zeros((n, self.out_dim), dtype=x0.dtype)
        for s in species_list:
            rows = np.flatnonzero(host_elem == s).astype(np.int32)
            dims = self.layer_dims[s]
            # species-sorted atoms (the MD driver's internal order) make
            # each species' rows a contiguous block: use true slices, not
            # static gathers/scatters
            contiguous = rows.size > 0 and (
                int(rows[-1]) - int(rows[0]) + 1 == rows.size
            )
            if contiguous:
                x = jax.lax.slice_in_dim(x0, int(rows[0]), int(rows[-1]) + 1)
            else:
                x = jnp.take(x0, rows, axis=0)  # static gather (n_s, feat)
            for li in range(len(self.weights)):
                w = self.weights[li][s, : dims[li], : dims[li + 1]]
                x = jnp.dot(x, w, precision=self._matmul_precision)
                if self.biases is not None:
                    x = x + self.biases[li][s, : dims[li + 1]]
                if li + 1 < len(self.weights):
                    x = act(x)
            if contiguous:
                out = jax.lax.dynamic_update_slice_in_dim(
                    out, x, int(rows[0]), axis=0
                )
            else:
                out = out.at[rows].set(x)
        return out

    def _atomic_scalars_blocked(
        self,
        act: tp.Callable[[Array], Array],
        x0: Array,  # (N, feat)
        blocks,  # nn.partition.SpeciesBlocks
    ) -> Array:
        """Species-blocked evaluation (see `partition` / `nn.partition`).

        Two permutation gathers move rows into species-contiguous blocks
        (plus, for traced species, one f32-key sort to derive them); each
        species' MLP runs at its exact (unpadded) layer dims over a static
        `caps[s]`-row block — instead of the padded path's S-fold redundant
        matmuls.  Dummy rows never enter a block.  Species-count overflow
        NaN-poisons the output (capacity convention).
        """
        from torchani_tpu.nn.partition import block_rows, unblock_rows

        caps = blocks.caps
        xb = block_rows(x0, blocks)  # (P, feat)
        outs: tp.List[Array] = []
        off = 0
        for s, cap in enumerate(caps):
            dims = self.layer_dims[s]
            x = jax.lax.slice_in_dim(xb, off, off + cap)
            for li in range(len(self.weights)):
                w = self.weights[li][s, : dims[li], : dims[li + 1]]
                x = jnp.dot(x, w, precision=self._matmul_precision)
                if self.biases is not None:
                    x = x + self.biases[li][s, : dims[li + 1]]
                if li + 1 < len(self.weights):
                    x = act(x)
            outs.append(x)
            off += cap
        yb = jnp.concatenate(outs, axis=0)  # (P, out_dim)
        y = unblock_rows(yb, blocks)  # (N, out_dim); dummies/overflow 0
        return y * jnp.where(blocks.ok, 1.0, jnp.float32(jnp.nan))

    def __call__(
        self,
        elem_idxs: Array,
        aevs: Array,
        atomic: bool = False,
        ensemble_values: bool = False,
    ) -> Array:
        scalars = self.atomic_scalars(elem_idxs, aevs)
        if self.out_dim == 1:
            scalars = scalars[..., 0]
        if atomic:
            return scalars
        return jnp.sum(scalars, axis=-1)

    def member(self, idx: int) -> "AtomicNetworks":
        if idx != 0:
            raise IndexError("Single container has one member")
        return self

    # ---- construction ----
    @classmethod
    def build(
        cls,
        symbols: tp.Sequence[str],
        in_dim: int,
        dims: tp.Dict[str, tp.Tuple[int, ...]],
        out_dim: int = 1,
        activation: str = "gelu",
        bias: bool = False,
        default_dims: tp.Tuple[int, ...] = (),
        key: tp.Optional[jax.Array] = None,
    ) -> "AtomicNetworks":
        if any(s not in PERIODIC_TABLE for s in symbols):
            raise ValueError("All modules should be mapped to valid chemical symbols")
        layer_dims = tuple(
            (in_dim,) + tuple(dims.get(s, default_dims)) + (out_dim,)
            for s in symbols
        )
        return cls.from_layer_dims(
            tuple(symbols), layer_dims, activation=activation, bias=bias, key=key
        )

    @classmethod
    def from_layer_dims(
        cls,
        symbols: Symbols,
        layer_dims: tp.Tuple[tp.Tuple[int, ...], ...],
        activation: str = "celu",
        bias: bool = True,
        key: tp.Optional[jax.Array] = None,
    ) -> "AtomicNetworks":
        """Random init matching torch.nn.Linear defaults (U(-1/sqrt(in), ..))."""
        if key is None:
            key = jax.random.PRNGKey(0)
        num_layers = max(len(d) for d in layer_dims) - 1
        if any(len(d) - 1 != num_layers for d in layer_dims):
            raise ValueError("All species must have the same number of layers")
        weights: tp.List[Array] = []
        biases: tp.List[Array] = []
        for li in range(num_layers):
            in_max = max(d[li] for d in layer_dims)
            out_max = max(d[li + 1] for d in layer_dims)
            ws, bs = [], []
            for d in layer_dims:
                key, k1, k2 = jax.random.split(key, 3)
                bound = 1.0 / np.sqrt(d[li])
                ws.append(
                    np.asarray(
                        jax.random.uniform(
                            k1, (d[li], d[li + 1]), minval=-bound, maxval=bound
                        )
                    )
                )
                bs.append(
                    np.asarray(
                        jax.random.uniform(
                            k2, (d[li + 1],), minval=-bound, maxval=bound
                        )
                    )
                )
            weights.append(jnp.asarray(_stack_pad(ws, (in_max, out_max))))
            biases.append(jnp.asarray(_stack_pad(bs, (out_max,))))
        return cls(
            weights=tuple(weights),
            biases=tuple(biases) if bias else None,
            layer_dims=layer_dims,
            symbols=symbols,
            activation=activation,
        )

    @classmethod
    def like_1x(
        cls,
        symbols: tp.Sequence[str] = ("H", "C", "N", "O"),
        in_dim: int = 384,
        out_dim: int = 1,
        activation: str = "celu",
        bias: bool = True,
        key: tp.Optional[jax.Array] = None,
    ) -> "AtomicNetworks":
        return cls.build(
            symbols, in_dim, DIMS_1X, out_dim, activation, bias,
            default_dims=_DEFAULT_DIMS_1X, key=key,
        )

    @classmethod
    def like_2x(
        cls,
        symbols: tp.Sequence[str] = ("H", "C", "N", "O", "S", "F", "Cl"),
        in_dim: int = 1008,
        out_dim: int = 1,
        activation: str = "celu",
        bias: bool = True,
        key: tp.Optional[jax.Array] = None,
    ) -> "AtomicNetworks":
        return cls.build(
            symbols, in_dim, DIMS_2X, out_dim, activation, bias,
            default_dims=_DEFAULT_DIMS, key=key,
        )

    @classmethod
    def like_dr(
        cls,
        symbols: tp.Sequence[str] = ("H", "C", "N", "O", "S", "F", "Cl"),
        in_dim: int = 1008,
        out_dim: int = 1,
        activation: str = "gelu",
        bias: bool = False,
        key: tp.Optional[jax.Array] = None,
    ) -> "AtomicNetworks":
        return cls.build(
            symbols, in_dim, DIMS_DR, out_dim, activation, bias,
            default_dims=_DEFAULT_DIMS, key=key,
        )

    @classmethod
    def like_ala(
        cls,
        symbols: tp.Sequence[str] = ("H", "C", "N", "O", "S", "F", "Cl"),
        in_dim: int = 1008,
        out_dim: int = 1,
        activation: str = "celu",
        bias: bool = True,
        key: tp.Optional[jax.Array] = None,
    ) -> "AtomicNetworks":
        return cls.build(
            symbols, in_dim, DIMS_ALA, out_dim, activation, bias,
            default_dims=_DEFAULT_DIMS, key=key,
        )

    default = like_2x


#: Alias kept for naming parity with the reference
ANINetworks = AtomicNetworks


class AtomicNetworksDiscardFirstScalar(AtomicNetworks):
    """Networks with ``out_dim >= 2`` whose FIRST output scalar is discarded;
    each atom's value is output column 1.

    Parity with the reference's ``_ANINetworksDiscardFirstScalar``
    (``nn/_internal.py:69-94``), used by the ANI-mbis charge networks (the
    published weights have a "bad first scalar" head).
    """

    def __call__(
        self,
        elem_idxs: Array,
        aevs: Array,
        atomic: bool = False,
        ensemble_values: bool = False,
    ) -> Array:
        scalars = self.atomic_scalars(elem_idxs, aevs)[..., 1]
        if atomic:
            return scalars
        return jnp.sum(scalars, axis=-1)


class GenericEnsemble(struct.PyTreeNode):
    """Ensemble of arbitrary same-architecture containers (e.g. `SingleNN`).

    Member arrays are stacked on a leading axis and evaluated under
    ``jax.vmap`` (the member axis rides the MXU batch dimension) — the same
    execution shape as `Ensemble`, for containers whose parameters aren't
    the per-element stacked layout.  Reference analog: the generic
    ``Ensemble`` module list (``nn/_containers.py:573+``).
    """

    stacked: tp.Any  # one member pytree with a leading (E, ...) axis on leaves
    active_members: tp.Optional[tp.Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None
    )

    @classmethod
    def from_members(cls, members: tp.Sequence[tp.Any]) -> "GenericEnsemble":
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *members)
        return cls(stacked=stacked)

    @property
    def symbols(self) -> Symbols:
        return self.stacked.symbols

    @property
    def num_species(self) -> int:
        return len(self.stacked.symbols)

    @property
    def atomic_numbers(self) -> tp.Tuple[int, ...]:
        return tuple(ATOMIC_NUMBER[s] for s in self.stacked.symbols)

    @property
    def total_members_num(self) -> int:
        return jax.tree.leaves(self.stacked)[0].shape[0]

    @property
    def active_members_idxs(self) -> tp.Tuple[int, ...]:
        if self.active_members is None:
            return tuple(range(self.total_members_num))
        return self.active_members

    def get_active_members_num(self) -> int:
        return len(self.active_members_idxs)

    def set_active_members(self, idxs: tp.Sequence[int]) -> "GenericEnsemble":
        for i in idxs:
            if not 0 <= i < self.total_members_num:
                raise IndexError(
                    f"Idx {i} should be 0 <= idx < {self.total_members_num}"
                )
        return self.replace(active_members=tuple(idxs))

    def member(self, idx: int) -> tp.Any:
        return jax.tree.map(lambda x: x[idx], self.stacked)

    def __call__(
        self,
        elem_idxs: Array,
        aevs: Array,
        atomic: bool = False,
        ensemble_values: bool = False,
    ) -> Array:
        stacked = self.stacked
        idxs = self.active_members_idxs
        if len(idxs) != self.total_members_num:
            sel = np.asarray(idxs)
            stacked = jax.tree.map(lambda x: x[sel], stacked)
        vals = jax.vmap(lambda m: m(elem_idxs, aevs, atomic=atomic))(stacked)
        if ensemble_values:
            return vals
        return jnp.mean(vals, axis=0)


class Ensemble(struct.PyTreeNode):
    """Average of E member networks, evaluated as one batched matmul.

    Weight stacks carry a leading member axis ``(E, S, in, out)`` — exactly
    the BmmEnsemble layout of the reference (``nn/_infer.py:61-216``) — and
    the member axis rides the MXU batch dimension via ``vmap``.
    """

    weights: tp.Tuple[Array, ...]  # per layer (E, S, in, out)
    biases: tp.Optional[tp.Tuple[Array, ...]]  # per layer (E, S, out)
    layer_dims: tp.Tuple[tp.Tuple[int, ...], ...] = struct.field(pytree_node=False)
    symbols: Symbols = struct.field(pytree_node=False)
    activation: str = struct.field(pytree_node=False, default="celu")
    active_members: tp.Optional[tp.Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None
    )
    #: see `AtomicNetworks.precision`
    precision: str = struct.field(pytree_node=False, default="highest")
    #: see `AtomicNetworks.partition`; the block permutation is derived from
    #: the (member-independent) element array, so under the member vmap it
    #: is computed once, not per member
    partition: tp.Optional[tp.Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None
    )

    @property
    def num_species(self) -> int:
        return len(self.symbols)

    @property
    def total_members_num(self) -> int:
        return self.weights[0].shape[0]

    @property
    def active_members_idxs(self) -> tp.Tuple[int, ...]:
        if self.active_members is None:
            return tuple(range(self.total_members_num))
        return self.active_members

    @property
    def out_dim(self) -> int:
        return self.layer_dims[0][-1]

    @property
    def atomic_numbers(self) -> tp.Tuple[int, ...]:
        return tuple(ATOMIC_NUMBER[s] for s in self.symbols)

    def get_active_members_num(self) -> int:
        return len(self.active_members_idxs)

    def set_active_members(self, idxs: tp.Sequence[int]) -> "Ensemble":
        for i in idxs:
            if not 0 <= i < self.total_members_num:
                raise IndexError(
                    f"Idx {i} should be 0 <= idx < {self.total_members_num}"
                )
        return self.replace(active_members=tuple(idxs))

    def member(self, idx: int) -> AtomicNetworks:
        """Extract one member as a plain `AtomicNetworks`."""
        return AtomicNetworks(
            weights=tuple(w[idx] for w in self.weights),
            biases=None if self.biases is None else tuple(b[idx] for b in self.biases),
            layer_dims=self.layer_dims,
            symbols=self.symbols,
            activation=self.activation,
            precision=self.precision,
            partition=self.partition,
        )

    def _active(self) -> tp.Tuple[tp.Tuple[Array, ...], tp.Optional[tp.Tuple[Array, ...]]]:
        idxs = np.asarray(self.active_members_idxs)
        if len(idxs) == self.total_members_num:
            return self.weights, self.biases
        w = tuple(x[idxs] for x in self.weights)
        b = None if self.biases is None else tuple(x[idxs] for x in self.biases)
        return w, b

    def member_values(self, elem_idxs: Array, aevs: Array) -> Array:
        """Per-member atomic scalars, shape ``(E_active, C, A, out_dim)``."""
        weights, biases = self._active()

        def one(w, b):
            net = AtomicNetworks(
                weights=w,
                biases=b,
                layer_dims=self.layer_dims,
                symbols=self.symbols,
                activation=self.activation,
                precision=self.precision,
                partition=self.partition,
            )
            return net.atomic_scalars(elem_idxs, aevs)

        if biases is None:
            return jax.vmap(lambda w: one(w, None))(weights)
        return jax.vmap(one)(weights, biases)

    def __call__(
        self,
        elem_idxs: Array,
        aevs: Array,
        atomic: bool = False,
        ensemble_values: bool = False,
    ) -> Array:
        scalars = self.member_values(elem_idxs, aevs)  # (E, C, A, out)
        if self.out_dim == 1:
            scalars = scalars[..., 0]
        if not ensemble_values:
            scalars = jnp.mean(scalars, axis=0)
        if atomic:
            return scalars
        return jnp.sum(scalars, axis=-1)

    @classmethod
    def from_members(cls, members: tp.Sequence[AtomicNetworks]) -> "Ensemble":
        first = members[0]
        for m in members[1:]:
            if m.layer_dims != first.layer_dims or m.symbols != first.symbols:
                raise ValueError("All ensemble members must share an architecture")
        weights = tuple(
            jnp.stack([m.weights[li] for m in members])
            for li in range(len(first.weights))
        )
        biases = None
        if first.biases is not None:
            biases = tuple(
                jnp.stack([m.biases[li] for m in members])
                for li in range(len(first.biases))
            )
        return cls(
            weights=weights,
            biases=biases,
            layer_dims=first.layer_dims,
            symbols=first.symbols,
            activation=first.activation,
            precision=first.precision,
        )


class SpeciesConverter(struct.PyTreeNode):
    """Convert atomic numbers to 0-based model element indices.

    Padding (-1) passes through.  Lookup-table analog of reference
    ``SpeciesConverter`` (``nn/_containers.py:663-734``).
    """

    symbols: Symbols = struct.field(pytree_node=False)

    @property
    def atomic_numbers(self) -> tp.Tuple[int, ...]:
        return tuple(ATOMIC_NUMBER[s] for s in self.symbols)

    def _table(self) -> Array:
        table = np.full((120,), -1, dtype=np.int32)
        for i, z in enumerate(self.atomic_numbers):
            table[z] = i
        return jnp.asarray(table)

    def __call__(self, species: Array, validate: bool = False) -> Array:
        znums = jnp.where(species < 0, 119, species)
        out = jnp.take(self._table(), znums, axis=0)
        out = jnp.where(species < 0, -1, out)
        if validate and not isinstance(species, jax.core.Tracer):
            bad = np.asarray((out == -1) & (species >= 0))
            if bad.any():
                znums = sorted(set(np.asarray(species)[bad].tolist()))
                raise ValueError(
                    f"Unsupported atomic numbers {znums}; model supports "
                    f"{self.symbols}"
                )
        return out
