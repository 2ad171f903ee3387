"""Shared-weight network containers: SingleNN and ANISharedNetworks.

Counterparts of reference ``nn/_containers.py:20-317`` and the embeddings of
``nn/_core.py:14-64``.  `SingleNN` runs ONE network for all atoms with a
per-element output head (selected by species) and an optional species
embedding appended to the input features — on TPU this is a single dense
batched matmul stack, no species loop at all.  `ANISharedNetworks` prepends
a shared trunk to per-element heads.
"""

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array, Symbols
from torchani_tpu.constants import ATOMIC_NUMBER
from torchani_tpu.nn.containers import AtomicNetworks, parse_activation

__all__ = ["SingleNN", "ANISharedNetworks"]

_HIGHEST = jax.lax.Precision.HIGHEST


class SingleNN(struct.PyTreeNode):
    """One fully-shared network with a per-element output column.

    The final layer has ``num_species`` outputs; each atom's scalar is the
    column of its element.  ``embed_kind``:

    - ``"continuous"``: a trainable ``(S, embed_dims)`` embedding appended to
      the AEV.
    - ``"one-hot"``: one-hot species appended.
    - ``"none"``: AEV only.
    """

    weights: tp.Tuple[Array, ...]  # per layer (in, out)
    biases: tp.Optional[tp.Tuple[Array, ...]]
    embedding: tp.Optional[Array]  # (S, E) or None
    symbols: Symbols = struct.field(pytree_node=False)
    embed_kind: str = struct.field(pytree_node=False, default="continuous")
    activation: str = struct.field(pytree_node=False, default="gelu")

    @property
    def num_species(self) -> int:
        return len(self.symbols)

    @property
    def atomic_numbers(self) -> tp.Tuple[int, ...]:
        return tuple(ATOMIC_NUMBER[s] for s in self.symbols)

    @property
    def total_members_num(self) -> int:
        return 1

    def __call__(
        self,
        elem_idxs: Array,
        aevs: Array,
        atomic: bool = False,
        ensemble_values: bool = False,
    ) -> Array:
        act = parse_activation(self.activation)
        c, a = elem_idxs.shape
        x = aevs.reshape(c * a, aevs.shape[-1])
        elem = elem_idxs.reshape(c * a)
        safe_elem = jnp.where(elem < 0, 0, elem)
        if self.embed_kind == "one-hot":
            emb = jax.nn.one_hot(
                jnp.where(elem < 0, -1, elem), self.num_species, dtype=x.dtype
            )
            x = jnp.concatenate([x, emb], axis=-1)
        elif self.embed_kind == "continuous":
            emb = jnp.take(self.embedding, safe_elem, axis=0)
            emb = jnp.where((elem >= 0)[:, None], emb, 0.0)
            x = jnp.concatenate([x, emb], axis=-1)
        num_layers = len(self.weights)
        for li in range(num_layers):
            x = jnp.dot(x, self.weights[li], precision=_HIGHEST)
            if self.biases is not None:
                x = x + self.biases[li]
            if li < num_layers - 1:
                x = act(x)
        # per-atom scalar = output column of the atom's element
        scalars = jnp.take_along_axis(x, safe_elem[:, None], axis=1)[:, 0]
        scalars = jnp.where(elem >= 0, scalars, 0.0)
        scalars = scalars.reshape(c, a)
        if atomic:
            return scalars
        return jnp.sum(scalars, axis=-1)

    def member(self, idx: int) -> "SingleNN":
        if idx != 0:
            raise IndexError("SingleNN has one member")
        return self

    # ---- construction ----
    @classmethod
    def build(
        cls,
        symbols: tp.Sequence[str],
        in_dim: int,
        dims: tp.Tuple[int, ...] = (256, 160, 128, 512),
        out_dim: int = 1,
        activation: str = "gelu",
        bias: bool = False,
        embed_kind: str = "continuous",
        embed_dims: tp.Optional[int] = None,
        key: tp.Optional[jax.Array] = None,
    ) -> "SingleNN":
        if out_dim != 1:
            raise ValueError("out_dim != 1 is not implemented for SingleNN")
        symbols = tuple(symbols)
        if key is None:
            key = jax.random.PRNGKey(0)
        if embed_kind == "continuous":
            embed_dims = 10 if embed_dims is None else embed_dims
            extra = embed_dims
        elif embed_kind == "one-hot":
            if embed_dims is not None:
                raise ValueError("embed_dims is incompatible with 'one-hot'")
            extra = len(symbols)
        elif embed_kind == "none":
            if embed_dims is not None:
                raise ValueError("embed_dims is incompatible with embed_kind='none'")
            extra = 0
        else:
            raise ValueError(f"Unsupported embedding kind {embed_kind}")
        layer_dims = (in_dim + extra,) + tuple(dims) + (len(symbols),)
        weights, biases_ = [], []
        for din, dout in zip(layer_dims[:-1], layer_dims[1:]):
            key, k1, k2 = jax.random.split(key, 3)
            bound = 1.0 / np.sqrt(din)
            weights.append(
                jax.random.uniform(k1, (din, dout), minval=-bound, maxval=bound)
            )
            biases_.append(
                jax.random.uniform(k2, (dout,), minval=-bound, maxval=bound)
            )
        embedding = None
        if embed_kind == "continuous":
            key, ke = jax.random.split(key)
            embedding = jax.random.normal(ke, (len(symbols), extra))
        return cls(
            weights=tuple(weights),
            biases=tuple(biases_) if bias else None,
            embedding=embedding,
            symbols=symbols,
            embed_kind=embed_kind,
            activation=activation,
        )

    @classmethod
    def default(cls, symbols, in_dim, **kwargs) -> "SingleNN":
        return cls.build(symbols, in_dim, (256, 160, 128, 512), **kwargs)

    @classmethod
    def no_embed(cls, symbols, in_dim, **kwargs) -> "SingleNN":
        return cls.build(
            symbols, in_dim, (256, 160, 128, 512), embed_kind="none", **kwargs
        )

    @classmethod
    def one_hot(cls, symbols, in_dim, **kwargs) -> "SingleNN":
        return cls.build(
            symbols, in_dim, (256, 160, 128, 512), embed_kind="one-hot", **kwargs
        )

    @classmethod
    def large(cls, symbols, in_dim, **kwargs) -> "SingleNN":
        return cls.build(symbols, in_dim, (320, 256, 256, 512), **kwargs)


class ANISharedNetworks(struct.PyTreeNode):
    """Shared trunk feeding per-element heads.

    The trunk is a plain MLP applied to every atom (with a trailing
    activation); the heads are an `AtomicNetworks`-style stacked container
    over the trunk output.
    """

    trunk_weights: tp.Tuple[Array, ...]
    trunk_biases: tp.Optional[tp.Tuple[Array, ...]]
    heads: AtomicNetworks
    symbols: Symbols = struct.field(pytree_node=False)
    activation: str = struct.field(pytree_node=False, default="gelu")

    @property
    def num_species(self) -> int:
        return len(self.symbols)

    @property
    def atomic_numbers(self) -> tp.Tuple[int, ...]:
        return tuple(ATOMIC_NUMBER[s] for s in self.symbols)

    @property
    def total_members_num(self) -> int:
        return 1

    def __call__(
        self,
        elem_idxs: Array,
        aevs: Array,
        atomic: bool = False,
        ensemble_values: bool = False,
    ) -> Array:
        act = parse_activation(self.activation)
        x = aevs
        for li in range(len(self.trunk_weights)):
            x = jnp.dot(x, self.trunk_weights[li], precision=_HIGHEST)
            if self.trunk_biases is not None:
                x = x + self.trunk_biases[li]
            x = act(x)  # trunk output is activated (reference :254)
        return self.heads(elem_idxs, x, atomic=atomic, ensemble_values=ensemble_values)

    def member(self, idx: int) -> "ANISharedNetworks":
        if idx != 0:
            raise IndexError("Single container has one member")
        return self

    @classmethod
    def build(
        cls,
        symbols: tp.Sequence[str],
        in_dim: int,
        shared_dims: tp.Tuple[int, ...] = (256,),
        dims: tp.Optional[tp.Dict[str, tp.Tuple[int, ...]]] = None,
        out_dim: int = 1,
        activation: str = "gelu",
        bias: bool = False,
        default_dims: tp.Tuple[int, ...] = (128, 96),
        key: tp.Optional[jax.Array] = None,
    ) -> "ANISharedNetworks":
        symbols = tuple(symbols)
        if key is None:
            key = jax.random.PRNGKey(0)
        if dims is None:
            dims = {
                "H": (192, 160), "C": (192, 160), "N": (160, 128),
                "O": (160, 128), "S": (128, 96), "F": (128, 96),
                "Cl": (128, 96),
            }
        layer_dims = (in_dim,) + tuple(shared_dims)
        tw, tb = [], []
        for din, dout in zip(layer_dims[:-1], layer_dims[1:]):
            key, k1, k2 = jax.random.split(key, 3)
            bound = 1.0 / np.sqrt(din)
            tw.append(jax.random.uniform(k1, (din, dout), minval=-bound, maxval=bound))
            tb.append(jax.random.uniform(k2, (dout,), minval=-bound, maxval=bound))
        key, kh = jax.random.split(key)
        heads = AtomicNetworks.build(
            symbols,
            shared_dims[-1],
            dims,
            out_dim=out_dim,
            activation=activation,
            bias=bias,
            default_dims=default_dims,
            key=kh,
        )
        return cls(
            trunk_weights=tuple(tw),
            trunk_biases=tuple(tb) if bias else None,
            heads=heads,
            symbols=symbols,
            activation=activation,
        )

    default = build
