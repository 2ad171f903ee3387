"""Standalone network building blocks and legacy-API shims.

Counterparts of reference ``nn/_core.py`` (`AtomicNetwork`, `TightCELU`,
`AtomicOneHot`, `AtomicEmbedding`, `AtomicContainer`) and ``nn/_internal.py``
(`ANIModel`, `Sequential`), plus the inference-container names of
``nn/_infer.py`` (`BmmEnsemble`, `BmmAtomicNetwork`, `BmmLinear`,
`MNPNetworks`).

On TPU the default execution of `AtomicNetworks`/`Ensemble` already *is* the
fused batched-matmul form the reference reaches via BmmEnsemble/MNP (stacked
``(E, S, in, out)`` weights, one XLA program — the kernel-launch overhead
those runtimes eliminate does not exist under XLA), so the Bmm*/MNP names are
thin compatibility constructors over the standard containers.
"""

import typing as tp
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array, Symbols
from torchani_tpu.constants import ATOMIC_NUMBER
from torchani_tpu.nn.containers import AtomicNetworks, Ensemble, parse_activation

__all__ = [
    "TightCELU",
    "AtomicOneHot",
    "AtomicEmbedding",
    "AtomicContainer",
    "AtomicNetwork",
    "Sequential",
    "BmmLinear",
    "BmmAtomicNetwork",
    "BmmEnsemble",
    "MNPNetworks",
]


class TightCELU:
    """CELU activation with alpha=0.1 (reference ``nn/_core.py:163-167``)."""

    def __call__(self, x: Array) -> Array:
        return jax.nn.celu(x, alpha=0.1)


class AtomicOneHot(struct.PyTreeNode):
    """One-hot element embedding; padding atoms (-1) become all-zero rows
    (reference ``nn/_core.py:14-37``)."""

    symbols: Symbols = struct.field(pytree_node=False)

    @property
    def num_species(self) -> int:
        return len(self.symbols)

    @property
    def atomic_numbers(self) -> tp.Tuple[int, ...]:
        return tuple(ATOMIC_NUMBER[s] for s in self.symbols)

    def __call__(self, elem_idxs: Array) -> Array:
        # jax.nn.one_hot maps out-of-range (-1) to a zero row already
        return jax.nn.one_hot(elem_idxs, self.num_species, dtype=jnp.float32)


class AtomicEmbedding(struct.PyTreeNode):
    """Trainable continuous element embedding; padding atoms (-1) embed to
    zeros (reference ``nn/_core.py:40-66``)."""

    weight: Array  # (S, dim)
    symbols: Symbols = struct.field(pytree_node=False)

    @classmethod
    def make(
        cls,
        symbols: tp.Sequence[str],
        dim: int = 10,
        key: tp.Optional[Array] = None,
    ) -> "AtomicEmbedding":
        symbols = tuple(symbols)
        if key is None:
            key = jax.random.PRNGKey(0)
        weight = jax.random.normal(key, (len(symbols), dim), dtype=jnp.float32)
        return cls(weight=weight, symbols=symbols)

    @property
    def num_species(self) -> int:
        return len(self.symbols)

    def __call__(self, elem_idxs: Array) -> Array:
        safe = jnp.where(elem_idxs < 0, 0, elem_idxs)
        emb = jnp.take(self.weight, safe, axis=0)
        return jnp.where((elem_idxs < 0)[..., None], 0.0, emb)


class AtomicContainer:
    """Duck-type base for atomic-network containers (reference
    ``nn/_core.py:69-114``).

    The JAX containers (`AtomicNetworks`, `Ensemble`, `SingleNN`, ...) are
    immutable pytrees, not subclasses; this base documents the shared
    interface (``__call__(elem_idxs, aevs, atomic, ensemble_values)``,
    ``num_species``, ``total_members_num``, ``active_members_idxs``,
    ``set_active_members``, ``to_infer_model``) and doubles as the
    zero-energy fake the reference uses for testing.
    """

    num_species: int = 0
    total_members_num: int = 1
    active_members_idxs: tp.Tuple[int, ...] = (0,)

    def __call__(
        self,
        elem_idxs: Array,
        aevs: tp.Optional[Array] = None,
        atomic: bool = False,
        ensemble_values: bool = False,
    ) -> Array:
        if atomic:
            return jnp.zeros(jnp.shape(elem_idxs), jnp.float32)
        return jnp.zeros(jnp.shape(elem_idxs)[0], jnp.float32)

    def get_active_members_num(self) -> int:
        return len(self.active_members_idxs)

    def to_infer_model(self, use_mnp: bool = False) -> "AtomicContainer":
        return self


class AtomicNetwork(struct.PyTreeNode):
    """A single plain MLP: hidden Linear+activation layers, linear output
    (reference ``nn/_core.py:117-161``)."""

    weights: tp.Tuple[Array, ...]  # per layer (in, out)
    biases: tp.Optional[tp.Tuple[Array, ...]]
    activation: str = struct.field(pytree_node=False, default="gelu")

    @classmethod
    def make(
        cls,
        layer_dims: tp.Sequence[int],
        activation: str = "gelu",
        bias: bool = False,
        key: tp.Optional[Array] = None,
    ) -> "AtomicNetwork":
        dims = tuple(int(d) for d in layer_dims)
        if any(d <= 0 for d in dims):
            raise ValueError("Layer dims must be strict positive integers")
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, len(dims) - 1)
        # torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))
        weights = tuple(
            jax.random.uniform(
                k, (i, o), minval=-1.0, maxval=1.0, dtype=jnp.float32
            )
            / np.sqrt(i)
            for k, i, o in zip(keys, dims[:-1], dims[1:])
        )
        biases = (
            tuple(jnp.zeros((o,), jnp.float32) for o in dims[1:]) if bias else None
        )
        return cls(weights=weights, biases=biases, activation=activation)

    @property
    def layer_dims(self) -> tp.Tuple[int, ...]:
        return tuple(w.shape[0] for w in self.weights) + (
            self.weights[-1].shape[1],
        )

    def __call__(self, features: Array) -> Array:
        act = parse_activation(self.activation)
        for li, w in enumerate(self.weights):
            # strict-f32: TPU's default f32 matmul is a single bf16 pass
            features = jnp.dot(
                features, w, precision=jax.lax.Precision.HIGHEST
            )
            if self.biases is not None:
                features = features + self.biases[li]
            if li != len(self.weights) - 1:
                features = act(features)
        return features


class Sequential:
    """Legacy pipeline of (species, coords)-tuple modules (reference
    ``nn/_internal.py:24-51``).  Use `torchani_tpu.arch.Assembler` instead."""

    def __init__(self, *modules) -> None:
        warnings.warn(
            "Use of `torchani_tpu.nn.Sequential` is discouraged; please use "
            "`torchani_tpu.arch.Assembler` or compose functions directly."
        )
        self.modules = list(modules)

    def __call__(self, input_, cell=None, pbc=None):
        for m in self.modules:
            input_ = m(input_, cell, pbc)
        return input_


class BmmLinear(struct.PyTreeNode):
    """Batched linear layer over a leading ensemble axis: ``(E, N, in) @
    (E, in, out) + (E, 1, out)`` (reference ``nn/_infer.py:170-207``)."""

    weight: Array  # (E, in, out)
    bias: tp.Optional[Array] = None  # (E, 1, out)

    def __call__(self, x: Array) -> Array:
        out = jnp.einsum("eni,eio->eno", x, self.weight)
        if self.bias is not None:
            out = out + self.bias
        return out


class BmmAtomicNetwork(struct.PyTreeNode):
    """Stack of E same-architecture `AtomicNetwork`s evaluated as batched
    matmuls (reference ``nn/_infer.py:145-167``)."""

    layers: tp.Tuple[BmmLinear, ...]
    activation: str = struct.field(pytree_node=False, default="celu")

    @classmethod
    def from_networks(
        cls, networks: tp.Sequence[AtomicNetwork]
    ) -> "BmmAtomicNetwork":
        first = networks[0]
        layers = []
        for li in range(len(first.weights)):
            w = jnp.stack([n.weights[li] for n in networks])
            b = None
            if first.biases is not None:
                b = jnp.stack([n.biases[li][None, :] for n in networks])
            layers.append(BmmLinear(weight=w, bias=b))
        return cls(layers=tuple(layers), activation=first.activation)

    def __call__(self, features: Array) -> Array:
        act = parse_activation(self.activation)
        for li, layer in enumerate(self.layers):
            features = layer(features)
            if li != len(self.layers) - 1:
                features = act(features)
        return features


def BmmEnsemble(ensemble: Ensemble) -> Ensemble:
    """Fused-ensemble inference container (reference ``nn/_infer.py:61``).

    The JAX `Ensemble` already stores stacked ``(E, S, in, out)`` weights and
    evaluates all members in one batched matmul — the exact computation
    BmmEnsemble builds — so this returns the (already-fused) ensemble.
    """
    if not isinstance(ensemble, Ensemble):
        raise TypeError("BmmEnsemble expects an Ensemble")
    return ensemble


def MNPNetworks(container, use_mnp: bool = False):
    """Multi-net-parallel inference container (reference ``nn/_infer.py:219``).

    The MNP C++/OpenMP runtime exists to run per-species networks
    concurrently and avoid kernel-launch overhead; under XLA the
    species-stacked batched matmul of `AtomicNetworks`/`Ensemble` compiles
    into a single program, so the standard container is returned unchanged.
    """
    return container
