"""Cutoff (envelope) functions.

Functional counterparts of the reference cutoff hierarchy
(``/root/reference/torchani/cutoffs.py:17-143``).  Each cutoff is a frozen,
hashable dataclass so it can live in the *static* part of a jitted pytree
(the parameters — order, eps — select the compiled program; the math runs on
traced arrays).

All cutoffs assume their input distances are already within ``cutoff``; the
caller is responsible for masking values outside it (in the TPU design,
out-of-cutoff lanes are masked, not compacted away).
"""

import dataclasses
import math
import typing as tp

import jax.numpy as jnp

from torchani_tpu.annotations import Array

__all__ = [
    "Cutoff",
    "CutoffDummy",
    "CutoffCosine",
    "CutoffSmooth",
    "CutoffBiweight",
    "CutoffTriweight",
    "AltCutoffSmooth",
    "parse_cutoff_fn",
]


@dataclasses.dataclass(frozen=True)
class Cutoff:
    """Base class for cutoff functions."""

    def __call__(self, distances: Array, cutoff: float) -> Array:
        raise NotImplementedError

    def is_same(self, other: object) -> bool:
        return self == other


@dataclasses.dataclass(frozen=True)
class CutoffDummy(Cutoff):
    """No-op cutoff: returns ones."""

    def __call__(self, distances: Array, cutoff: float) -> Array:
        return jnp.ones_like(distances)


@dataclasses.dataclass(frozen=True)
class CutoffCosine(Cutoff):
    r"""Cosine cutoff: :math:`0.5\cos(\pi r / r_c) + 0.5`."""

    def __call__(self, distances: Array, cutoff: float) -> Array:
        return 0.5 * jnp.cos(distances * (math.pi / cutoff)) + 0.5


@dataclasses.dataclass(frozen=True)
class CutoffSmooth(Cutoff):
    r"""Infinitely differentiable cutoff.

    :math:`\exp(1 - 1/\max(\epsilon, 1 - (r/r_c)^n))` with order :math:`n`.
    """

    order: int = 2
    eps: float = 1.0e-10

    def __call__(self, distances: Array, cutoff: float) -> Array:
        e = 1 - 1 / jnp.clip((1 - (distances / cutoff) ** self.order), min=self.eps)
        return jnp.exp(e)


@dataclasses.dataclass(frozen=True)
class CutoffBiweight(Cutoff):
    r"""Bi-weight cutoff: :math:`(1 - (r/r_c)^2)^2`."""

    def __call__(self, distances: Array, cutoff: float) -> Array:
        return (1 - (distances / cutoff) ** 2) ** 2


@dataclasses.dataclass(frozen=True)
class CutoffTriweight(Cutoff):
    r"""Tri-weight cutoff: :math:`(1 - (r/r_c)^2)^3`."""

    def __call__(self, distances: Array, cutoff: float) -> Array:
        return (1 - (distances / cutoff) ** 2) ** 3


@dataclasses.dataclass(frozen=True)
class AltCutoffSmooth(Cutoff):
    r"""Variant smooth cutoff used by the r2scan (ANIr2s) models.

    :math:`\exp(-1/(1 - \mathrm{clamp}(r/r_c)^2)) / e^{-1}` (reference
    ``cutoffs.py:110-116``).
    """

    def __call__(self, distances: Array, cutoff: float) -> Array:
        x = jnp.clip(distances / cutoff, 0.0, 1.0 - 1e-4)
        e = -1.0 / (1.0 - x**2)
        return jnp.exp(e) / 0.3678794411714423


CutoffArg = tp.Union[str, Cutoff]


def parse_cutoff_fn(
    cutoff_fn: CutoffArg, global_cutoff: tp.Optional[Cutoff] = None
) -> Cutoff:
    """String-dispatch registry for cutoff functions.

    Mirrors the reference registry (``cutoffs.py:124-143``) including the
    ``"global"`` indirection used by the model assembler.
    """
    if cutoff_fn == "global":
        assert global_cutoff is not None
        return global_cutoff
    if cutoff_fn == "dummy":
        return CutoffDummy()
    if cutoff_fn == "cosine":
        return CutoffCosine()
    if cutoff_fn == "smooth":
        return CutoffSmooth()
    if cutoff_fn == "biweight":
        return CutoffBiweight()
    if cutoff_fn == "triweight":
        return CutoffTriweight()
    if not isinstance(cutoff_fn, Cutoff):
        raise ValueError(f"Unsupported cutoff fn: {cutoff_fn}")
    return cutoff_fn
