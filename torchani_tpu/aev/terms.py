"""Radial and angular AEV expansion terms.

Functional counterparts of the reference term modules
(``/root/reference/torchani/aev/_terms.py:27-489``), with identical math
constants (including the 0.25 NeuroChem factor, ``_terms.py:183-186``, and the
0.95 acos clamp, ``_terms.py:339-341``).  Terms are pure broadcastable
functions: they map masked padded distance/angle lanes to feature lanes; the
caller applies validity masks.
"""

import math
import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.annotations import Array
from torchani_tpu.cutoffs import Cutoff, CutoffArg, parse_cutoff_fn
from torchani_tpu.utils import linspace

__all__ = [
    "BaseRadial",
    "BaseAngular",
    "ANIRadial",
    "ANIAngular",
    "parse_radial_term",
    "parse_angular_term",
]


class BaseRadial(struct.PyTreeNode):
    """Base class for 2-body expansions.

    Subclasses implement `compute`; callers use `__call__` which wraps it
    with the cutoff envelope.  ``distances`` can have any (padded) shape; the
    output appends a feature axis of length `num_feats`.
    """

    cutoff: float = struct.field(pytree_node=False)
    cutoff_fn: Cutoff = struct.field(pytree_node=False)
    num_feats: int = struct.field(pytree_node=False)

    def compute(self, distances: Array) -> Array:
        raise NotImplementedError("Must be implemented by subclasses")

    def __call__(self, distances: Array) -> Array:
        factor = self.cutoff_fn(distances, self.cutoff)
        return self.compute(distances) * factor[..., None]


class BaseAngular(struct.PyTreeNode):
    """Base class for 3-body expansions.

    ``__call__`` takes per-triple side distances ``(.., 2)``-free broadcast
    form: ``dist_ji``/``dist_jk`` are the center-to-side distances and
    ``cos_angles`` the cosine at the center; all of identical padded shape.
    """

    cutoff: float = struct.field(pytree_node=False)
    cutoff_fn: Cutoff = struct.field(pytree_node=False)
    num_feats: int = struct.field(pytree_node=False)

    def compute_radial(self, dist_ji: Array, dist_jk: Array) -> Array:
        raise NotImplementedError("Must be implemented by subclasses")

    def compute_cos_angles(self, cos_angles: Array) -> Array:
        raise NotImplementedError("Must be implemented by subclasses")

    def __call__(
        self, dist_ji: Array, dist_jk: Array, cos_angles: Array
    ) -> Array:
        # fcj12[0] * fcj12[1] (not prod) to avoid inf/nan with smooth cutoffs,
        # mirroring reference _terms.py:51-55
        factor = self.cutoff_fn(dist_ji, self.cutoff) * self.cutoff_fn(
            dist_jk, self.cutoff
        )
        rad = self.compute_radial(dist_ji, dist_jk)  # (..., Sh)
        ang = self.compute_cos_angles(cos_angles)  # (..., Se)
        # feature layout: shift-major, section-minor (reference _terms.py:50)
        terms = rad[..., :, None] * ang[..., None, :]
        terms = terms.reshape(terms.shape[:-2] + (self.num_feats,))
        return terms * factor[..., None]


class ANIRadial(BaseRadial):
    r"""ANI radial terms: :math:`0.25 e^{-\eta (r - R_s)^2} f_c(r)`.

    Eq. (3) of the ANI paper, with the NeuroChem 0.25 coefficient.
    """

    eta: Array = None  # (1,)
    shifts: Array = None  # (R,)

    def compute(self, distances: Array) -> Array:
        d = distances[..., None]
        return 0.25 * jnp.exp(-self.eta * (d - self.shifts) ** 2)

    @classmethod
    def make(
        cls,
        eta: float,
        shifts: tp.Sequence[float],
        cutoff: float,
        cutoff_fn: CutoffArg = "cosine",
    ) -> "ANIRadial":
        return cls(
            cutoff=cutoff,
            cutoff_fn=parse_cutoff_fn(cutoff_fn),
            num_feats=len(shifts),
            eta=jnp.asarray([eta], dtype=jnp.float32),
            shifts=jnp.asarray(np.asarray(shifts, dtype=np.float32)),
        )

    @classmethod
    def cover_linearly(
        cls,
        start: float = 0.9,
        cutoff: float = 5.2,
        eta: float = 19.7,
        num_shifts: int = 16,
        cutoff_fn: CutoffArg = "cosine",
    ) -> "ANIRadial":
        """Linear division of [start, cutoff) into num_shifts radial shifts."""
        return cls.make(eta, linspace(start, cutoff, num_shifts), cutoff, cutoff_fn)

    @classmethod
    def like_1x(cls, cutoff_fn: CutoffArg = "cosine") -> "ANIRadial":
        return cls.cover_linearly(0.9, 5.2, 16.0, 16, cutoff_fn)

    @classmethod
    def like_2x(cls, cutoff_fn: CutoffArg = "cosine") -> "ANIRadial":
        return cls.cover_linearly(0.8, 5.1, 19.7, 16, cutoff_fn)


class ANIAngular(BaseAngular):
    r"""ANI angular terms (eq. (4) of the ANI paper).

    :math:`2((1+\cos(\theta - \theta_s))/2)^\zeta
    e^{-\eta(\bar r - R_s)^2} f_c(r_{ji}) f_c(r_{jk})`
    with :math:`\theta = \arccos(0.95 \cos\theta_{ijk})`.
    """

    eta: Array = None  # (1,)
    zeta: Array = None  # (1,)
    shifts: Array = None  # (Sh,)
    sections: Array = None  # (Se,)

    def compute_radial(self, dist_ji: Array, dist_jk: Array) -> Array:
        mean = (dist_ji + dist_jk) / 2
        return jnp.exp(-self.eta * (mean[..., None] - self.shifts) ** 2)

    def compute_cos_angles(self, cos_angles: Array) -> Array:
        # Mathematically identical to the reference's
        # ``2 * ((1 + cos(acos(0.95 c) - theta_s)) / 2) ** zeta``
        # via the angle-difference identity — replaces an acos plus one cos
        # per section with a single sqrt (transcendental-count win on the
        # VPU).  The 0.95 clamp factor is the reference's NaN guard
        # (_terms.py:339).
        c = 0.95 * cos_angles
        sin_theta = jnp.sqrt(1.0 - c * c)
        cos_dev = (
            c[..., None] * jnp.cos(self.sections)
            + sin_theta[..., None] * jnp.sin(self.sections)
        )
        return 2 * ((1 + cos_dev) / 2) ** self.zeta

    @classmethod
    def make(
        cls,
        eta: float,
        zeta: float,
        shifts: tp.Sequence[float],
        sections: tp.Sequence[float],
        cutoff: float,
        cutoff_fn: CutoffArg = "cosine",
    ) -> "ANIAngular":
        return cls(
            cutoff=cutoff,
            cutoff_fn=parse_cutoff_fn(cutoff_fn),
            num_feats=len(shifts) * len(sections),
            eta=jnp.asarray([eta], dtype=jnp.float32),
            zeta=jnp.asarray([zeta], dtype=jnp.float32),
            shifts=jnp.asarray(np.asarray(shifts, dtype=np.float32)),
            sections=jnp.asarray(np.asarray(sections, dtype=np.float32)),
        )

    @classmethod
    def cover_linearly(
        cls,
        start: float = 0.9,
        cutoff: float = 3.5,
        eta: float = 12.5,
        zeta: float = 14.1,
        num_shifts: int = 8,
        num_sections: int = 4,
        cutoff_fn: CutoffArg = "cosine",
    ) -> "ANIAngular":
        shifts = linspace(start, cutoff, num_shifts)
        angle_start = math.pi / num_sections / 2
        sections = linspace(angle_start, math.pi + angle_start, num_sections)
        return cls.make(eta, zeta, shifts, sections, cutoff, cutoff_fn)

    @classmethod
    def like_1x(cls, cutoff_fn: CutoffArg = "cosine") -> "ANIAngular":
        return cls.cover_linearly(0.9, 3.5, 8.0, 32.0, 4, 8, cutoff_fn)

    @classmethod
    def like_2x(cls, cutoff_fn: CutoffArg = "cosine") -> "ANIAngular":
        return cls.cover_linearly(0.8, 3.5, 12.5, 14.1, 8, 4, cutoff_fn)


RadialArg = tp.Union[str, BaseRadial]
AngularArg = tp.Union[str, BaseAngular]


def parse_radial_term(radial: RadialArg) -> BaseRadial:
    if radial in ("ani1x", "ani1ccx"):
        return ANIRadial.like_1x()
    if radial == "ani2x":
        return ANIRadial.like_2x()
    if not isinstance(radial, BaseRadial):
        raise ValueError(f"Unsupported radial term: {radial}")
    return radial


def parse_angular_term(angular: AngularArg) -> BaseAngular:
    if angular in ("ani1x", "ani1ccx"):
        return ANIAngular.like_1x()
    if angular == "ani2x":
        return ANIAngular.like_2x()
    if not isinstance(angular, BaseAngular):
        raise ValueError(f"Unsupported angular term: {angular}")
    return angular
