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
    "Radial",
    "Angular",
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


def _validate_user_kwargs(
    clsname: str,
    names_dict: tp.Dict[str, tp.Sequence[str]],
    kwargs: tp.Dict[str, tp.Any],
    trainable: tp.Sequence[str],
) -> None:
    """Validate declarative tensor kwargs (reference ``utils.py:574-609``)."""
    declared: tp.Set[str] = set()
    total = 0
    for seq in names_dict.values():
        declared |= set(seq)
        total += len(seq)
    if len(declared) != total:
        raise ValueError("tensor names must be unique")
    if set(kwargs) != declared:
        raise ValueError(
            f"Expected arguments '{', '.join(sorted(declared))}' but got "
            f"'{', '.join(kwargs)}'. Maybe you forgot \"*tensors = [..., "
            f"'argname']\" when defining {clsname}?"
        )
    for names in names_dict.values():
        seqs = [
            v for k, v in kwargs.items()
            if k in names and isinstance(v, (tuple, list))
        ]
        if seqs and not all(len(s) == len(seqs[0]) for s in seqs):
            raise ValueError(
                f"Tuples or lists passed to {clsname} for {names} must have "
                "the same len"
            )
    if not set(trainable).issubset(declared):
        raise ValueError(f"trainable={trainable} not found in {declared}")


class Radial(BaseRadial):
    """User-extensible 2-body term (reference ``_terms.py:457-489``).

    Subclasses declare tensor names via the ``tensors`` class attribute and
    construct with ``MySubclass.make(cutoff, name=value, ...)``; each value
    is stored as a ``(1, F)`` array reachable as ``self.<name>`` inside an
    overridden `compute`.  ``trainable`` has no effect on execution here —
    every stored array is a pytree leaf, so optax masking (not buffer vs
    parameter registration) decides what trains.
    """

    tensors: tp.ClassVar[tp.List[str]] = []
    params: tp.Dict[str, Array] = None

    def __getattr__(self, name: str):
        params = object.__getattribute__(self, "params") or {}
        if name in params:
            return params[name]
        raise AttributeError(name)

    @classmethod
    def make(
        cls,
        cutoff: float,
        trainable: tp.Union[str, tp.Sequence[str]] = (),
        cutoff_fn: CutoffArg = "cosine",
        **kwargs,
    ) -> "Radial":
        if isinstance(trainable, str):
            trainable = [trainable]
        _validate_user_kwargs(
            cls.__name__, {"tensors": cls.tensors}, kwargs, trainable
        )
        num_feats = 1
        params = {}
        for k, v in kwargs.items():
            arr = jnp.asarray(np.asarray(v, dtype=np.float32)).reshape(1, -1)
            params[k] = arr
            num_feats = max(num_feats, arr.shape[1])
        return cls(
            cutoff=cutoff,
            cutoff_fn=parse_cutoff_fn(cutoff_fn),
            num_feats=num_feats,
            params=params,
        )


class Angular(BaseAngular):
    """User-extensible 3-body term (reference ``_terms.py:414-454``).

    Subclasses declare ``radial_tensors`` / ``angles_tensors`` names and
    override `compute_radial` / `compute_cos_angles`;
    ``num_feats = radial_feats * angles_feats`` with the shift-major,
    section-minor layout of `BaseAngular.__call__`.
    """

    radial_tensors: tp.ClassVar[tp.List[str]] = []
    angles_tensors: tp.ClassVar[tp.List[str]] = []
    params: tp.Dict[str, Array] = None

    def __getattr__(self, name: str):
        params = object.__getattribute__(self, "params") or {}
        if name in params:
            return params[name]
        raise AttributeError(name)

    @classmethod
    def make(
        cls,
        cutoff: float,
        trainable: tp.Union[str, tp.Sequence[str]] = (),
        cutoff_fn: CutoffArg = "cosine",
        **kwargs,
    ) -> "Angular":
        if isinstance(trainable, str):
            trainable = [trainable]
        _validate_user_kwargs(
            cls.__name__,
            {
                "radial_tensors": cls.radial_tensors,
                "angles_tensors": cls.angles_tensors,
            },
            kwargs,
            trainable,
        )
        radial_feats = 1
        angles_feats = 1
        params = {}
        for k, v in kwargs.items():
            arr = jnp.asarray(np.asarray(v, dtype=np.float32)).reshape(1, -1)
            params[k] = arr
            if k in cls.angles_tensors:
                angles_feats = max(angles_feats, arr.shape[1])
            else:
                radial_feats = max(radial_feats, arr.shape[1])
        return cls(
            cutoff=cutoff,
            cutoff_fn=parse_cutoff_fn(cutoff_fn),
            num_feats=radial_feats * angles_feats,
            params=params,
        )
