"""Misc utilities used throughout the code.

TPU-native counterparts of the reference helpers in
``/root/reference/torchani/utils.py`` (padding, symbol conversion, cell
mapping).  Host-side batching helpers operate on numpy arrays; device-side
helpers are pure jnp and jit-safe.
"""

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from torchani_tpu.annotations import Array, Symbols
from torchani_tpu.constants import ATOMIC_NUMBER, MASS, PERIODIC_TABLE

__all__ = [
    "SYMBOLS_1X",
    "SYMBOLS_2X",
    "SYMBOLS_2X_ZNUM_ORDER",
    "PADDING",
    "ATOMIC_KEYS",
    "linspace",
    "pad_atomic_properties",
    "strip_redundant_padding",
    "map_to_central",
    "exact_matmul",
    "species_to_formula",
    "sort_by_atomic_num",
    "symbols_to_atomic_numbers",
    "atomic_numbers_to_symbols",
    "get_atomic_masses",
    "ChemicalSymbolsToInts",
    "AtomicNumbersToMasses",
    "cumsum_from_zero",
]

#: Elements used in the ANI-1x and ANI-1ccx models, in model order
SYMBOLS_1X: Symbols = ("H", "C", "N", "O")
#: Elements used in the ANI-2x model, in ani2x model order
SYMBOLS_2X: Symbols = ("H", "C", "N", "O", "S", "F", "Cl")
#: Elements used in the ANI-2x model, in atomic-number order
SYMBOLS_2X_ZNUM_ORDER: Symbols = ("H", "C", "N", "O", "F", "S", "Cl")

#: Default padding values for batched atomic properties
PADDING: tp.Dict[str, float] = {
    "species": -1,
    "numbers": -1,
    "atomic_numbers": -1,
    "coordinates": 0.0,
    "forces": 0.0,
    "energies": 0.0,
}

#: Keys whose second axis is "number of atoms"
ATOMIC_KEYS = (
    "species",
    "numbers",
    "atomic_numbers",
    "coordinates",
    "forces",
    "coefficients",
    "atomic_charges",
    "atomic_volumes_mbis",
    "atomic_charges_mbis",
    "atomic_dipole_magnitudes_mbis",
    "atomic_quadrupole_magnitudes_mbis",
    "atomic_octupole_magnitudes_mbis",
    "atomic_dipoles",
    "atomic_polarizabilities",
)


def linspace(start: float, stop: float, steps: int) -> tp.Tuple[float, ...]:
    """Pure-python linspace, *excluding* the endpoint.

    Used for reproducibility of the AEV shift constants (must bit-match the
    reference construction at ``utils.py:101-107``).
    """
    return tuple(start + ((stop - start) / steps) * j for j in range(steps))


def cumsum_from_zero(x: Array, axis: int = 0) -> Array:
    """Exclusive cumulative sum (first element 0)."""
    c = jnp.cumsum(x, axis=axis)
    return c - x


def pad_atomic_properties(
    properties: tp.Sequence[tp.Mapping[str, np.ndarray]],
    padding_values: tp.Optional[tp.Dict[str, float]] = None,
) -> tp.Dict[str, np.ndarray]:
    """Combine a sequence of property dicts into single padded arrays.

    Host-side (numpy).  Inputs are ``[{'species': arr, ...}, ...]`` where each
    array's leading axis is molecules and (for atomic keys) second axis is
    atoms; output pads the atom axis to the max across inputs and concatenates
    along molecules.
    """
    if padding_values is None:
        padding_values = PADDING
    properties = [{k: np.asarray(v) for k, v in p.items()} for p in properties]
    vectors = [k for k in properties[0] if properties[0][k].ndim > 1]
    scalars = [k for k in properties[0] if properties[0][k].ndim == 1]
    padded_sizes = {k: max(p[k].shape[1] for p in properties) for k in vectors}
    num_molecules = [p[vectors[0]].shape[0] for p in properties]
    total = sum(num_molecules)
    output: tp.Dict[str, np.ndarray] = {}
    for k in scalars:
        output[k] = np.concatenate([p[k] for p in properties])
    for k in vectors:
        first = properties[0][k]
        dtype = first.dtype
        if np.issubdtype(dtype, np.integer):
            dtype = np.int64
        shape = list(first.shape)
        shape[0] = total
        shape[1] = padded_sizes[k]
        out = np.full(shape, padding_values.get(k, 0.0), dtype=dtype)
        i0 = 0
        for n, p in zip(num_molecules, properties):
            out[i0:i0 + n, : p[k].shape[1], ...] = p[k]
            i0 += n
        output[k] = out
    return output


def strip_redundant_padding(
    properties: tp.Dict[str, np.ndarray],
    atomic_properties: tp.Iterable[str] = ATOMIC_KEYS,
) -> tp.Dict[str, np.ndarray]:
    """Strip atom-axis padding columns that are padding in *all* molecules."""
    species = np.asarray(properties["species"])
    non_padding = np.flatnonzero((species >= 0).any(axis=0))
    for k in atomic_properties:
        if k in properties:
            properties[k] = np.asarray(properties[k])[:, non_padding, ...]
    return properties


def exact_matmul(x: Array, m: Array) -> Array:
    """Matmul pinned to strict-f32 (``Precision.HIGHEST``).

    TPU's DEFAULT f32 matmul rounds both inputs to bf16 (one MXU pass,
    ~0.4% relative).  For the tiny ``(N, 3) @ (3, 3)`` cell / strain
    transforms that carry atom POSITIONS this is ~0.05 A of silent error
    through a 12 A cell — found as a 0.017 Ha energy / 24% force
    chip-vs-CPU discrepancy in the on-chip PBC parity lane
    (``tools/tpu_smoke.py``).  Every position-carrying matmul in the
    package must go through this helper (or pin precision itself).
    """
    return jnp.matmul(x, m, precision=jax.lax.Precision.HIGHEST)


def map_to_central(coordinates: Array, cell: Array, pbc: Array) -> Array:
    """Map atoms outside the unit cell into the central cell using PBC.

    Semantics match reference ``utils.py:237-258``: fractionalise, wrap into
    [0, 1) along periodic axes only, convert back to cartesian.
    """
    inv_cell = jnp.linalg.inv(cell)
    frac = exact_matmul(coordinates, inv_cell)
    frac = frac - jnp.floor(frac) * pbc
    return exact_matmul(frac, cell)


def species_to_formula(species: np.ndarray) -> tp.List[str]:
    """Array of chemical symbols -> list of formulas (alphabetical order)."""
    species = np.asarray(species)
    if species.ndim == 1:
        species = species[None]
    elif species.ndim != 2:
        raise ValueError("Species needs to have two dims/axes")
    formulas = []
    for row in species:
        symbols, counts = np.unique(row[row != ""], return_counts=True)
        formulas.append(
            "".join(
                f"{s}{c}" if c > 1 else str(s) for s, c in zip(symbols, counts)
            )
        )
    return formulas


def sort_by_atomic_num(symbols: tp.Sequence[str]) -> Symbols:
    """Sort chemical symbols by atomic number."""
    return tuple(sorted(symbols, key=lambda s: ATOMIC_NUMBER[s]))


def symbols_to_atomic_numbers(symbols: tp.Sequence[str]) -> tp.Tuple[int, ...]:
    return tuple(ATOMIC_NUMBER[s] for s in symbols)


def atomic_numbers_to_symbols(znums: tp.Sequence[int]) -> Symbols:
    return tuple(PERIODIC_TABLE[int(z)] for z in znums)


class ChemicalSymbolsToInts:
    """Map chemical symbols to 0-based model element indices.

    .. code-block:: python

        conv = ChemicalSymbolsToInts(("H", "C", "N", "O"))
        conv(["C", "H", "H"])  # -> array([1, 0, 0])
    """

    def __init__(self, symbols: tp.Sequence[str]) -> None:
        self._symbols = tuple(symbols)
        self._map = {s: i for i, s in enumerate(self._symbols)}

    def __call__(self, symbols: tp.Sequence[str]) -> np.ndarray:
        return np.array([self._map[s] for s in symbols], dtype=np.int64)

    def __len__(self) -> int:
        return len(self._symbols)


class AtomicNumbersToMasses:
    """Convert atomic numbers to masses (AMU); padding (-1) maps to 0."""

    def __init__(self) -> None:
        masses = [0.0] + [0.0 if math.isnan(m) else m for m in MASS[1:]]
        self._masses = jnp.asarray(np.array(masses, dtype=np.float32))

    def __call__(self, atomic_numbers: Array) -> Array:
        znums = jnp.where(atomic_numbers < 0, 0, atomic_numbers)
        return jnp.take(self._masses, znums, axis=0)


def get_atomic_masses(atomic_numbers: Array) -> Array:
    """Masses (AMU) for a tensor of atomic numbers; -1 padding maps to 0."""
    return AtomicNumbersToMasses()(atomic_numbers)


class ChemicalSymbolsToAtomicNumbers:
    """Map chemical symbols to atomic numbers (reference utils.py parity)."""

    def __call__(self, symbols: tp.Sequence[str]) -> np.ndarray:
        return np.array(symbols_to_atomic_numbers(symbols), dtype=np.int64)


class AtomicNumbersToChemicalSymbols:
    """Map atomic numbers back to chemical symbols; -1 padding is dropped."""

    def __call__(self, atomic_numbers: tp.Sequence[int]) -> tp.List[str]:
        return [s for s in atomic_numbers_to_symbols(
            [int(z) for z in np.asarray(atomic_numbers).reshape(-1) if int(z) >= 0]
        )]


class IntsToChemicalSymbols:
    """Map 0-based model element indices back to chemical symbols."""

    def __init__(self, symbols: tp.Sequence[str]) -> None:
        self._symbols = tuple(symbols)

    def __call__(self, idxs: tp.Sequence[int]) -> tp.List[str]:
        return [
            self._symbols[int(i)]
            for i in np.asarray(idxs).reshape(-1)
            if int(i) >= 0
        ]


def atomic_numbers_to_masses(atomic_numbers: Array) -> Array:
    """Alias of :func:`get_atomic_masses` (reference utils.py name)."""
    return get_atomic_masses(atomic_numbers)


def download_and_extract(*args: tp.Any, **kwargs: tp.Any) -> None:
    """Unavailable: this build runs without network egress.

    The reference uses this to fetch published datasets/weights
    (/root/reference/torchani/utils.py). Place files under the local data
    root (``torchani_tpu.paths``) instead.
    """
    raise RuntimeError(
        "download_and_extract is unavailable in this environment (no network "
        "egress). Place the archive under the torchani_tpu data root instead."
    )


def _perm_gather_impl(x: Array, fwd_idx: Array, bwd_idx: Array) -> Array:
    n = x.shape[0]
    safe = jnp.minimum(fwd_idx, max(n - 1, 0))
    out = jnp.take(x, safe, axis=0)
    keep = (fwd_idx < n).reshape((fwd_idx.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(keep, out, jnp.zeros((), x.dtype))


def _make_perm_gather():
    from jax.core import ShapedArray
    from jax.extend.core import Primitive
    from jax.interpreters import ad, batching, mlir

    p = Primitive("perm_gather")
    p.def_impl(_perm_gather_impl)
    p.def_abstract_eval(
        lambda x, f, b: ShapedArray((f.shape[0],) + x.shape[1:], x.dtype)
    )
    ad.defjvp(p, lambda g, x, f, b: p.bind(g, f, b), None, None)

    def transpose(ct, x, fwd_idx, bwd_idx):
        assert ad.is_undefined_primal(x)
        if type(ct) is ad.Zero:
            return [ad.Zero(x.aval), None, None]
        return [p.bind(ct, bwd_idx, fwd_idx), None, None]

    ad.primitive_transposes[p] = transpose

    def batch(args, dims):
        x, f, b = args
        xd, fd, bd = dims
        if fd is not None or bd is not None:
            raise NotImplementedError("perm_gather: batched indices")
        return p.bind(jnp.moveaxis(x, xd, 1), f, b), 1

    batching.primitive_batchers[p] = batch
    mlir.register_lowering(
        p, mlir.lower_fun(_perm_gather_impl, multiple_results=False)
    )
    return p


_perm_gather_p = _make_perm_gather()


def perm_gather(x: Array, fwd_idx: Array, bwd_idx: Array) -> Array:
    """Sentinel-padded permutation row gather whose TRANSPOSE is the
    inverse gather, at every order of AD.

    ``out[j] = x[fwd_idx[j]]`` for in-range indices, 0 for sentinel
    indices (``>= len(x)``).  ``bwd_idx`` must be the mutual inverse on
    the real entries (``fwd_idx[bwd_idx[i]] == i`` whenever
    ``bwd_idx[i]`` is in range) with sentinels ``>= len(fwd_idx)`` for
    dropped rows; the transpose of the op is then exactly
    ``perm_gather(ct, bwd_idx, fwd_idx)``.

    Why a primitive: the transpose of a plain row gather is a scatter-add
    — the recurring TPU per-row disease (CLAUDE.md).  For permutations
    the scatter is exactly a gather by the inverse.  ``jax.custom_vjp``
    only fixes FIRST-order AD (under force training's grad-of-grad it
    dissolves into its fwd's plain ``take``, whose jvp-transpose
    scatters), and ``jax.custom_derivatives.linear_call`` has no vmap
    batching rule (the ensemble member axis vmaps over this op).  A
    primitive with a linear jvp, a swap-the-indices transpose and a
    move-the-batch-axis batching rule composes under every transform;
    op-class pinned by tests/test_second_order_perms.py.
    """
    return _perm_gather_p.bind(x, fwd_idx, bwd_idx)


def nonzero_in_chunks(x: Array, chunk_size: int = 2**31 - 1) -> Array:
    """Flat indices of nonzero elements (reference ``utils.py:139-162``).

    The reference works around torch's INT_MAX nonzero limit by chunking;
    the XLA-side analog of compaction is masking (dynamic shapes don't jit),
    so this host-side helper exists for eager dataset/utility code only.
    """
    flat = np.asarray(jax.device_get(x)).reshape(-1)
    return jnp.asarray(np.flatnonzero(flat))


def fast_masked_select(x: Array, mask: Array, idx: int = 0) -> Array:
    """``x[mask]`` along axis ``idx`` (reference ``utils.py:165-171``).

    Eager-only (the result shape is data-dependent); inside jit use masked
    operations instead.
    """
    return jnp.take(jnp.asarray(x), nonzero_in_chunks(mask), axis=idx)


def __getattr__(name: str):  # lazy aliases, avoiding circular imports
    if name == "EnergyShifter":
        from torchani_tpu.sae import SelfEnergy

        return SelfEnergy
    if name == "merge_state_dicts":
        from torchani_tpu.training.checkpoints import merge_state_dicts

        return merge_state_dicts
    raise AttributeError(f"module 'torchani_tpu.utils' has no attribute {name!r}")
