"""Traced-species row partition: species-blocked NN evaluation for batches.

The reference iterates per-species ``index_select``/``index_add`` over the
atom axis (``/root/reference/torchani/nn/_containers.py:412``).  On TPU the
repo has two regimes already:

- species concrete + rows contiguous (the MD driver): static slices.
- species traced (training batches): padded species-batched matmuls — every
  species' network runs over ALL atom rows and the result is masked.  With
  4 species that is 4x redundant matmul work, and it multiplies through
  every pass of second-order force training (profiled at ~18 ms of a
  72 ms batch-2560 train step: the ``f32[4, 66560, ...]`` dot_generals).

This module removes the redundancy for traced species arrays given a
STATIC per-species row budget (``caps``): atom rows are permuted into
species-contiguous blocks once per step, each species' exact-size
(unpadded) MLP runs over its own ``caps[s]`` rows, and per-atom outputs are
permuted back.  Everything stays in the cheap TPU op classes:

- ONE f32-key sort of the atom axis (unique keys ``elem * N + i``, exact
  below 2^24) gives the species-sorted order;
- block slot -> source row (``inv``) is a scalar gather off that order;
- row movement is a wide-row permutation gather whose custom vjp is the
  INVERSE permutation gather (no scatter in either AD direction, same
  trick as ``aev.computer._perm_rows``);
- dummy (padding) atoms sort past every species block and are simply never
  evaluated — with GDB-style batches (~25% padding rows) the blocked row
  count is *smaller* than the atom count.

If any species overflows its cap the lost rows would silently zero their
contribution — detected and NaN-poisoned (the repo-wide capacity-overflow
convention).
"""

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from torchani_tpu.annotations import Array

__all__ = [
    "species_blocks",
    "species_blocks_static",
    "block_rows",
    "unblock_rows",
    "measure_caps",
]

#: f32-key sort exactness bound: keys are elem * n + i < 2^24
_MAX_EXACT = 1 << 24


def supports(num_species: int, num_rows: int) -> bool:
    """Whether the f32 sort keys stay exact for this shape."""
    return (num_species + 1) * num_rows < _MAX_EXACT


def _perm_pad_rows(x: Array, fwd_idx: Array, bwd_idx: Array) -> Array:
    """Sentinel-padded permutation ``x[fwd_idx]`` (sentinel rows -> 0) whose
    transpose gathers by ``bwd_idx``.

    Both directions are wide-row gathers: ``fwd_idx`` maps output rows to
    source rows (index >= len(x) selects a zero row), ``bwd_idx`` maps
    source rows to output rows (index >= len(fwd_idx) drops the cotangent).
    The pair must be mutually inverse on the real entries.  Implemented by
    the `torchani_tpu.utils.perm_gather` primitive so every order of AD
    (and the ensemble-member vmap) stays in the gather class — force
    training differentiates the force backward, and a custom_vjp dissolves
    there into a plain ``take`` whose jvp-transpose is a scatter-add
    (pinned by tests/test_second_order_perms.py).
    """
    from torchani_tpu.utils import perm_gather

    return perm_gather(x, fwd_idx, bwd_idx)


class SpeciesBlocks(tp.NamedTuple):
    inv: Array  # (P,) source row per block slot; n = zero-pad sentinel
    pos: Array  # (N,) block slot per source row; P = dropped sentinel
    ok: Array  # () bool, False if any species overflowed its cap
    caps: tp.Tuple[int, ...]

    @property
    def offsets(self) -> tp.Tuple[int, ...]:
        off, acc = [], 0
        for c in self.caps:
            off.append(acc)
            acc += c
        return tuple(off)


def species_blocks(elem: Array, caps: tp.Sequence[int]) -> SpeciesBlocks:
    """Derive the block permutation for one traced element array.

    Args:
        elem: ``(N,)`` element indices, ``-1`` padding.
        caps: static per-species row budgets (length = num species).
    """
    caps = tuple(int(c) for c in caps)
    n = elem.shape[0]
    s = len(caps)
    if not supports(s, n):
        raise ValueError(
            f"species_blocks: {s} species x {n} rows exceeds the exact "
            f"f32 sort-key range"
        )
    key = jnp.where(elem >= 0, elem, s)  # dummies sort last
    iota = jnp.arange(n, dtype=jnp.int32)
    # unique f32 keys -> plain (unstable) sort is deterministic; f32 keys
    # sort ~9x faster than int32 on TPU (see CLAUDE.md / docs/performance.md)
    keyf = key.astype(jnp.float32) * np.float32(n) + iota.astype(jnp.float32)
    _, order = jax.lax.sort_key_val(keyf, iota)  # species-sorted source rows

    onehot = jax.nn.one_hot(key, s, dtype=jnp.float32)  # (N, S); dummies 0
    counts = jnp.sum(onehot, axis=0).astype(jnp.int32)  # (S,)
    cc = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )  # exclusive
    ok = jnp.all(counts <= jnp.asarray(caps, jnp.int32))

    # static slot grid
    species_of_slot = np.concatenate(
        [np.full((c,), i, np.int32) for i, c in enumerate(caps)]
    )
    rank_of_slot = np.concatenate(
        [np.arange(c, dtype=np.int32) for c in caps]
    )
    sos = jnp.asarray(species_of_slot)
    ros = jnp.asarray(rank_of_slot)
    valid_slot = ros < counts[sos]
    src_in_order = jnp.clip(cc[sos] + ros, max=n - 1)
    inv = jnp.where(valid_slot, jnp.take(order, src_in_order), n)

    # source row -> slot (for the inverse direction): off[e] + rank-within-e
    ranks = (jnp.cumsum(onehot, axis=0) - onehot)  # (N, S) exclusive
    rank_i = jnp.sum(ranks * onehot, axis=1).astype(jnp.int32)
    off = np.zeros((s + 1,), np.int32)
    off[:s] = np.concatenate([[0], np.cumsum(caps)[:-1]])
    p = int(sum(caps))
    off[s] = p  # dummy rows -> dropped sentinel
    pos = jnp.asarray(off)[key] + jnp.where(elem >= 0, rank_i, 0)
    pos = jnp.where(
        (elem >= 0) & (rank_i < jnp.asarray(caps + (0,), jnp.int32)[key]),
        pos,
        p,
    )
    return SpeciesBlocks(inv=inv, pos=pos, ok=ok, caps=caps)


def species_blocks_static(
    elem: np.ndarray, quantum: int = 8
) -> SpeciesBlocks:
    """Host-side `species_blocks` for a CONCRETE element array.

    The permutation tables become trace-time constants: no sort, no cumsum,
    no index gathers at run time — only the two wide-row permutation
    gathers remain.  Caps are the exact per-species counts (ceil to
    ``quantum`` rows for tile alignment), so no overflow is possible.
    """
    elem = np.asarray(elem).reshape(-1)
    n = elem.shape[0]
    smax = int(elem.max(initial=-1))
    counts = [int((elem == s).sum()) for s in range(smax + 1)]
    caps = tuple(max(-(-c // quantum) * quantum, quantum) for c in counts)
    p = int(sum(caps))
    inv = np.full((p,), n, np.int32)
    pos = np.full((n,), p, np.int32)
    off = 0
    for s, cap in enumerate(caps):
        rows = np.flatnonzero(elem == s).astype(np.int32)
        inv[off : off + rows.size] = rows
        pos[rows] = off + np.arange(rows.size, dtype=np.int32)
        off += cap
    return SpeciesBlocks(
        inv=jnp.asarray(inv),
        pos=jnp.asarray(pos),
        ok=jnp.ones((), bool),
        caps=caps,
    )


def block_rows(x: Array, blocks: SpeciesBlocks) -> Array:
    """Rows ``(N, ...)`` -> species-blocked rows ``(P, ...)`` (empty slots 0)."""
    return _perm_pad_rows(x, blocks.inv, blocks.pos)


def unblock_rows(y: Array, blocks: SpeciesBlocks) -> Array:
    """Species-blocked rows ``(P, ...)`` back to source order ``(N, ...)``
    (dummy/overflowed source rows get 0)."""
    return _perm_pad_rows(y, blocks.pos, blocks.inv)


def measure_caps(
    species_batches: tp.Iterable[np.ndarray],
    num_species: int,
    margin: float = 1.2,
    quantum: int = 256,
    max_batches: int = 16,
) -> tp.Tuple[int, ...]:
    """Per-species row budgets from sample batches (host-side).

    ``quantum`` keeps distinct cap tuples (and therefore compiled programs)
    few across batches; overflow at run time NaN-poisons, never silently
    truncates, so a drifting composition surfaces loudly.
    """
    maxc = np.zeros((num_species,), np.int64)
    for bi, sp in enumerate(species_batches):
        if bi >= max_batches:
            break
        sp = np.asarray(sp).reshape(-1)
        for s in range(num_species):
            maxc[s] = max(maxc[s], int((sp == s).sum()))
    caps = tuple(
        int(-(-max(int(c * margin), 1) // quantum) * quantum) for c in maxc
    )
    return caps
