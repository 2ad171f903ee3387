"""Scatter/gather-free Verlet refresh via bucket-local one-hot MXU dots.

The per-step MD refresh must produce each atom's K neighbor positions from
the current coordinates.  A plain ``coords[idx]`` row gather runs at the TPU
per-row gather floor (~290M rows/s) and its backward is as expensive again
(tools/refresh_microbench.py) — together the largest cost of the MD step.

This module replaces both directions with MXU contractions over *bucket-local*
candidate sets (reference analog: the cuAEV pairlist kernels tile over
cell-list buckets, ``aev.cu:181-321``; here the same locality feeds a
matmul instead of a thread-block):

- Atoms are binned into the cell-list bucket grid (edge >= cutoff + skin),
  ``C`` padded slots per bucket.  A bucket's candidates are the atoms of its
  27 surrounding buckets — built every step by 27 *static* ``jnp.roll``s of
  the ``(gx, gy, gz, C, 3)`` slot table (no gathers), plus a per-(bucket,
  section) constant image shift.
- Each neighbor lane caches (at rebuild time) the *candidate key*
  ``(section o << 8) | rank(j)`` of its partner: which of the ``27 * C``
  candidates it is.  The per-step "gather" is then a FACTORED two-stage
  selection per bucket (a joint one-hot over ``27*C`` candidates is the
  tensor product of a rank one-hot and a section one-hot):

      stage 1 (MXU):  tmp (3*32, K*C) = cand (3*32, 3C) @ onehot3(rank) (3C, K*C)
      stage 2 (VPU):  out (3, K*C)    = sum_s tmp[d*32+s, :] * (s == o)

  where the 3C contraction axis carries the three bf16 split planes of the
  f32 candidate values side by side (the f32 accumulator sums the three
  picks — exact, no post-dot split-plane reduction, 75% MXU utilization).

  (sections are zero-padded 27 -> 32 rows so every kernel slab is
  sublane-tile aligned; the sentinel section 27 selects a zero pad row)

  The naive joint form costs ``27*C x C*K`` selector compares and MXU tiles
  padded on a 16-row LHS; the factored form contracts over ``C`` on the MXU
  (dense, 81-row LHS) and reduces 27 terms on the VPU — ~20x less selector
  work at realistic ``C`` (water box C=64).  f32 exactness comes from an
  explicit bf16 triple split of the value side (hi+mid+lo reconstructs f32
  bit-exactly; the one-hot side is exact in bf16), so the forward is the
  *exact* f32 selection.  The backward is the transposed contraction —
  no scatter, no partner-lane map.

Coordinate convention: MD coordinates drift unwrapped across the periodic
box.  All positions here are *canonical*: ``canon = coords - wrap_offset``
where ``wrap_offset = floor(frac(coords)) @ cell`` is frozen at rebuild
time, so canonical positions move continuously, live in the box the bucket
grid was built for, and the per-(bucket, section) shift stays constant
between rebuilds.
"""

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchani_tpu.annotations import Array
from torchani_tpu.utils import exact_matmul

__all__ = [
    "BucketTables",
    "build_bucket_tables",
    "bucket_nbr_pos",
    "bucket_lane_values",
    "select_lane_values",
    "make_wrapshift",
    "tables_from_cell_aux",
]

#: lane key encoding: (section << 8) | rank; section 27 = masked sentinel
_SENTINEL = 27 << 8

_SECTION_OFFSETS = np.mgrid[-1:2, -1:2, -1:2].reshape(3, -1).T  # (27, 3)


class BucketTables(struct.PyTreeNode):
    """Rebuild-time tables for the bucket-dot refresh (all static shapes).

    Every static parameter is recoverable from array shapes: the grid from
    ``wrapshift``, ``C`` from ``atom_of_slot`` vs the grid, ``K`` from
    ``keys`` vs ``C``.
    """

    keys: Array  # (G, C*K) int32 (section << 8) | rank per (slot-row, lane); sentinel section = 27
    atom_of_slot: Array  # (G*C,) int32 atom index per slot, sentinel = A
    slot_of_atom: Array  # (A,) int32 slot per atom, -1 for dummy/overflowed atoms
    wrap_offset: Array  # (A, 3) f32, frozen floor-offset: canon = coords - wrap_offset
    wrapshift: Array  # (gx, gy, gz, 27, 3) f32 image shift per (bucket, section)


def make_wrapshift(
    grid_shape: tp.Tuple[int, int, int], cell: np.ndarray
) -> np.ndarray:
    """(gx, gy, gz, 27, 3) cartesian shift: section o of bucket b holds atoms
    of bucket wrap(b3 + off_o); the shift is the unwrap ``floordiv`` times
    the cell."""
    gx, gy, gz = grid_shape
    b3 = np.stack(
        np.meshgrid(np.arange(gx), np.arange(gy), np.arange(gz), indexing="ij"),
        axis=-1,
    )  # (gx, gy, gz, 3)
    nb3 = b3[:, :, :, None, :] + _SECTION_OFFSETS[None, None, None, :, :]
    wrap = np.floor_divide(nb3, np.array([gx, gy, gz]))
    return (
        (wrap.reshape(-1, 3) @ np.asarray(cell))
        .reshape(gx, gy, gz, 27, 3)
        .astype(np.float32)
    )


def _rank_in_bucket(bucket: Array, num_atoms: int) -> Array:
    """Stable per-bucket rank via argsort + shift-compare/cummax segment
    starts (same trick as ``neighbors.cell_list``; no searchsorted)."""
    order = jnp.argsort(bucket, stable=True)
    sorted_bucket = jnp.take(bucket, order)
    pos = jnp.arange(num_atoms, dtype=jnp.int32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_bucket[1:] != sorted_bucket[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(is_new, pos, 0))
    rank_sorted = pos - seg_start.astype(jnp.int32)
    return jnp.zeros((num_atoms,), jnp.int32).at[order].set(rank_sorted)


def build_bucket_tables(
    coords: Array,  # (A, 3) internal-order, unwrapped
    idx: Array,  # (A, K) cached neighbor table
    mask: Array,  # (A, K)
    shift: Array,  # (A, K, 3) cached cartesian image shifts
    valid_atom: Array,  # (A,) bool, False for dummy padding atoms
    cell: Array,  # (3, 3)
    grid_shape: tp.Tuple[int, int, int],
    c: int,  # slot capacity (multiple of 16)
    wrapshift: Array,  # (gx, gy, gz, 27, 3) from make_wrapshift
) -> tp.Tuple[BucketTables, Array]:
    """Derive the refresh tables from the cached topology (traced; runs at
    each Verlet rebuild).  Returns ``(tables, overflow)``."""
    gx, gy, gz = grid_shape
    g = gx * gy * gz
    a, k = idx.shape
    if c % 16 or c > 256 or (c * k) % 128:
        raise ValueError(
            f"bucket slot capacity c={c} must be a multiple of 16, <= 256, "
            f"with c*K (K={k}) a multiple of 128"
        )
    sentinel = _SENTINEL

    cell_inv = jnp.linalg.inv(cell)
    u = exact_matmul(coords, cell_inv)  # (A, 3) fractional, unwrapped
    fu = jnp.floor(u)
    m = jnp.clip(u - fu, 0.0, 1.0 - 1e-7)
    gdims = jnp.array([gx, gy, gz], jnp.int32)
    idx3 = jnp.minimum((m * gdims).astype(jnp.int32), gdims - 1)  # (A, 3)
    bucket = (idx3[:, 0] * gy + idx3[:, 1]) * gz + idx3[:, 2]
    bucket = jnp.where(valid_atom, bucket, g)  # dummies into a trash bucket
    rank = _rank_in_bucket(bucket, a)
    slot_ok = valid_atom & (rank < c)
    overflow = jnp.any(valid_atom & (rank >= c))

    slot_of_atom = jnp.where(slot_ok, bucket * c + rank, -1)
    atom_of_slot = (
        jnp.full((g * c + 1,), a, jnp.int32)
        .at[jnp.where(slot_ok, slot_of_atom, g * c)]
        .set(jnp.arange(a, dtype=jnp.int32), mode="drop")[: g * c]
    )

    # ---- per-lane candidate keys ----
    # The section offset is derived from INTEGER quantities only (bucket
    # indices + exact lattice wraps), never from float floors of the pair
    # position: a float re-derivation can disagree with the partner's own
    # bucket assignment at gridline boundaries, silently selecting the
    # wrong atom.  Identity: the lane's image sits in virtual bucket
    # idx3_j + gdims * D with D = fu_j + w - fu_i, and only D mod 3 matters
    # because a valid offset lands in [-1, 1].
    fm = jnp.remainder(fu.astype(jnp.int32), 3)  # (A, 3) in [0, 3)
    fmcode = (fm[:, 0] * 3 + fm[:, 1]) * 3 + fm[:, 2]  # < 27
    # one packed per-atom code -> a single (A, K) gather at rebuild time
    code_atom = rank + c * (jnp.where(valid_atom, bucket, 0) + g * fmcode)
    jidx = jnp.where(mask, idx, 0)
    code_j = jnp.take(code_atom, jidx, axis=0)  # (A, K)
    rank_j = code_j % c
    rest = code_j // c
    bucket_j = rest % g
    fm_j3 = rest // g
    fm_j = jnp.stack(
        [(fm_j3 // 9) % 3, (fm_j3 // 3) % 3, fm_j3 % 3], axis=-1
    )  # (A, K, 3)
    idx3_j = jnp.stack(
        [bucket_j // (gy * gz), (bucket_j // gz) % gy, bucket_j % gz], axis=-1
    )
    w = jnp.round(exact_matmul(shift, cell_inv)).astype(jnp.int32)  # (A, K, 3) lattice wrap
    d3 = jnp.remainder(fm_j + w - fm[:, None, :] + 1, 3) - 1  # in {-1, 0, 1}
    off3 = idx3_j + gdims * d3 - idx3[:, None, :]  # (A, K, 3)
    off_ok = jnp.all((off3 >= -1) & (off3 <= 1), axis=-1)
    overflow = overflow | jnp.any(mask & ~off_ok)
    overflow = overflow | jnp.any(mask & (rank_j >= c))
    o = ((off3[..., 0] + 1) * 3 + (off3[..., 1] + 1)) * 3 + (off3[..., 2] + 1)
    lane_ok = mask & off_ok & (rank_j < c)
    keys_atom = jnp.where(lane_ok, (o << 8) | rank_j, sentinel).astype(
        jnp.int32
    )

    # reorder lane keys into slot-row order (a G*C wide-row gather, cheap)
    keys_pad = jnp.concatenate(
        [keys_atom, jnp.full((1, k), sentinel, jnp.int32)], axis=0
    )
    keys = jnp.take(keys_pad, jnp.minimum(atom_of_slot, a), axis=0).reshape(
        g, c * k
    )

    wrap_offset = exact_matmul(fu, cell).astype(coords.dtype)
    tables = BucketTables(
        keys=keys,
        atom_of_slot=atom_of_slot,
        slot_of_atom=slot_of_atom,
        wrap_offset=wrap_offset,
        wrapshift=wrapshift,
    )
    return tables, overflow


def tables_from_cell_aux(
    keys_atom: Array,  # (A, K) (section << 8) | rank, sentinel section 27
    mask: Array,  # (A, K) final lane mask (post any lane permutation)
    atom_of_slot: Array,  # (G*C,) from cell_list aux, sentinel = A
    slot_of_atom: Array,  # (A,) from cell_list aux, -1 invalid
    wrap_offset: Array,  # (A, 3) coords - central (frozen at rebuild)
    wrapshift: Array,  # (gx, gy, gz, 27, 3) static, from make_wrapshift
    c: int,
) -> BucketTables:
    """Assemble refresh tables from ``cell_list(..., bucket_aux=True)``.

    The expensive key derivation of `build_bucket_tables` (an (A, K) scalar
    gather + integer re-derivation of sections, ~40 ms at 10k atoms) is
    unnecessary when the cell list itself emits its internal candidate
    positions — this is just a sentinel re-mask and the slot-row reorder
    (one G*C wide-row gather).
    """
    a, k = keys_atom.shape
    g = atom_of_slot.shape[0] // c
    if c % 16 or c > 256 or (c * k) % 128:
        raise ValueError(
            f"bucket slot capacity c={c} must be a multiple of 16, <= 256, "
            f"with c*K (K={k}) a multiple of 128"
        )
    keys_atom = jnp.where(mask, keys_atom, _SENTINEL)
    keys_pad = jnp.concatenate(
        [keys_atom, jnp.full((1, k), _SENTINEL, jnp.int32)], axis=0
    )
    keys = jnp.take(keys_pad, jnp.minimum(atom_of_slot, a), axis=0).reshape(
        g, c * k
    )
    return BucketTables(
        keys=keys,
        atom_of_slot=atom_of_slot,
        slot_of_atom=slot_of_atom,
        wrap_offset=wrap_offset,
        wrapshift=wrapshift,
    )


# ---------------------------------------------------------------------------
# exact bf16 triple split
# ---------------------------------------------------------------------------


def _trunc16(v: Array) -> Array:
    """Truncate f32 to its top 16 bits (an exactly-bf16 value) via integer
    masking.  NOT convert-to-bf16-and-back: XLA's excess-precision rule
    elides f32->bf16->f32 round-trips on TPU, which silently destroys the
    split (measured: hi absorbed everything; tools/bucketdot_microbench.py).
    """
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(v, jnp.uint32) & np.uint32(0xFFFF0000),
        jnp.float32,
    )


def _split3(x: Array) -> tp.Tuple[Array, Array, Array]:
    """f32 -> (hi, mid, lo) bf16 with hi + mid + lo == x bit-exactly."""
    hi = _trunc16(x)
    r1 = x - hi
    mid = _trunc16(r1)
    lo = r1 - mid
    return (
        hi.astype(jnp.bfloat16),
        mid.astype(jnp.bfloat16),
        lo.astype(jnp.bfloat16),
    )


# ---------------------------------------------------------------------------
# Pallas kernels: factored (rank x section) selection
# ---------------------------------------------------------------------------


def _pick_rc(r: int, bytes_per_lane: int, budget_bytes: int = 4 * 2**20) -> int:
    """Largest 128-multiple chunk of R fitting the VMEM budget."""
    for n in range(1, r // 128 + 1):
        if r % n:
            continue
        rc = r // n
        if rc % 128 == 0 and rc * bytes_per_lane <= budget_bytes:
            return rc
    return 128


def _pick_nb(g: int, per_bucket_bytes: int, scratch_bytes: int) -> int:
    """Buckets per grid step: each step's body is small (a (288, C) x (C, RC)
    dot + VPU masks), so at realistic shapes the (G, R/RC) grid is dominated
    by per-step sequencing overhead, not compute.  Batching NB buckets into
    one step via an in-kernel fori_loop amortizes it.  NB must divide G;
    block buffers are double-buffered (x2), the loop scratch is not."""
    import os

    forced = os.environ.get("TORCHANI_TPU_BUCKETDOT_NB")
    if forced:
        return max(1, min(int(forced), g)) if g % int(forced) == 0 else 1
    budget = 12 * 2**20
    best = 1
    for nb in range(2, min(g, 64) + 1):
        if g % nb == 0 and 2 * nb * per_bucket_bytes + scratch_bytes <= budget:
            best = nb
    return best


_DN = (((1,), (0,)), ((), ()))

# r5 experiment switch: backward-select kernel with the bf16 split planes on
# the dot's contraction axis (mirrors the r3 forward restructure).  MEASURED
# 4x WORSE than the stacked form (9.36 vs 2.32 ms at water-box shapes,
# tools/bucketdot_microbench.py r5) — the 3x-wide per-chunk selector build
# and the 4D broadcast of h cost far more than the avoided (288, C) tmp +
# p-sum, unlike the fwd case where the value side is tiny.  Kept opt-in for
# reproducibility; default stays the stacked kernel.
_BWD_CONTRACT_SPLIT = (
    __import__("os").environ.get("TORCHANI_TPU_BWD_SPLIT", "stack")
    == "contract"
)


def _fwd_kernel(c, nb, nc_ref, keys_ref, v_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    def body(b, carry):
        # occupied slots are each bucket's PREFIX (rank-dense assignment in
        # build_bucket_tables), so lanes >= counts[b]*K are all-sentinel:
        # whole R chunks beyond the per-bucket bound are skipped (the
        # untouched output rows belong to unoccupied slots and are never
        # gathered downstream).  ~55% of slot-lanes are sentinels at
        # water-box occupancy — this roughly halves both kernels.
        do_chunk = j < nc_ref[i * nb + b]

        @pl.when(do_chunk)
        def _():
            _fwd_chunk(c, b, keys_ref, v_ref, out_ref)

        return carry

    jax.lax.fori_loop(0, nb, body, 0)


def _fwd_chunk(c, b, keys_ref, v_ref, out_ref):
    kk = keys_ref[b, 0]  # (RC,) int32
    rc = kk.shape[0]
    rank = kk & 255
    sec = kk >> 8  # 27 = sentinel -> hits the zero-padded row 27
    # selector (3C, RC): the rank one-hot tiled 3x down the contraction
    # axis, one copy per bf16 split plane
    ranks = jax.lax.broadcasted_iota(jnp.int32, (3 * c, rc), 0) % c
    sel_r = (ranks == rank[None, :]).astype(jnp.bfloat16)  # (3C, RC)
    # rank contraction on the MXU: LHS (96, 3C) holds the three bf16
    # split planes side by side along the CONTRACTION axis (rows d*32+s;
    # sections padded 27 -> 32 so every slab below is sublane-tile
    # aligned — unaligned 3-row or 27-row slices forced Mosaic relayouts
    # that dominated the kernel, and a 27-term unrolled FMA body hung
    # its compiler).  Each row picks ONE candidate per split plane and
    # the f32 accumulator sums the three picks, so the dot output IS the
    # exact f32 value — no post-dot split-plane sum, and the 3C=192
    # contraction runs the MXU at 75% utilization instead of C=64's 50%
    # (fwd kernel 1.76 -> 1.36 ms at water-box shapes,
    # tools/bucketdot_v2_experiment.py).
    t = jax.lax.dot_general(
        v_ref[b], sel_r, _DN, preferred_element_type=jnp.float32
    )  # (96, RC) exact
    # section combine: per coord d, a 32-row aligned masked sublane-sum.
    # Sentinel lanes (sec == 27) select the zero pad rows -> exact 0.
    secs = jax.lax.broadcasted_iota(jnp.int32, (32, rc), 0)
    m32 = (secs == sec[None, :]).astype(jnp.float32)  # (32, RC)
    res = jnp.concatenate(
        [
            jnp.sum(t[32 * d : 32 * d + 32] * m32, axis=0, keepdims=True)
            for d in range(3)
        ]
        + [jnp.zeros((5, rc), jnp.float32)],
        axis=0,
    )  # (8, RC)
    out_ref[b] = res


def _bwd_kernel(c, nb, nc_ref, g16_ref, keys_ref, out_ref):
    i = pl.program_id(0)
    r = pl.program_id(1)

    def body(b, carry):
        # chunk r == 0 always runs (it must initialize the accumulator; for
        # an empty bucket its all-sentinel lanes only touch the discarded
        # pad-section rows); later chunks beyond the per-bucket occupied-
        # lane bound are all-sentinel and skipped — see _fwd_kernel.
        @pl.when((r == 0) | (r < nc_ref[i * nb + b]))
        def _():
            _bwd_chunk(c, r, b, g16_ref, keys_ref, out_ref)

        return carry

    jax.lax.fori_loop(0, nb, body, 0)


def _bwd_chunk(c, r, b, g16_ref, keys_ref, out_ref):
    kk = keys_ref[b, 0]  # (RC,)
    rc = kk.shape[0]
    rank = kk & 255
    sec = kk >> 8
    secs = jax.lax.broadcasted_iota(jnp.int32, (32, rc), 0)
    m32 = (secs == sec[None, :]).astype(jnp.bfloat16)  # (32, RC)
    g9 = g16_ref[b][:9]  # (9, RC) rows p*3 + d (split-plane-major)
    if _BWD_CONTRACT_SPLIT:
        # r5: the three bf16 split planes of the cotangent ride the dot's
        # CONTRACTION axis (the same restructure the r3 fwd kernel got):
        # LHS (96, 3RC) rows d*32+s with column blocks p, RHS the rank
        # one-hot tiled per plane — the f32 accumulator sums the planes
        # inside the dot, so there is no (288, C) tmp and no post-dot
        # p-sum.  Products stay exact (bf16 x {0,1}).
        ranks3 = jax.lax.broadcasted_iota(jnp.int32, (3, rc, c), 2)
        sel3 = (ranks3 == rank[None, :, None]).astype(jnp.bfloat16)
        sel3 = sel3.reshape(3 * rc, c)  # rows p*RC + lane
        gdp = jnp.transpose(g9.reshape(3, 3, rc), (1, 0, 2))  # (d, p, RC)
        h = (gdp[:, None, :, :] * m32[None, :, None, :]).reshape(96, 3 * rc)
        part = jax.lax.dot_general(
            h, sel3, _DN, preferred_element_type=jnp.float32
        )  # (96, C) rows d*32 + s
    else:
        ranks = jax.lax.broadcasted_iota(jnp.int32, (rc, c), 1)
        sel_r = (ranks == rank[:, None]).astype(jnp.bfloat16)  # (RC, C)
        # one tall (288, RC) LHS: rows p*96 + d*32 + s — per (split, coord)
        # a 32-row aligned slab of the section-masked cotangent row
        # (products are exact: bf16 x {0,1}).  Same aligned-slab reasoning
        # as _fwd_kernel.  Sentinel lanes land in the discarded pad rows
        # s in [27, 32).
        # h via ONE broadcast-multiply + row-major reshape instead of 9
        # concatenated masked slabs (the concat forced relayout copies;
        # bwd kernel 3.45 -> 2.37 ms, tools/bucketdot_v2_experiment.py)
        h = (g9[:, None, :] * m32[None, :, :]).reshape(9 * 32, rc)
        tmp = jax.lax.dot_general(
            h, sel_r, _DN, preferred_element_type=jnp.float32
        )  # (288, C) rows (p, d, s)
        part = tmp[0:96] + tmp[96:192] + tmp[192:288]  # (96, C) exact p-sum

    @pl.when(r == 0)
    def _():
        out_ref[b] = part

    @pl.when(r != 0)
    def _():
        out_ref[b] += part


def _interpret() -> bool:
    # honor `jax.default_device(cpu)` contexts (the on-chip smoke compares
    # the chip against the CPU backend of the SAME process): the backend
    # list still leads with the TPU there, but lowering targets the
    # default device's platform
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) != "tpu"
    return jax.default_backend() != "tpu"


def _bucket_select_fwd(
    cand16, keys: Array, nlanes: tp.Optional[Array] = None
) -> Array:
    """cand16: 3x (G, 96, C) bf16 split planes of cand with rows d*32 + s
    (sections zero-padded 27 -> 32); keys (G, R) int32 -> (G, 8, R) f32
    whose rows 0..2 are the exact f32 candidate selection per lane.
    ``nlanes`` (G,) int32: per-bucket occupied-lane count (lanes beyond it
    are all-sentinel and their R chunks are skipped; their output rows are
    left unwritten — callers must only read occupied slots' rows)."""
    hi, mid, lo = cand16
    g, _, c = hi.shape
    r = keys.shape[1]
    # t (96, RC) f32 + sel (3C, RC) bf16 dominate the VMEM footprint
    rc = _pick_rc(r, 4 * 96 + 2 * 3 * c + 96)
    nb = _pick_nb(g, rc * (4 + 32 * 4) + 96 * 3 * c * 2, 96 * rc * 4)
    if nlanes is None:
        nchunks = jnp.full((g,), r // rc, jnp.int32)
    else:
        nchunks = (nlanes + (rc - 1)) // rc
    v = jnp.concatenate([hi, mid, lo], axis=2)  # (G, 96, 3C)
    return pl.pallas_call(
        partial(_fwd_kernel, c, nb),
        grid=(g // nb, r // rc),
        in_specs=[
            pl.BlockSpec((g,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((nb, 1, rc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((nb, 96, 3 * c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, 8, rc), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((g, 8, r), jnp.float32),
        interpret=_interpret(),
    )(nchunks, keys.reshape(g, 1, r), v)


def _bucket_select_bwd(
    g16: Array, keys: Array, c: int, nlanes: tp.Optional[Array] = None
) -> Array:
    """g16 (G, 16, R) bf16 split rows [hi(3); mid(3); lo(3); pad]; keys
    (G, R) -> (G, 96, C) f32 rows d*32 + s = transposed contraction (lane
    cotangents summed onto candidates; split planes summed in-kernel).
    ``nlanes``: see `_bucket_select_fwd` (skipped chunks contribute zero)."""
    g, _, r = g16.shape
    # h (96, 3RC)|(288, RC) bf16 (same bytes) + the selector + tmp dominate
    # the VMEM footprint; the contract-split variant's selector is 3x wider
    # per lane but its tmp is (96, C) instead of (288, C)
    if _BWD_CONTRACT_SPLIT:
        rc = _pick_rc(r, 2 * 288 + 6 * c + 96)
        nb = _pick_nb(
            g, rc * (4 + 16 * 2) + 96 * c * 4,
            288 * rc * 2 + 3 * rc * c * 2 + 96 * c * 4,
        )
    else:
        rc = _pick_rc(r, 2 * 288 + 2 * c + 96)
        nb = _pick_nb(
            g, rc * (4 + 16 * 2) + 96 * c * 4, 288 * rc * 2 + 288 * c * 4
        )
    if nlanes is None:
        nchunks = jnp.full((g,), r // rc, jnp.int32)
    else:
        nchunks = (nlanes + (rc - 1)) // rc
    return pl.pallas_call(
        partial(_bwd_kernel, c, nb),
        grid=(g // nb, r // rc),
        in_specs=[
            pl.BlockSpec((g,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((nb, 16, rc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((nb, 1, rc), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((nb, 96, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, 96, c), jnp.float32),
        interpret=_interpret(),
    )(nchunks, g16, keys.reshape(g, 1, r))


# ---------------------------------------------------------------------------
# P-channel per-lane VALUE selection (runtime per-atom scalars)
# ---------------------------------------------------------------------------
#
# The same factored (rank x section) selection, generalized from 3 position
# channels to P arbitrary value channels — the scatter-free lane-select for
# RUNTIME per-atom quantities that cannot ride a rebuild-time payload fold
# (D3 coordination numbers, ANIq charges).  A per-lane values[idx] gather is
# payload-1 (the slowest gather class, ~20 ms fwd at (9775, 370) solvated-
# protein lanes) and its backward is a scatter (~27 ms); the kernels below
# run at the refresh kernels' ~1 ms scale.  No wrapshift: values carry no
# positional image offset.


def _fwd_kernel_vals(c, p, nb, nc_ref, keys_ref, v_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    outr = max(8, -(-p // 8) * 8)

    def body(b, carry):
        @pl.when(j < nc_ref[i * nb + b])
        def _():
            kk = keys_ref[b, 0]
            rc = kk.shape[0]
            rank = kk & 255
            sec = kk >> 8
            ranks = jax.lax.broadcasted_iota(jnp.int32, (3 * c, rc), 0) % c
            sel = (ranks == rank[None, :]).astype(jnp.bfloat16)  # (3C, RC)
            t = jax.lax.dot_general(
                v_ref[b], sel, _DN, preferred_element_type=jnp.float32
            )  # (32p, RC), rows d*32 + s, exact (split planes on contraction)
            secs = jax.lax.broadcasted_iota(jnp.int32, (32, rc), 0)
            m32 = (secs == sec[None, :]).astype(jnp.float32)
            res = jnp.concatenate(
                [
                    jnp.sum(
                        t[32 * d : 32 * d + 32] * m32, axis=0, keepdims=True
                    )
                    for d in range(p)
                ]
                + [jnp.zeros((outr - p, rc), jnp.float32)],
                axis=0,
            )
            out_ref[b] = res

        return carry

    jax.lax.fori_loop(0, nb, body, 0)


def _bwd_kernel_vals(c, p, nb, nc_ref, g_ref, keys_ref, out_ref):
    i = pl.program_id(0)
    r = pl.program_id(1)

    def body(b, carry):
        @pl.when((r == 0) | (r < nc_ref[i * nb + b]))
        def _():
            kk = keys_ref[b, 0]
            rc = kk.shape[0]
            rank = kk & 255
            sec = kk >> 8
            ranks = jax.lax.broadcasted_iota(jnp.int32, (rc, c), 1)
            sel_r = (ranks == rank[:, None]).astype(jnp.bfloat16)  # (RC, C)
            secs = jax.lax.broadcasted_iota(jnp.int32, (32, rc), 0)
            m32 = (secs == sec[None, :]).astype(jnp.bfloat16)
            g3p = g_ref[b][: 3 * p]  # (3p, RC) rows (split q, channel d)
            h = (g3p[:, None, :] * m32[None, :, :]).reshape(3 * p * 32, rc)
            tmp = jax.lax.dot_general(
                h, sel_r, _DN, preferred_element_type=jnp.float32
            )  # (3p*32, C) rows (q, d, s)
            part = (
                tmp[0 : 32 * p]
                + tmp[32 * p : 64 * p]
                + tmp[64 * p : 96 * p]
            )  # (32p, C) exact split sum

            @pl.when(r == 0)
            def _():
                out_ref[b] = part

            @pl.when(r != 0)
            def _():
                out_ref[b] += part

        return carry

    jax.lax.fori_loop(0, nb, body, 0)


def _vals_select_fwd(v16, keys, nlanes, p):
    """v16: 3x (G, 32p, C) bf16 split planes, rows d*32 + s (sections
    zero-padded); -> (G, ceil8(p), R) rows 0..p-1 exact."""
    hi, mid, lo = v16
    g, _, c = hi.shape
    r = keys.shape[1]
    outr = max(8, -(-p // 8) * 8)
    rc = _pick_rc(r, 4 * 32 * p + 2 * 3 * c + 96)
    nb = _pick_nb(
        g, rc * (4 + 32 * 4) + 32 * p * 3 * c * 2, 32 * p * rc * 4
    )
    nchunks = (nlanes + (rc - 1)) // rc
    v = jnp.concatenate([hi, mid, lo], axis=2)  # (G, 32p, 3C)
    return pl.pallas_call(
        partial(_fwd_kernel_vals, c, p, nb),
        grid=(g // nb, r // rc),
        in_specs=[
            pl.BlockSpec((g,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((nb, 1, rc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((nb, 32 * p, 3 * c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, outr, rc), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((g, outr, r), jnp.float32),
        interpret=_interpret(),
    )(nchunks, keys.reshape(g, 1, r), v)


def _vals_select_bwd(g16, keys, c, nlanes, p):
    """g16 (G, ceil8(3p), R) bf16 rows [hi(p); mid(p); lo(p); pad]; ->
    (G, 32p, C) rows d*32 + s."""
    g, _, r = g16.shape
    gr = g16.shape[1]
    rc = _pick_rc(r, 2 * 3 * p * 32 + 2 * c + 96)
    nb = _pick_nb(
        g,
        rc * (4 + gr * 2) + 32 * p * c * 4,
        3 * p * 32 * rc * 2 + 3 * p * 32 * c * 4,
    )
    nchunks = (nlanes + (rc - 1)) // rc
    return pl.pallas_call(
        partial(_bwd_kernel_vals, c, p, nb),
        grid=(g // nb, r // rc),
        in_specs=[
            pl.BlockSpec((g,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((nb, gr, rc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((nb, 1, rc), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((nb, 32 * p, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, 32 * p, c), jnp.float32),
        interpret=_interpret(),
    )(nchunks, g16, keys.reshape(g, 1, r))


def _vals_fwd_impl(values, keys, atom_of_slot, slot_of_atom, wrapshift):
    grid, g, c, k = _statics(atom_of_slot, keys, wrapshift)
    gx, gy, gz = grid
    a, p = values.shape
    vals_pad = jnp.concatenate([values, jnp.zeros((1, p), values.dtype)])
    valsb = jnp.take(vals_pad, jnp.minimum(atom_of_slot, a), axis=0)
    vals3 = valsb.reshape(gx, gy, gz, c, p)
    sections = [
        jnp.roll(vals3, shift=(-ox, -oy, -oz), axis=(0, 1, 2))
        for ox, oy, oz in _SECTION_OFFSETS
    ]
    cand = jnp.stack(sections, axis=3)  # (gx, gy, gz, 27, C, P)
    candp = cand.reshape(g, 27, c, p).transpose(0, 3, 1, 2)  # (G, P, 27, C)
    if _interpret():
        idx = (keys >> 8) * c + (keys & 255)
        flat = jnp.pad(
            candp.reshape(g, p, 27 * c), ((0, 0), (0, 0), (0, c))
        )
        sel = jnp.take_along_axis(
            flat, jnp.broadcast_to(idx[:, None, :], (g, p, c * k)), axis=2
        )  # (G, P, R)
    else:
        vals_a = jnp.pad(
            candp, ((0, 0), (0, 0), (0, 5), (0, 0))
        ).reshape(g, 32 * p, c)
        nlanes = _occupied_lanes(atom_of_slot, a, g, c, k)
        out = _vals_select_fwd(_split3(vals_a), keys, nlanes, p)
        sel = out[:, :p, :]  # (G, P, R)
    per_slot = sel.reshape(g, p, c, k).transpose(0, 2, 3, 1).reshape(
        g * c, k * p
    )
    safe = jnp.where(slot_of_atom >= 0, slot_of_atom, 0)
    lane = jnp.take(per_slot, safe, axis=0).reshape(a, k, p)
    return jnp.where((slot_of_atom >= 0)[:, None, None], lane, 0.0)


def _vals_bwd_impl(g_out, keys, atom_of_slot, slot_of_atom, wrapshift):
    grid, g, c, k = _statics(atom_of_slot, keys, wrapshift)
    gx, gy, gz = grid
    a, _, p = g_out.shape
    g_pad = jnp.concatenate(
        [g_out.reshape(a, k * p), jnp.zeros((1, k * p), g_out.dtype)]
    )
    g_slot = jnp.take(g_pad, jnp.minimum(atom_of_slot, a), axis=0)
    g_rows = (
        g_slot.reshape(g, c, k, p).transpose(0, 3, 1, 2).reshape(g, p, c * k)
    )
    if _interpret():
        idx = (keys >> 8) * c + (keys & 255)
        d_flat = jnp.zeros((g, p, 27 * c + c), g_out.dtype)
        d_flat = d_flat.at[
            jnp.arange(g)[:, None, None],
            jnp.arange(p)[None, :, None],
            idx[:, None, :],
        ].add(g_rows)
        d3 = d_flat[:, :, : 27 * c].reshape(g, p, 27, c)
    else:
        hi, mid, lo = _split3(g_rows)
        gr = max(8, -(-3 * p // 8) * 8)
        g16 = jnp.pad(
            jnp.concatenate([hi, mid, lo], axis=1),
            ((0, 0), (0, gr - 3 * p), (0, 0)),
        )
        nlanes = _occupied_lanes(atom_of_slot, a, g, c, k)
        d_cand = _vals_select_bwd(g16, keys, c, nlanes, p)  # (G, 32p, C)
        d3 = d_cand.reshape(g, p, 32, c)[:, :, :27]  # (G, P, 27, C)
    d3 = d3.transpose(0, 2, 3, 1).reshape(gx, gy, gz, 27, c, p)
    acc = jnp.zeros((gx, gy, gz, c, p), g_out.dtype)
    for oi, (ox, oy, oz) in enumerate(_SECTION_OFFSETS):
        acc = acc + jnp.roll(
            d3[:, :, :, oi], shift=(ox, oy, oz), axis=(0, 1, 2)
        )
    d_valsb = acc.reshape(g * c, p)
    d_pad = jnp.concatenate([d_valsb, jnp.zeros((1, p), g_out.dtype)])
    safe = jnp.where(slot_of_atom >= 0, slot_of_atom, g * c)
    return jnp.take(d_pad, safe, axis=0)


@jax.custom_vjp
def bucket_lane_values(values, keys, atom_of_slot, slot_of_atom, wrapshift):
    """Exact per-lane selection of runtime per-atom values: (A, P) ->
    (A, K, P) with out[i, k] = values[idx[i, k]], as factored one-hot MXU
    contractions; backward is the transposed contraction (no scatter).
    Masked/sentinel lanes return 0; callers mask anyway."""
    return _vals_fwd_impl(values, keys, atom_of_slot, slot_of_atom, wrapshift)


def _vals_vjp_fwd(values, keys, atom_of_slot, slot_of_atom, wrapshift):
    out = _vals_fwd_impl(values, keys, atom_of_slot, slot_of_atom, wrapshift)
    return out, (keys, atom_of_slot, slot_of_atom, wrapshift)


def _vals_vjp_bwd(res, g_out):
    keys, atom_of_slot, slot_of_atom, wrapshift = res
    d_values = _vals_bwd_impl(
        g_out, keys, atom_of_slot, slot_of_atom, wrapshift
    )
    return d_values, None, None, None, None


bucket_lane_values.defvjp(_vals_vjp_fwd, _vals_vjp_bwd)


def select_lane_values(values: Array, neighbors) -> Array:
    """values[neighbors.idx] for runtime per-atom values, scatter-free when
    the table carries bucket selection tables (``Neighbors.select_tables``,
    attached by the MD driver); plain gather otherwise.

    ``values``: (A,) or (A, P).  Returns (A, K) or (A, K, P).
    """
    tables = getattr(neighbors, "select_tables", None)
    if tables is None:
        return jnp.take(values, neighbors.idx, axis=0)
    squeeze = values.ndim == 1
    v = values[:, None] if squeeze else values
    out = bucket_lane_values(
        v,
        tables.keys,
        tables.atom_of_slot,
        tables.slot_of_atom,
        tables.wrapshift,
    )
    return out[..., 0] if squeeze else out


# ---------------------------------------------------------------------------
# full refresh forward/backward around the kernels
# ---------------------------------------------------------------------------


def _statics(atom_of_slot, keys, wrapshift):
    gx, gy, gz = wrapshift.shape[:3]
    g = gx * gy * gz
    c = atom_of_slot.shape[0] // g
    k = keys.shape[1] // c
    return (gx, gy, gz), g, c, k


def _cand_table(canon, atom_of_slot, wrapshift, grid, c):
    """(G, 27, C, 3) per-bucket candidate positions (27 static rolls of the
    slot table + constant section shifts; the only gather is G*C rows)."""
    gx, gy, gz = grid
    g = gx * gy * gz
    a = canon.shape[0]
    canon_pad = jnp.concatenate([canon, jnp.zeros((1, 3), canon.dtype)])
    posb = jnp.take(canon_pad, jnp.minimum(atom_of_slot, a), axis=0)
    posb3 = posb.reshape(gx, gy, gz, c, 3)
    sections = [
        jnp.roll(posb3, shift=(-ox, -oy, -oz), axis=(0, 1, 2))
        for ox, oy, oz in _SECTION_OFFSETS
    ]
    cand = jnp.stack(sections, axis=3)  # (gx, gy, gz, 27, C, 3)
    return cand.reshape(g, 27, c, 3) + wrapshift.reshape(g, 27, 1, 3)


def _ref_select_fwd(cand3, keys):
    """Non-TPU reference for `_bucket_select_fwd` (padded to the same (G, 8,
    R) layout; input (G, 3, 27, C)): per-lane joint selection as a plain
    gather — fast on CPU, where interpret-mode Pallas would loop the grid in
    Python."""
    g, _, _, c = cand3.shape
    idx = (keys >> 8) * c + (keys & 255)  # (G, R) in [0, 27c) or sentinel
    flat = jnp.pad(cand3.reshape(g, 3, 27 * c), ((0, 0), (0, 0), (0, c)))
    sel = jnp.take_along_axis(flat, idx[:, None, :], axis=2)  # (G, 3, R)
    return jnp.pad(sel, ((0, 0), (0, 5), (0, 0)))


def _ref_select_bwd(g_rows, keys, c):
    """Non-TPU reference for `_bucket_select_bwd` ((G, 3, 27, C) output)."""
    g, _, r = g_rows.shape
    idx = (keys >> 8) * c + (keys & 255)
    d_flat = jnp.zeros((g, 3, 27 * c + c), g_rows.dtype)
    d_flat = d_flat.at[
        jnp.arange(g)[:, None, None],
        jnp.arange(3)[None, :, None],
        idx[:, None, :],
    ].add(g_rows[:, :3])
    return d_flat[:, :, : 27 * c].reshape(g, 3, 27, c)


def _occupied_lanes(atom_of_slot, a, g, c, k):
    """(G,) int32 occupied-lane count per bucket: occupied slots are each
    bucket's prefix, so lanes >= count*K are all-sentinel."""
    occ = (atom_of_slot < a).reshape(g, c).sum(axis=1, dtype=jnp.int32)
    return occ * k


def _fwd_impl(canon, keys, atom_of_slot, slot_of_atom, wrapshift):
    grid, g, c, k = _statics(atom_of_slot, keys, wrapshift)
    a = canon.shape[0]
    cand = _cand_table(canon, atom_of_slot, wrapshift, grid, c)
    cand3 = cand.transpose(0, 3, 1, 2)  # (G, 3, 27, C)
    if _interpret():
        out = _ref_select_fwd(cand3, keys)
    else:
        cand_a = jnp.pad(
            cand3, ((0, 0), (0, 0), (0, 5), (0, 0))
        ).reshape(g, 96, c)  # rows d*32 + s, zero pad rows
        nlanes = _occupied_lanes(atom_of_slot, a, g, c, k)
        out = _bucket_select_fwd(_split3(cand_a), keys, nlanes)  # (G, 8, C*K)
    sel3 = out[:, :3, :].reshape(g, 3, c, k)
    nbr_slot = sel3.transpose(0, 2, 3, 1).reshape(g * c, k * 3)
    safe = jnp.where(slot_of_atom >= 0, slot_of_atom, 0)
    nbr = jnp.take(nbr_slot, safe, axis=0).reshape(a, k, 3)
    return jnp.where((slot_of_atom >= 0)[:, None, None], nbr, 0.0)


def _bwd_impl(g_out, keys, atom_of_slot, slot_of_atom, wrapshift):
    grid, g, c, k = _statics(atom_of_slot, keys, wrapshift)
    gx, gy, gz = grid
    a = g_out.shape[0]

    # atom-order cotangents -> slot-row layout (G*C wide-row gather)
    g_pad = jnp.concatenate(
        [g_out.reshape(a, k * 3), jnp.zeros((1, k * 3), g_out.dtype)]
    )
    g_slot = jnp.take(g_pad, jnp.minimum(atom_of_slot, a), axis=0)
    g_rows = (
        g_slot.reshape(g, c, k, 3).transpose(0, 3, 1, 2).reshape(g, 3, c * k)
    )
    if _interpret():
        d3 = _ref_select_bwd(g_rows, keys, c)  # (G, 3, 27, C)
    else:
        hi, mid, lo = _split3(g_rows)
        g16 = jnp.pad(
            jnp.concatenate([hi, mid, lo], axis=1), ((0, 0), (0, 7), (0, 0))
        )  # (G, 16, C*K) bf16
        nlanes = _occupied_lanes(atom_of_slot, a, g, c, k)
        d_cand = _bucket_select_bwd(
            g16, keys, c, nlanes
        )  # (G, 96, C) rows d*32+s
        d3 = d_cand.reshape(g, 3, 32, c)[:, :, :27]  # (G, 3, 27, C)
    d3 = d3.transpose(0, 2, 3, 1).reshape(gx, gy, gz, 27, c, 3)
    acc = jnp.zeros((gx, gy, gz, c, 3), g_out.dtype)
    for oi, (ox, oy, oz) in enumerate(_SECTION_OFFSETS):
        acc = acc + jnp.roll(
            d3[:, :, :, oi], shift=(ox, oy, oz), axis=(0, 1, 2)
        )
    d_posb = acc.reshape(g * c, 3)
    d_pad = jnp.concatenate([d_posb, jnp.zeros((1, 3), g_out.dtype)])
    safe = jnp.where(slot_of_atom >= 0, slot_of_atom, g * c)
    return jnp.take(d_pad, safe, axis=0)


def _select_rows_fwd_impl(cand3, keys, nlanes):
    g, _, _, c = cand3.shape
    k = keys.shape[1] // c
    if _interpret():
        out = _ref_select_fwd(cand3, keys)
    else:
        cand_a = jnp.pad(
            cand3, ((0, 0), (0, 0), (0, 5), (0, 0))
        ).reshape(g, 96, c)
        out = _bucket_select_fwd(_split3(cand_a), keys, nlanes)
    sel3 = out[:, :3, :].reshape(g, 3, c, k)
    return sel3.transpose(0, 2, 3, 1).reshape(g * c, k * 3)


def _select_rows_bwd_impl(g_rows, keys, nlanes, c):
    g = keys.shape[0]
    k = keys.shape[1] // c
    g_b = (
        g_rows.reshape(g, c, k, 3).transpose(0, 3, 1, 2).reshape(g, 3, c * k)
    )
    if _interpret():
        d3 = _ref_select_bwd(g_b, keys, c)
    else:
        hi, mid, lo = _split3(g_b)
        g16 = jnp.pad(
            jnp.concatenate([hi, mid, lo], axis=1), ((0, 0), (0, 7), (0, 0))
        )
        d_cand = _bucket_select_bwd(g16, keys, c, nlanes)
        d3 = d_cand.reshape(g, 3, 32, c)[:, :, :27]
    return d3


@jax.custom_vjp
def select_slot_rows(cand3, keys, nlanes):
    """Per-slot-row neighbor positions from a PREBUILT candidate table.

    The shard-local core of `bucket_nbr_pos` for domain-decomposed MD
    (``parallel/md.py``): ``cand3`` is the (G_local, 3, 27, C) candidate
    block of this shard's buckets (built outside, where the 27 rolls can
    cross shard boundaries under the partitioner), ``keys`` its
    (G_local, C*K) lane keys, ``nlanes`` the per-bucket occupied-lane
    bound.  Returns ``(G_local*C, K*3)`` f32 rows (slot-row order);
    backward is the transposed contraction through the same Pallas pair
    as `bucket_nbr_pos` — no scatter.
    """
    return _select_rows_fwd_impl(cand3, keys, nlanes)


def _select_rows_vjp_fwd(cand3, keys, nlanes):
    return _select_rows_fwd_impl(cand3, keys, nlanes), (
        keys, nlanes, cand3.shape[3],
    )


def _select_rows_vjp_bwd(res, g_rows):
    keys, nlanes, c = res
    return _select_rows_bwd_impl(g_rows, keys, nlanes, c), None, None


select_slot_rows.defvjp(_select_rows_vjp_fwd, _select_rows_vjp_bwd)


@jax.custom_vjp
def slot_positions(canon, atom_of_slot, slot_of_atom):
    """``canon[atom_of_slot]`` (G*C, 3) with a GATHER transpose.

    The slot<->atom map is a bijection on occupied slots, so the
    cotangent of the slot table routes back to atoms as
    ``d_posb[slot_of_atom]`` — a row gather, not the scatter-add XLA
    would emit for a plain ``take`` transpose."""
    a = canon.shape[0]
    canon_pad = jnp.concatenate([canon, jnp.zeros((1, 3), canon.dtype)])
    return jnp.take(canon_pad, jnp.minimum(atom_of_slot, a), axis=0)


def _slot_pos_vjp_fwd(canon, atom_of_slot, slot_of_atom):
    return slot_positions(canon, atom_of_slot, slot_of_atom), (
        slot_of_atom, canon.shape[0],
    )


def _slot_pos_vjp_bwd(res, g_posb):
    slot_of_atom, a = res
    safe = jnp.where(slot_of_atom >= 0, slot_of_atom, 0)
    d = jnp.take(g_posb, safe, axis=0)
    return jnp.where((slot_of_atom >= 0)[:, None], d, 0.0), None, None


slot_positions.defvjp(_slot_pos_vjp_fwd, _slot_pos_vjp_bwd)


def cand_table_from_slots(posb, wrapshift, grid, c):
    """(G, 3, 27, C) candidate block from a slot-position table (the roll
    half of `_cand_table`, taking ``posb`` explicitly so its canon gather
    can carry `slot_positions`' gather-transpose)."""
    gx, gy, gz = grid
    g = gx * gy * gz
    posb3 = posb.reshape(gx, gy, gz, c, 3)
    sections = [
        jnp.roll(posb3, shift=(-ox, -oy, -oz), axis=(0, 1, 2))
        for ox, oy, oz in _SECTION_OFFSETS
    ]
    cand = jnp.stack(sections, axis=3).reshape(g, 27, c, 3)
    cand = cand + wrapshift.reshape(g, 27, 1, 3)
    return cand.transpose(0, 3, 1, 2)


@jax.custom_vjp
def bucket_nbr_pos(canon, keys, atom_of_slot, slot_of_atom, wrapshift):
    """Per-lane neighbor positions ``canon[j] + image_shift`` (A, K, 3) as an
    exact MXU one-hot contraction; backward is the transposed contraction
    (no scatter, no partner map).  ``canon`` must be canonical coordinates
    (see module docstring); masked/overflowed lanes return garbage that the
    caller masks out."""
    return _fwd_impl(canon, keys, atom_of_slot, slot_of_atom, wrapshift)


def _vjp_fwd(canon, keys, atom_of_slot, slot_of_atom, wrapshift):
    out = _fwd_impl(canon, keys, atom_of_slot, slot_of_atom, wrapshift)
    return out, (keys, atom_of_slot, slot_of_atom, wrapshift)


def _vjp_bwd(res, g_out):
    keys, atom_of_slot, slot_of_atom, wrapshift = res
    d_canon = _bwd_impl(g_out, keys, atom_of_slot, slot_of_atom, wrapshift)
    return d_canon, None, None, None, None


bucket_nbr_pos.defvjp(_vjp_fwd, _vjp_bwd)
