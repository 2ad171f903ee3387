"""Atom-packed bucket-dot refresh: the slot-row kernels without slot padding.

Same math as `bucket_refresh` (exact f32 one-hot selection of neighbor
positions from bucket-local candidate tables, MXU forward, transposed
contraction backward), but rows are ATOMS sorted by bucket instead of
`(bucket, slot)` grid cells: in the water-box regime the slot layout runs
`G*C ~ 2.2x A` rows, so ~55% of every kernel MAC selects from sentinel
keys into zero pad rows.  Packing rows by atom removes that (design &
accounting: ``docs/design_bucketdot_packed.md``).

Layout:

- Atoms ordered by (bucket, rank); each bucket's run padded to a multiple
  of 8 rows (sublane tiles never straddle buckets), lanes padded
  ``K -> KL`` (next 128 multiple) so rows start on lane-tile boundaries.
- Buckets grouped into *spans* of ``SB`` consecutive buckets with a static
  per-span row capacity ``S_cap`` (measured at MD init, like the existing
  capacity auto-tunes; overflow is flagged).
- The kernel grid is one step per span; an in-kernel ``fori_loop`` walks
  the span's 8-row tiles, reading each tile's bucket id from an SMEM map
  and its candidate plane by dynamic leading-axis index.

Reference analog: cuAEV's per-atom padded neighbor buffers
(``aev.cu:181-321``) are also atom-rows, not grid-cell rows.
"""

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchani_tpu.annotations import Array
from torchani_tpu.bucket_refresh import (
    _SECTION_OFFSETS,
    _SENTINEL,
    _cand_table,
    _interpret,
    _split3,
    BucketTables,
)

__all__ = ["PackedTables", "choose_span", "pack_tables", "packed_nbr_pos"]

_DN = (((1,), (0,)), ((), ()))

#: test hook: force the Pallas-kernel branch of `_fwd_impl`/`_bwd_impl` even
#: off-TPU (the kernels then run in interpret mode) so the reshape glue
#: around the kernels is exercised without hardware.
_FORCE_KERNEL = False


class PackedTables(struct.PyTreeNode):
    """Rebuild-time tables for the atom-packed refresh.

    Statics are recoverable from shapes: ``n_spans`` and ``S_cap*KL`` from
    ``keys_flat``, ``n_tiles`` (so ``S_cap = 8 * n_tiles`` and ``KL``)
    from ``tile_bucket``, the grid from ``wrapshift``, ``C`` from
    ``atom_of_slot`` vs the grid, ``SB = G / n_spans``.
    """

    keys_flat: Array  # (n_spans, 1, S_cap*KL) int32, row-major (row, lane)
    tile_bucket: Array  # (n_spans, S_cap//8) int32 local bucket per tile
    atom_of_row: Array  # (n_spans*S_cap,) int32, sentinel = A
    row_of_atom: Array  # (A,) int32, -1 invalid
    atom_of_slot: Array  # (G*C,) int32 (candidate-table build), sentinel = A
    slot_of_atom: Array  # (A,) int32, -1 invalid (backward scatter target)
    wrap_offset: Array  # (A, 3) f32 frozen: canon = coords - wrap_offset
    wrapshift: Array  # (gx, gy, gz, 27, 3) f32


def choose_span(
    grid_shape: tp.Tuple[int, int, int],
    bucket_counts,  # (G,) host per-bucket occupancy (e.g. np.bincount)
    c: int,
    kl: int = 128,  # padded lane count (next 128-multiple of K)
    vmem_budget: int = 10 * 2**20,
) -> tp.Tuple[int, int]:
    """Host-side static ``(sb, s_cap)`` choice at MD init.

    ``sb`` (buckets per span) must divide G and every per-step kernel block
    must fit the VMEM budget with double buffering — both the candidate
    plane ``(sb*288, C)`` AND the lane-wide blocks that scale with
    ``s_cap*KL`` (keys, the (8, s_cap*KL) f32 output, the (16, s_cap*KL)
    bf16 cotangent).  Among the fits, pick the span minimizing total kernel
    rows ``n_spans * s_cap`` (the MAC count is proportional), tie-breaking
    toward larger spans (fewer grid steps).  ``s_cap`` covers the measured
    per-span 8-padded occupancy with the same ~8% + const margin as the
    other capacity auto-tunes.
    """
    import numpy as np

    g = int(np.prod(grid_shape))
    counts = np.asarray(bucket_counts, np.int64)
    if counts.shape != (g,):
        raise ValueError(f"bucket_counts must be shape ({g},)")
    padded = ((counts + 7) // 8) * 8
    best = None
    for sb in range(1, g + 1):
        if g % sb:
            continue
        spans = padded.reshape(g // sb, sb).sum(axis=1)
        need = int(spans.max())
        s_cap = max(8, -(-int(need * 1.08 + 8) // 8) * 8)
        lanes = s_cap * kl
        fwd_bytes = lanes * 4 + sb * 288 * c * 2 + 8 * lanes * 4
        bwd_bytes = 16 * lanes * 2 + lanes * 4 + sb * 96 * c * 4
        if 2 * max(fwd_bytes, bwd_bytes) > vmem_budget:
            continue
        cost = (g // sb) * s_cap
        if best is None or cost < best[0] or (cost == best[0] and sb > best[1]):
            best = (cost, sb, s_cap)
    if best is None:
        raise ValueError(f"no span size sb fits VMEM budget at c={c}")
    return best[1], best[2]


def pack_tables(
    tables: BucketTables, sb: int, s_cap: int
) -> tp.Tuple[PackedTables, Array]:
    """Repack slot-row `BucketTables` into the atom-packed layout (traced;
    runs at each Verlet rebuild).  Returns ``(packed, overflow)`` where
    overflow means some span's 8-padded occupancy exceeded ``s_cap``."""
    gx, gy, gz = tables.wrapshift.shape[:3]
    g = gx * gy * gz
    c = tables.atom_of_slot.shape[0] // g
    k = tables.keys.shape[1] // c
    a = tables.slot_of_atom.shape[0]
    kl = -(-k // 128) * 128
    if g % sb or s_cap % 8:
        raise ValueError(f"sb={sb} must divide G={g}; s_cap={s_cap} % 8 == 0")
    ns = g // sb
    n_rows = ns * s_cap

    occ = jnp.sum(
        (tables.atom_of_slot < a).reshape(g, c), axis=1
    ).astype(jnp.int32)
    padded = ((occ + 7) // 8) * 8
    padded_sp = padded.reshape(ns, sb)
    csum = jnp.cumsum(padded_sp, axis=1) - padded_sp  # exclusive
    overflow = jnp.any(csum[:, -1] + padded_sp[:, -1] > s_cap)
    row_base = (
        jnp.arange(ns, dtype=jnp.int32)[:, None] * s_cap + csum
    ).reshape(g)

    slot = tables.slot_of_atom  # (A,) bucket*c + rank, -1 invalid
    row_of_atom = jnp.where(
        slot >= 0, jnp.take(row_base, jnp.maximum(slot, 0) // c) + slot % c, -1
    ).astype(jnp.int32)
    # Under overflow a span's rows can run past s_cap INTO THE NEXT SPAN's
    # valid row range, where they would collide with that span's atoms in
    # the atom_of_row scatter and corrupt a non-overflowing span.  Reject
    # any row outside its own span (the flag is set either way).
    span_of_atom = jnp.where(slot >= 0, (slot // c) // sb, -1)
    row_ok = (
        (row_of_atom >= 0)
        & (row_of_atom < n_rows)
        & (row_of_atom // s_cap == span_of_atom)
    )
    atom_of_row = (
        jnp.full((n_rows + 1,), a, jnp.int32)
        .at[jnp.where(row_ok, row_of_atom, n_rows)]
        .set(jnp.arange(a, dtype=jnp.int32), mode="drop")[:n_rows]
    )
    row_of_atom = jnp.where(row_ok, row_of_atom, -1)

    # per-row lane keys: one wide-row gather from the slot-row layout
    slot_pad = jnp.concatenate([slot, jnp.full((1,), -1, jnp.int32)])
    slot_of_row = jnp.take(slot_pad, jnp.minimum(atom_of_row, a))
    keys_slot = tables.keys.reshape(g * c, k)
    keys_row = jnp.where(
        (slot_of_row >= 0)[:, None],
        jnp.take(keys_slot, jnp.maximum(slot_of_row, 0), axis=0),
        _SENTINEL,
    )
    keys_row = jnp.pad(
        keys_row, ((0, 0), (0, kl - k)), constant_values=_SENTINEL
    )
    keys_flat = keys_row.reshape(ns, 1, s_cap * kl)

    # tile -> local bucket: scatter each non-empty bucket's local id at its
    # run start, cummax within the span (runs are 8-aligned, so a tile
    # never straddles buckets; pad tiles carry the previous id harmlessly)
    local_id = jnp.tile(jnp.arange(sb, dtype=jnp.int32), ns)
    pos = jnp.where(padded > 0, row_base, n_rows)
    marks = (
        jnp.zeros((n_rows + 1,), jnp.int32)
        .at[pos]
        .max(local_id, mode="drop")[:n_rows]
    )
    bucket_of_row = jax.lax.cummax(marks.reshape(ns, s_cap), axis=1)
    tile_bucket = bucket_of_row[:, ::8]

    packed = PackedTables(
        keys_flat=keys_flat,
        tile_bucket=tile_bucket,
        atom_of_row=atom_of_row,
        row_of_atom=row_of_atom,
        atom_of_slot=tables.atom_of_slot,
        slot_of_atom=tables.slot_of_atom,
        wrap_offset=tables.wrap_offset,
        wrapshift=tables.wrapshift,
    )
    return packed, overflow


# ---------------------------------------------------------------------------
# Pallas kernels (grid = spans; fori_loop over 8-row tiles)
# ---------------------------------------------------------------------------


def _pfwd_kernel(c, n_tiles, tl, tiles_ref, keys_ref, v_ref, out_ref):
    # tiles_ref is the FULL (n_spans, n_tiles) SMEM table (a partial block
    # would violate Mosaic's (8, 128)-divisible-block rule; the whole table
    # is a few KB and stays SMEM-resident)
    span = pl.program_id(0)

    def body(t, carry):
        b = tiles_ref[span, t]  # local bucket of this tile (SMEM scalar)
        kk = keys_ref[0, 0, pl.ds(t * tl, tl)]  # (TL,) int32
        rank = kk & 255
        sec = kk >> 8  # 27 = sentinel -> hits the zero pad row
        ranks = jax.lax.broadcasted_iota(jnp.int32, (c, tl), 0)
        sel_r = (ranks == rank[None, :]).astype(jnp.bfloat16)  # (C, TL)
        # same body as bucket_refresh._fwd_kernel at tile width TL; the
        # candidate plane is picked per tile by data-dependent leading
        # index instead of the loop var
        tmp = jax.lax.dot_general(
            v_ref[b], sel_r, _DN, preferred_element_type=jnp.float32
        )  # (288, TL)
        ts = tmp[0:96] + tmp[96:192] + tmp[192:288]  # exact split sum
        secs = jax.lax.broadcasted_iota(jnp.int32, (32, tl), 0)
        m32 = (secs == sec[None, :]).astype(jnp.float32)
        res = jnp.concatenate(
            [
                jnp.sum(ts[32 * d : 32 * d + 32] * m32, axis=0, keepdims=True)
                for d in range(3)
            ]
            + [jnp.zeros((5, tl), jnp.float32)],
            axis=0,
        )  # (8, TL)
        out_ref[0, :, pl.ds(t * tl, tl)] = res
        return carry

    jax.lax.fori_loop(0, n_tiles, body, 0)


def _pbwd_kernel(c, n_tiles, tl, tiles_ref, g16_ref, keys_ref, out_ref):
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    span = pl.program_id(0)

    def body(t, carry):
        b = tiles_ref[span, t]
        kk = keys_ref[0, 0, pl.ds(t * tl, tl)]
        rank = kk & 255
        sec = kk >> 8
        ranks = jax.lax.broadcasted_iota(jnp.int32, (tl, c), 1)
        sel_r = (ranks == rank[:, None]).astype(jnp.bfloat16)  # (TL, C)
        secs = jax.lax.broadcasted_iota(jnp.int32, (32, tl), 0)
        m32 = (secs == sec[None, :]).astype(jnp.bfloat16)
        gb = g16_ref[0, :, pl.ds(t * tl, tl)]  # (16, TL) bf16 split rows
        h = jnp.concatenate(
            [m32 * gb[3 * p + d][None, :] for p in range(3) for d in range(3)],
            axis=0,
        )  # (288, TL) rows p*96 + d*32 + s
        tmp = jax.lax.dot_general(
            h, sel_r, _DN, preferred_element_type=jnp.float32
        )  # (288, C)
        part = tmp[0:96] + tmp[96:192] + tmp[192:288]  # (96, C) exact p-sum
        out_ref[b] += part
        return carry

    jax.lax.fori_loop(0, n_tiles, body, 0)


def _packed_select_fwd(cand16, keys_flat: Array, tile_bucket: Array) -> Array:
    """cand16: 3x (G, 96, C) bf16 split planes (rows d*32 + s, sections
    zero-padded 27 -> 32) -> (n_spans, 8, S_cap*KL) f32 selections."""
    hi, mid, lo = cand16
    g, _, c = hi.shape
    ns, n_tiles = tile_bucket.shape
    lanes = keys_flat.shape[2]
    kl = lanes // (8 * n_tiles)
    tl = 8 * kl
    sb = g // ns
    v = jnp.concatenate([hi, mid, lo], axis=1)  # (G, 288, C)
    return pl.pallas_call(
        partial(_pfwd_kernel, c, n_tiles, tl),
        grid=(ns,),
        in_specs=[
            pl.BlockSpec(
                (ns, n_tiles), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0)),
            pl.BlockSpec((sb, 288, c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, lanes), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((ns, 8, lanes), jnp.float32),
        interpret=_interpret(),
    )(tile_bucket, keys_flat, v)


def _packed_select_bwd(
    g16: Array, keys_flat: Array, tile_bucket: Array, c: int, g: int
) -> Array:
    """g16 (n_spans, 16, S_cap*KL) bf16 split rows [hi(3); mid(3); lo(3);
    pad] -> (G, 96, C) f32 transposed contraction (rows d*32 + s; sentinel
    lanes land in the discarded pad rows s in [27, 32))."""
    ns, _, lanes = g16.shape
    n_tiles = tile_bucket.shape[1]
    kl = lanes // (8 * n_tiles)
    tl = 8 * kl
    return pl.pallas_call(
        partial(_pbwd_kernel, c, n_tiles, tl),
        grid=(ns,),
        in_specs=[
            pl.BlockSpec(
                (ns, n_tiles), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 16, lanes), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g // ns, 96, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, 96, c), jnp.float32),
        interpret=_interpret(),
    )(tile_bucket, g16, keys_flat)


# ---------------------------------------------------------------------------
# full refresh forward/backward around the kernels
# ---------------------------------------------------------------------------


def _statics(pt: PackedTables):
    gx, gy, gz = pt.wrapshift.shape[:3]
    g = gx * gy * gz
    c = pt.atom_of_slot.shape[0] // g
    ns, n_tiles = pt.tile_bucket.shape
    s_cap = 8 * n_tiles
    kl = pt.keys_flat.shape[2] // s_cap
    return (gx, gy, gz), g, c, ns, s_cap, kl


def _global_bucket_of_row(pt, ns, sb, s_cap):
    """(n_spans, S_cap) global bucket per row (interpret path only)."""
    local = jnp.repeat(pt.tile_bucket, 8, axis=1)  # (ns, s_cap)
    return local + jnp.arange(ns, dtype=jnp.int32)[:, None] * sb


def _fwd_impl(canon, pt: PackedTables):
    grid, g, c, ns, s_cap, kl = _statics(pt)
    sb = g // ns
    a = canon.shape[0]
    cand = _cand_table(canon, pt.atom_of_slot, pt.wrapshift, grid, c)
    cand3 = cand.transpose(0, 3, 1, 2)  # (G, 3, 27, C)
    if _interpret() and not _FORCE_KERNEL:
        # CPU reference: per-lane joint selection as a plain gather
        flat = jnp.concatenate(
            [
                cand3.transpose(0, 2, 3, 1).reshape(g * 27 * c, 3),
                jnp.zeros((1, 3), canon.dtype),
            ]
        )
        keys = pt.keys_flat.reshape(ns, s_cap, kl)
        sec, rank = keys >> 8, keys & 255
        gb = _global_bucket_of_row(pt, ns, sb, s_cap)  # (ns, s_cap)
        idx = jnp.where(
            sec < 27, gb[:, :, None] * (27 * c) + sec * c + rank, g * 27 * c
        )
        sel = jnp.take(flat, idx, axis=0)  # (ns, s_cap, kl, 3)
    else:
        cand_a = jnp.pad(cand3, ((0, 0), (0, 0), (0, 5), (0, 0))).reshape(
            g, 96, c
        )
        out = _packed_select_fwd(
            _split3(cand_a), pt.keys_flat, pt.tile_bucket
        )  # (ns, 8, s_cap*kl)
        sel = (
            out[:, :3, :].reshape(ns, 3, s_cap, kl).transpose(0, 2, 3, 1)
        )  # (ns, s_cap, kl, 3)
    rows = sel.reshape(ns * s_cap, kl * 3)
    safe = jnp.where(pt.row_of_atom >= 0, pt.row_of_atom, 0)
    nbr = jnp.take(rows, safe, axis=0).reshape(a, kl, 3)
    return jnp.where((pt.row_of_atom >= 0)[:, None, None], nbr, 0.0)


def _bwd_impl(g_out, pt: PackedTables):
    grid, g, c, ns, s_cap, kl = _statics(pt)
    gx, gy, gz = grid
    sb = g // ns
    a = g_out.shape[0]

    # atom-order cotangents -> packed row layout (wide-row gather)
    g_pad = jnp.concatenate(
        [g_out.reshape(a, kl * 3), jnp.zeros((1, kl * 3), g_out.dtype)]
    )
    g_rows = jnp.take(g_pad, jnp.minimum(pt.atom_of_row, a), axis=0)
    g3 = g_rows.reshape(ns, s_cap, kl, 3)
    if _interpret() and not _FORCE_KERNEL:
        keys = pt.keys_flat.reshape(ns, s_cap, kl)
        sec, rank = keys >> 8, keys & 255
        gb = _global_bucket_of_row(pt, ns, sb, s_cap)
        idx = jnp.where(
            sec < 27, gb[:, :, None] * (27 * c) + sec * c + rank, g * 27 * c
        )
        d_flat = jnp.zeros((g * 27 * c + 1, 3), g_out.dtype)
        d_flat = d_flat.at[idx.reshape(-1)].add(g3.reshape(-1, 3))
        d3 = (
            d_flat[: g * 27 * c]
            .reshape(g, 27, c, 3)
            .transpose(0, 3, 1, 2)
        )  # (G, 3, 27, C)
    else:
        lanes = g3.transpose(0, 3, 1, 2).reshape(ns, 3, s_cap * kl)
        hi, mid, lo = _split3(lanes)
        g16 = jnp.pad(
            jnp.concatenate([hi, mid, lo], axis=1), ((0, 0), (0, 7), (0, 0))
        )  # (ns, 16, s_cap*kl) bf16
        d_cand = _packed_select_bwd(
            g16, pt.keys_flat, pt.tile_bucket, c, g
        )  # (G, 96, C)
        d3 = d_cand.reshape(g, 3, 32, c)[:, :, :27]

    # identical tail to bucket_refresh._bwd_impl: un-roll the 27 sections
    # back onto the slot table, then slot -> atom rows
    d3 = d3.transpose(0, 2, 3, 1).reshape(gx, gy, gz, 27, c, 3)
    acc = jnp.zeros((gx, gy, gz, c, 3), g_out.dtype)
    for oi, (ox, oy, oz) in enumerate(_SECTION_OFFSETS):
        acc = acc + jnp.roll(d3[:, :, :, oi], shift=(ox, oy, oz), axis=(0, 1, 2))
    d_posb = acc.reshape(g * c, 3)
    d_pad = jnp.concatenate([d_posb, jnp.zeros((1, 3), g_out.dtype)])
    safe = jnp.where(pt.slot_of_atom >= 0, pt.slot_of_atom, g * c)
    return jnp.take(d_pad, safe, axis=0)


@jax.custom_vjp
def packed_nbr_pos(canon: Array, pt: PackedTables) -> Array:
    """Per-lane neighbor positions ``canon[j] + image_shift`` as an exact
    MXU one-hot contraction over the atom-packed layout; returns
    ``(A, KL, 3)`` (callers slice lanes ``[:, :K]``).  Backward is the
    transposed contraction.  ``canon`` must be canonical coordinates (see
    ``bucket_refresh``); masked/pad lanes return garbage the caller masks."""
    return _fwd_impl(canon, pt)


def _vjp_fwd(canon, pt):
    return _fwd_impl(canon, pt), pt


def _vjp_bwd(pt, g_out):
    return _bwd_impl(g_out, pt), None


packed_nbr_pos.defvjp(_vjp_fwd, _vjp_bwd)
