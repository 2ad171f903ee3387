"""Bucket-dot refresh (md bucket path) parity vs the row-gather path.

The bucket-dot refresh replaces the per-step ``coords[idx]`` neighbor
gather with bucket-local one-hot MXU contractions (bucket_refresh.py);
these tests pin its exactness against the plain gather on real cell-list
topologies, its backward, and the end-to-end MD trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchani_tpu as tt
from torchani_tpu.bucket_refresh import (
    _bucket_select_bwd,
    _bucket_select_fwd,
    _split3,
    build_bucket_tables,
    bucket_nbr_pos,
    make_wrapshift,
    tables_from_cell_aux,
)
from torchani_tpu.md import MolecularDynamics
from torchani_tpu.neighbors import _static_grid_shape, cell_list
from torchani_tpu.testing import make_water_box


def _random_periodic_topology(seed, a=60, box=12.0, cutoff=5.2):
    rng = np.random.RandomState(seed)
    coords = jnp.asarray(rng.rand(a, 3).astype(np.float32) * box)
    # drift some atoms outside the box (MD coordinates are unwrapped)
    coords = coords + jnp.asarray(
        (rng.randint(-2, 3, (a, 3)) * box).astype(np.float32)
    )
    cell = jnp.eye(3, dtype=jnp.float32) * box
    elem = jnp.zeros((1, a), jnp.int32)
    nbrs = cell_list(
        cutoff, elem, coords[None], cell, jnp.asarray([True] * 3)
    )
    idx, mask = nbrs.idx[0], nbrs.mask[0]
    nbr_pos_ref = jnp.take(coords, jnp.where(mask, idx, 0), axis=0)
    shift = nbrs.diff[0] - (nbr_pos_ref - coords[:, None, :])
    shift = jnp.where(mask[..., None], shift, 0.0)
    grid = _static_grid_shape(np.asarray(cell), cutoff)
    return coords, cell, grid, idx, mask, shift, nbrs.diff[0]


@pytest.mark.parametrize("seed", [0, 3])
def test_bucket_nbr_pos_matches_gather(seed):
    coords, cell, grid, idx, mask, shift, diff_ref = _random_periodic_topology(
        seed
    )
    a, k = idx.shape
    c = 32
    ws = jnp.asarray(make_wrapshift(grid, np.asarray(cell)))
    tables, overflow = jax.jit(
        lambda *args: build_bucket_tables(*args, grid_shape=grid, c=c, wrapshift=ws)
    )(coords, idx, mask, shift, jnp.ones((a,), bool), cell)
    assert not bool(overflow)
    canon = coords - tables.wrap_offset
    nbr = jax.jit(bucket_nbr_pos)(
        canon, tables.keys, tables.atom_of_slot, tables.slot_of_atom,
        tables.wrapshift,
    )
    diff = jnp.where(mask[..., None], nbr - canon[:, None, :], 0.0)
    err = float(jnp.max(jnp.abs(diff - diff_ref)))
    assert err < 2e-4, err


def test_cell_aux_tables_match_gather():
    """Tables assembled from cell_list's bucket_aux reproduce the cached
    topology's diffs exactly (the fast-rebuild path used by the MD driver)."""
    rng = np.random.RandomState(5)
    a, box, cutoff, c = 120, 16.0, 5.2, 32
    coords = jnp.asarray(rng.rand(a, 3).astype(np.float32) * box)
    coords = coords + jnp.asarray(
        (rng.randint(-2, 3, (a, 3)) * box).astype(np.float32)
    )
    cell = jnp.eye(3, dtype=jnp.float32) * box
    elem = jnp.zeros((1, a), jnp.int32)
    grid = _static_grid_shape(np.asarray(cell), cutoff)
    nbrs, aux = cell_list(
        cutoff, elem, coords[None], cell, jnp.asarray([True] * 3),
        capacity=64, bucket_capacity=c, bucket_aux=True,
    )
    assert not bool(nbrs.overflow)
    idx, mask = nbrs.idx[0], nbrs.mask[0]
    ws = jnp.asarray(make_wrapshift(grid, np.asarray(cell)))
    wrap_offset = coords - aux["central"]
    tables = tables_from_cell_aux(
        aux["keys"], mask, aux["atom_of_slot"], aux["slot_of_atom"],
        wrap_offset, ws, c,
    )
    canon = coords - tables.wrap_offset
    nbr = jax.jit(bucket_nbr_pos)(
        canon, tables.keys, tables.atom_of_slot, tables.slot_of_atom,
        tables.wrapshift,
    )
    diff = jnp.where(mask[..., None], nbr - canon[:, None, :], 0.0)
    err = float(jnp.max(jnp.abs(diff - nbrs.diff[0])))
    assert err < 2e-4, err


def test_bucket_nbr_pos_backward_matches_gather():
    coords, cell, grid, idx, mask, shift, _ = _random_periodic_topology(1)
    a, k = idx.shape
    ws = jnp.asarray(make_wrapshift(grid, np.asarray(cell)))
    tables, overflow = build_bucket_tables(
        coords, idx, mask, shift, jnp.ones((a,), bool), cell,
        grid_shape=grid, c=32, wrapshift=ws,
    )
    assert not bool(overflow)
    w = jnp.asarray(
        np.random.RandomState(7).randn(a, k, 3).astype(np.float32)
    )

    def loss_bucket(crd):
        canon = crd - tables.wrap_offset
        nbr = bucket_nbr_pos(
            canon, tables.keys, tables.atom_of_slot, tables.slot_of_atom,
            tables.wrapshift,
        )
        d = jnp.where(mask[..., None], nbr - canon[:, None, :], 0.0)
        return jnp.sum(w * d)

    def loss_gather(crd):
        nbr = jnp.take(crd, jnp.where(mask, idx, 0), axis=0)
        d = nbr - crd[:, None, :] + shift
        d = jnp.where(mask[..., None], d, 0.0)
        return jnp.sum(w * d)

    gb = jax.jit(jax.grad(loss_bucket))(coords)
    gg = jax.jit(jax.grad(loss_gather))(coords)
    scale = float(jnp.max(jnp.abs(gg))) + 1e-9
    assert float(jnp.max(jnp.abs(gb - gg))) / scale < 1e-5


def test_select_kernels_interpret_exactness():
    """The Pallas selection kernels themselves (forward + transposed
    backward), run in interpret mode at small shapes, against a per-lane
    numpy joint selection.  The CPU execution path of `bucket_nbr_pos`
    bypasses these kernels, so this is the only coverage of the kernel
    bodies off-hardware."""
    g_, c, r = 3, 64, 256
    rng = np.random.RandomState(11)
    cand_np = (rng.randn(g_, 3, 32, c) * 20.0).astype(np.float32)
    cand_np[:, :, 27:] = 0.0  # zero pad rows (sentinel section target)
    cand = jnp.asarray(cand_np.reshape(g_, 96, c))  # rows d*32 + s
    sec = np.where(
        rng.rand(g_, r) < 0.75, rng.randint(0, 27, (g_, r)), 27
    ).astype(np.int32)
    rank = rng.randint(0, c, (g_, r)).astype(np.int32)
    keys = jnp.asarray((sec << 8) | np.where(sec < 27, rank, 0))

    out = jax.jit(lambda v, k: _bucket_select_fwd(_split3(v), k))(cand, keys)
    ref = np.zeros((g_, 3, r), np.float32)
    for gi in range(g_):
        for ri in range(r):
            if sec[gi, ri] < 27:
                ref[gi, :, ri] = cand_np[gi, :, sec[gi, ri], rank[gi, ri]]
    assert float(jnp.max(jnp.abs(out[:, :3] - ref))) == 0.0

    gt = jnp.asarray(rng.randn(g_, 3, r).astype(np.float32))

    def bwd(g3, k):
        hi, mid, lo = _split3(g3)
        g16 = jnp.pad(
            jnp.concatenate([hi, mid, lo], axis=1), ((0, 0), (0, 7), (0, 0))
        )
        return _bucket_select_bwd(g16, k, c)

    dout = jax.jit(bwd)(gt, keys)  # (G, 96, C) rows d*32 + s
    dsum = np.asarray(dout).reshape(g_, 3, 32, c)[:, :, :27]
    dref = np.zeros((g_, 3, 27, c), np.float32)
    # backward sums bf16 split planes of the cotangent: reference must sum
    # the same split values (products with the one-hot are exact)
    hi, mid, lo = (np.asarray(p, np.float32) for p in _split3(gt))
    gsplit = hi + mid + lo
    for gi in range(g_):
        for ri in range(r):
            if sec[gi, ri] < 27:
                dref[gi, :, sec[gi, ri], rank[gi, ri]] += gsplit[gi, :, ri]
    assert float(np.max(np.abs(dsum - dref))) < 1e-6


def test_select_kernels_chunk_skip():
    """Per-bucket occupied-lane bounds: chunks beyond ``nlanes[b]`` are
    skipped.  With prefix-dense keys (sentinels only past the bound, the
    invariant both table builders guarantee), the forward must match the
    unskipped kernel on all occupied-slot rows and the backward must match
    it exactly everywhere."""
    g_, c, r = 3, 64, 512  # r/rc = 512/128 -> up to 4 chunks
    k = r // c
    rng = np.random.RandomState(13)
    cand_np = (rng.randn(g_, 3, 32, c) * 20.0).astype(np.float32)
    cand_np[:, :, 27:] = 0.0
    cand = jnp.asarray(cand_np.reshape(g_, 96, c))
    occ = np.array([2, 64, 0], np.int32)  # occupied slots per bucket
    nlanes = jnp.asarray(occ * k)
    sec = rng.randint(0, 27, (g_, r)).astype(np.int32)
    rank = rng.randint(0, c, (g_, r)).astype(np.int32)
    lane_real = np.arange(r)[None, :] < (occ * k)[:, None]
    sec = np.where(lane_real, sec, 27)
    keys = jnp.asarray((sec << 8) | np.where(sec < 27, rank, 0))

    full = jax.jit(lambda v, kk: _bucket_select_fwd(_split3(v), kk))(
        cand, keys
    )
    skip = jax.jit(
        lambda v, kk, nl: _bucket_select_fwd(_split3(v), kk, nl)
    )(cand, keys, nlanes)
    # compare only occupied slots' lanes (rows past the bound are unwritten)
    m = jnp.asarray(lane_real)[:, None, :]
    assert float(jnp.max(jnp.abs(jnp.where(m, skip - full, 0.0)))) == 0.0

    gt = jnp.asarray(rng.randn(g_, 3, r).astype(np.float32))

    def bwd(g3, kk, nl):
        hi, mid, lo = _split3(g3)
        g16 = jnp.pad(
            jnp.concatenate([hi, mid, lo], axis=1), ((0, 0), (0, 7), (0, 0))
        )
        return _bucket_select_bwd(g16, kk, c, nl)

    d_full = jax.jit(lambda g3, kk: bwd(g3, kk, None))(gt, keys)
    d_skip = jax.jit(bwd)(gt, keys, nlanes)
    real = np.asarray(d_full).reshape(g_, 3, 32, c)[:, :, :27]
    got = np.asarray(d_skip).reshape(g_, 3, 32, c)[:, :, :27]
    assert float(np.max(np.abs(got - real))) == 0.0


def test_bucket_lane_values_matches_gather():
    """`bucket_lane_values` (the runtime per-atom value lane-select) must
    reproduce values[idx] on real topology, and its custom vjp must match
    the gather's gradient."""
    from torchani_tpu.bucket_refresh import bucket_lane_values

    coords, cell, grid, idx, mask, shift, _ = _random_periodic_topology(7)
    a = coords.shape[0]
    ws = jnp.asarray(make_wrapshift(grid, np.asarray(cell)))
    tables, overflow = build_bucket_tables(
        coords, idx, mask, shift, jnp.ones((a,), bool), cell,
        grid_shape=grid, c=16, wrapshift=ws,
    )
    assert not bool(overflow)
    rng = np.random.RandomState(3)
    vals = jnp.asarray(rng.randn(a, 2).astype(np.float32))

    def sel(v):
        out = bucket_lane_values(
            v, tables.keys, tables.atom_of_slot, tables.slot_of_atom,
            tables.wrapshift,
        )
        return jnp.where(mask[..., None], out, 0.0)

    got = jax.jit(sel)(vals)
    ref = jnp.where(
        mask[..., None], jnp.take(vals, jnp.where(mask, idx, 0), axis=0), 0.0
    )
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-6

    w = jnp.asarray(rng.randn(*got.shape).astype(np.float32))
    g_got = jax.jit(jax.grad(lambda v: jnp.sum(w * sel(v))))(vals)
    g_ref = jax.jit(
        jax.grad(
            lambda v: jnp.sum(
                w
                * jnp.where(
                    mask[..., None],
                    jnp.take(v, jnp.where(mask, idx, 0), axis=0),
                    0.0,
                )
            )
        )
    )(vals)
    scale = float(jnp.max(jnp.abs(g_ref))) + 1e-9
    assert float(jnp.max(jnp.abs(g_got - g_ref))) / scale < 1e-5


def test_bucket_overflow_flags():
    coords, cell, grid, idx, mask, shift, _ = _random_periodic_topology(2)
    a = coords.shape[0]
    ws = jnp.asarray(make_wrapshift(grid, np.asarray(cell)))
    # slot capacity far below occupancy -> must flag, not crash
    _, overflow = build_bucket_tables(
        coords, idx, mask, shift, jnp.ones((a,), bool), cell,
        grid_shape=grid, c=16, wrapshift=ws,
    )
    # 60 atoms in ~8 buckets: 16 slots may or may not overflow; force it
    _, overflow1 = build_bucket_tables(
        coords, idx, mask, shift, jnp.ones((a,), bool), cell,
        grid_shape=(1, 1, 1),
        c=16,
        wrapshift=jnp.asarray(make_wrapshift((1, 1, 1), np.asarray(cell))),
    )
    assert bool(overflow1)


# ---------------------------------------------------------------------------
# atom-packed layout (bucket_refresh_packed)
# ---------------------------------------------------------------------------


def _packed_setup(seed=0, c=32):
    """Random periodic topology -> (BucketTables, PackedTables, fixtures)."""
    from torchani_tpu.bucket_refresh_packed import choose_span, pack_tables

    coords, cell, grid, idx, mask, shift, diff_ref = _random_periodic_topology(
        seed
    )
    a, k = idx.shape
    ws = jnp.asarray(make_wrapshift(grid, np.asarray(cell)))
    tables, overflow = jax.jit(
        lambda *args: build_bucket_tables(*args, grid_shape=grid, c=c, wrapshift=ws)
    )(coords, idx, mask, shift, jnp.ones((a,), bool), cell)
    assert not bool(overflow)
    g = int(np.prod(grid))
    counts = np.asarray(
        jnp.sum((tables.atom_of_slot < a).reshape(g, c), axis=1)
    )
    sb, s_cap = choose_span(grid, counts, c)
    packed, povf = jax.jit(lambda t: pack_tables(t, sb, s_cap))(tables)
    assert not bool(povf)
    return coords, cell, idx, mask, shift, diff_ref, tables, packed


@pytest.mark.parametrize("seed", [0, 3])
def test_packed_nbr_pos_matches_bucket(seed):
    """Atom-packed forward == slot-row forward == cached gather diffs."""
    from torchani_tpu.bucket_refresh_packed import packed_nbr_pos

    coords, cell, idx, mask, _, diff_ref, tables, packed = _packed_setup(seed)
    a, k = idx.shape
    canon = coords - packed.wrap_offset
    nbr = jax.jit(packed_nbr_pos)(canon, packed)[:, :k]
    diff = jnp.where(mask[..., None], nbr - canon[:, None, :], 0.0)
    err = float(jnp.max(jnp.abs(diff - diff_ref)))
    assert err < 2e-4, err
    # and bit-identical to the slot-row path (same selection, same canon)
    nbr_slot = jax.jit(bucket_nbr_pos)(
        canon, tables.keys, tables.atom_of_slot, tables.slot_of_atom,
        tables.wrapshift,
    )
    m = mask[..., None]
    assert float(jnp.max(jnp.abs(jnp.where(m, nbr - nbr_slot, 0.0)))) == 0.0


def test_packed_nbr_pos_backward_matches_gather():
    from torchani_tpu.bucket_refresh_packed import packed_nbr_pos

    coords, cell, idx, mask, shift, _, tables, packed = _packed_setup(1)
    a, k = idx.shape
    w = jnp.asarray(np.random.RandomState(7).randn(a, k, 3).astype(np.float32))

    def loss_packed(crd):
        canon = crd - packed.wrap_offset
        nbr = packed_nbr_pos(canon, packed)[:, :k]
        d = jnp.where(mask[..., None], nbr - canon[:, None, :], 0.0)
        return jnp.sum(w * d)

    def loss_gather(crd):
        nbr = jnp.take(crd, jnp.where(mask, idx, 0), axis=0)
        d = nbr - crd[:, None, :] + shift
        d = jnp.where(mask[..., None], d, 0.0)
        return jnp.sum(w * d)

    gp = jax.jit(jax.grad(loss_packed))(coords)
    gg = jax.jit(jax.grad(loss_gather))(coords)
    scale = float(jnp.max(jnp.abs(gg))) + 1e-9
    assert float(jnp.max(jnp.abs(gp - gg))) / scale < 1e-5


def test_packed_kernel_branch_interpret():
    """Force the Pallas-kernel branch off-TPU (interpret mode) so the kernel
    bodies AND the reshape glue around them are exercised; must be bit-exact
    vs the reference-gather branch."""
    import torchani_tpu.bucket_refresh_packed as brp

    coords, cell, idx, mask, _, _, tables, packed = _packed_setup(2)
    a, k = idx.shape
    canon = coords - packed.wrap_offset
    ref = brp.packed_nbr_pos(canon, packed)
    w = jnp.asarray(np.random.RandomState(9).randn(a, k, 3).astype(np.float32))

    def loss(crd):
        nbr = brp.packed_nbr_pos(crd - packed.wrap_offset, packed)[:, :k]
        d = jnp.where(mask[..., None], nbr - crd[:, None, :] + packed.wrap_offset[:, None], 0.0)
        return jnp.sum(w * d)

    g_ref = jax.grad(loss)(coords)
    old = brp._FORCE_KERNEL
    brp._FORCE_KERNEL = True
    try:
        out = brp.packed_nbr_pos(canon, packed)
        g_k = jax.grad(loss)(coords)
    finally:
        brp._FORCE_KERNEL = old
    m = mask[..., None]
    assert float(jnp.max(jnp.abs(jnp.where(m, out[:, :k] - ref[:, :k], 0.0)))) == 0.0
    # backward: kernel sums bf16 split planes in a different order than the
    # reference scatter-add -> f32 reduction-order noise only
    scale = float(jnp.max(jnp.abs(g_ref))) + 1e-9
    assert float(jnp.max(jnp.abs(g_k - g_ref))) / scale < 1e-6


def test_pack_tables_span_overflow_guard():
    """On span overflow: flag set, and rows never collide across spans (an
    overflowing span must not corrupt its neighbor's atoms)."""
    from torchani_tpu.bucket_refresh_packed import pack_tables

    coords, cell, grid, idx, mask, shift, _ = _random_periodic_topology(4)
    a, k = idx.shape
    c = 32
    ws = jnp.asarray(make_wrapshift(grid, np.asarray(cell)))
    tables, overflow = build_bucket_tables(
        coords, idx, mask, shift, jnp.ones((a,), bool), cell,
        grid_shape=grid, c=c, wrapshift=ws,
    )
    assert not bool(overflow)
    packed, povf = pack_tables(tables, 1, 8)  # far below occupancy
    assert bool(povf)
    row_of_atom = np.asarray(packed.row_of_atom)
    atom_of_row = np.asarray(packed.atom_of_row)
    kept = np.where(row_of_atom >= 0)[0]
    # each kept atom owns its row exclusively and maps back to itself
    assert len(set(row_of_atom[kept])) == len(kept)
    assert (atom_of_row[row_of_atom[kept]] == kept).all()


def test_md_bucket_path_matches_gather_path():
    model = tt.simple_ani(("H", "O"), ensemble_size=1)
    # low density -> a 20 A box from 150 atoms, so the bucket grid gets the
    # >= 3 cells per axis the bucket-dot path needs (a 30-atom liquid-density
    # box is ~7 A -> grid (1,1,1) -> the path correctly disables itself)
    species, coords, cell = make_water_box(150, density_molec_per_a3=0.008)

    def run(bucket_refresh):
        # the sparse lattice clusters ~24 atoms into one bucket, above the
        # 2x-mean bucket heuristic (16); init must auto-measure occupancy
        # (a NaN trajectory here means the measured capacity regressed)
        md = MolecularDynamics(
            model, species, cell=cell, pbc=True, timestep_fs=0.25,
            skin=0.6, bucket_refresh=bucket_refresh,
        )
        st = md.init(coords, temperature=100.0, key=jax.random.PRNGKey(4))
        st = md.run_nve(st, 12)
        return md, st

    from torchani_tpu.bucket_refresh_packed import PackedTables

    md_g, st_g = run(False)
    assert st_g.bucket is None
    for strategy in (True, "packed"):
        md_b, st_b = run(strategy)
        assert md_b._bucket_c is not None and st_b.bucket is not None
        if strategy == "packed":
            assert isinstance(st_b.bucket, PackedTables)
            assert md_b._bucket_span is not None
        assert int(st_b.rebuilds) == int(st_g.rebuilds)
        assert not bool(st_b.overflow)
        de = abs(float(st_b.energy) - float(st_g.energy))
        assert de < 5e-5 * abs(float(st_g.energy)) + 5e-5, de
        fscale = float(jnp.max(jnp.abs(st_g.forces))) + 1e-9
        ferr = float(jnp.max(jnp.abs(st_b.forces - st_g.forces))) / fscale
        assert ferr < 5e-3, ferr
        cerr = float(jnp.max(jnp.abs(st_b.coords - st_g.coords)))
        assert cerr < 1e-3, cerr
