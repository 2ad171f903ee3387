"""Neighbor-engine tests: all_pairs vs cell_list, capacities, PBC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchani_tpu.neighbors import (
    all_pairs,
    cell_list,
    estimate_capacity,
    narrow_to_cutoff,
    repack_to_capacity,
)


def _pair_set(nbrs, mol=0, decimals=4):
    """Canonical set of (i, j, r) pairs from a padded table (one molecule)."""
    idx = np.asarray(nbrs.idx[mol])
    mask = np.asarray(nbrs.mask[mol])
    dist = np.asarray(nbrs.dist[mol])
    out = set()
    a, k = idx.shape
    for i in range(a):
        for kk in range(k):
            if mask[i, kk]:
                out.add((i, int(idx[i, kk]), round(float(dist[i, kk]), decimals)))
    return out


def _pairs_match(na, nb, atol=1e-4):
    """Same pair multiset, distances equal to a tolerance (f32 rounding may
    differ between algorithms that displace coordinates)."""
    from collections import defaultdict

    da, db = defaultdict(list), defaultdict(list)
    for (i, j, d) in _pair_set(na, decimals=8):
        da[(i, j)].append(d)
    for (i, j, d) in _pair_set(nb, decimals=8):
        db[(i, j)].append(d)
    if set(da) != set(db):
        return False
    for key in da:
        if len(da[key]) != len(db[key]):
            return False
        if not np.allclose(sorted(da[key]), sorted(db[key]), atol=atol):
            return False
    return True


def test_full_table_is_symmetric():
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.rand(1, 20, 3).astype(np.float32) * 6)
    elem = jnp.zeros((1, 20), dtype=jnp.int32)
    nbrs = all_pairs(5.2, elem, coords)
    pairs = _pair_set(nbrs)
    for (i, j, d) in pairs:
        assert (j, i, d) in pairs


def test_dummy_atoms_excluded():
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.rand(1, 6, 3).astype(np.float32) * 2)
    elem = jnp.asarray([[0, 0, -1, 0, -1, 0]])
    nbrs = all_pairs(5.0, elem, coords)
    idx = np.asarray(nbrs.idx[0])
    mask = np.asarray(nbrs.mask[0])
    assert not mask[2].any() and not mask[4].any()
    for i in range(6):
        for k in range(idx.shape[1]):
            if mask[i, k]:
                assert idx[i, k] not in (2, 4)


def test_cell_list_matches_all_pairs_nopbc():
    rng = np.random.RandomState(1)
    a = 300
    coords = jnp.asarray(rng.rand(1, a, 3).astype(np.float32) * 20)
    elem = jnp.zeros((1, a), dtype=jnp.int32)
    cutoff = 5.2
    ap = all_pairs(cutoff, elem, coords)
    cl = cell_list(cutoff, elem, coords, capacity=64)
    assert not bool(cl.overflow)
    assert _pairs_match(ap, cl)


def test_cell_list_matches_all_pairs_pbc():
    rng = np.random.RandomState(2)
    a = 200
    cell = jnp.asarray(np.eye(3, dtype=np.float32) * 18.0)
    coords = jnp.asarray(rng.rand(1, a, 3).astype(np.float32) * 18)
    elem = jnp.zeros((1, a), dtype=jnp.int32)
    pbc = jnp.asarray([True, True, True])
    cutoff = 5.2
    ap = all_pairs(cutoff, elem, coords, cell, pbc, capacity=64)
    cl = cell_list(cutoff, elem, coords, cell, pbc, capacity=64)
    assert not bool(ap.overflow) and not bool(cl.overflow)
    assert _pairs_match(ap, cl)


def test_overflow_flag():
    rng = np.random.RandomState(3)
    coords = jnp.asarray(rng.rand(1, 30, 3).astype(np.float32))  # dense cluster
    elem = jnp.zeros((1, 30), dtype=jnp.int32)
    nbrs = all_pairs(5.0, elem, coords, capacity=4)
    assert bool(nbrs.overflow)


def test_narrow_and_repack():
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.rand(1, 50, 3).astype(np.float32) * 8)
    elem = jnp.zeros((1, 50), dtype=jnp.int32)
    nbrs = all_pairs(5.2, elem, coords)
    narrowed = narrow_to_cutoff(nbrs, 3.5)
    small = repack_to_capacity(narrowed, 32)
    assert not bool(small.overflow)
    assert _pairs_match(narrowed, small)


def test_capacity_estimate_is_lane_friendly():
    k = estimate_capacity(5.2, 10000)
    assert k % 8 == 0 and k >= 64


def test_pbc_self_image_pairs():
    """An atom must see its own periodic images in a small cell."""
    cell = jnp.asarray(np.eye(3, dtype=np.float32) * 3.0)
    coords = jnp.zeros((1, 1, 3), dtype=jnp.float32)
    elem = jnp.zeros((1, 1), dtype=jnp.int32)
    nbrs = all_pairs(3.5, elem, coords, cell, jnp.asarray([True, True, True]), capacity=32)
    # 6 face images at distance 3.0 within cutoff 3.5
    dist = np.asarray(nbrs.dist[0, 0])[np.asarray(nbrs.mask[0, 0])]
    assert (np.abs(dist - 3.0) < 1e-5).sum() == 6


def test_jit_all_pairs():
    rng = np.random.RandomState(5)
    coords = jnp.asarray(rng.rand(2, 8, 3).astype(np.float32) * 4)
    elem = jnp.zeros((2, 8), dtype=jnp.int32)
    f = jax.jit(lambda e, c: all_pairs(5.2, e, c).dist)
    np.testing.assert_allclose(
        np.asarray(f(elem, coords)), np.asarray(all_pairs(5.2, elem, coords).dist),
        atol=1e-6,
    )


def test_lane_permute_matches_take_along_axis():
    """lane_permute (one-hot contraction) must reproduce take_along_axis
    bit-exactly for f32, int32 and bool payloads."""
    from torchani_tpu.neighbors import lane_permute

    rng = np.random.RandomState(3)
    r, k, c = 37, 24, 11
    top = jnp.asarray(rng.randint(0, k, (r, c)).astype(np.int32))
    f = jnp.asarray(rng.randn(r, k).astype(np.float32))
    v3 = jnp.asarray(rng.randn(r, k, 3).astype(np.float32))
    i = jnp.asarray(rng.randint(-1, 1000, (r, k)).astype(np.int32))
    b = jnp.asarray(rng.rand(r, k) < 0.5)

    pf, pv, pi, pb = lane_permute((f, v3, i, b), top)
    ref = lambda x: jnp.take_along_axis(  # noqa: E731
        x, top[..., None] if x.ndim == 3 else top, axis=1
    )
    assert bool(jnp.all(pf == ref(f)))
    assert bool(jnp.all(pv == ref(v3)))
    assert bool(jnp.all(pi == ref(i)))
    assert bool(jnp.all(pb == ref(b)))


def test_pack_positions_wide_matches_topk():
    """The wide-row cumsum-contraction pack must agree with the top_k pack
    on every unmasked lane (and on the overflow flag)."""
    from torchani_tpu.neighbors import _pack_positions

    rng = np.random.RandomState(4)
    r, n, cap = 64, 1300, 48
    valid = jnp.asarray(rng.rand(r, n) < 0.02)
    pos, mask, ov = _pack_positions(valid, cap)  # wide path (n > 4*cap)
    order = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    key = jnp.where(valid, -order.astype(jnp.float32), -jnp.inf)
    _, pos_ref = jax.lax.top_k(key, cap)
    assert bool(jnp.all(jnp.where(mask, pos, -1) == jnp.where(mask, pos_ref, -1)))
    assert not bool(ov)
    _, _, ov2 = _pack_positions(jnp.asarray(rng.rand(r, n) < 0.2), cap)
    assert bool(ov2)
