"""AEV parity and invariance tests (model: reference tests/test_aev.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchani_tpu as tt
from torchani_tpu.neighbors import all_pairs

from conftest import load_golden


@pytest.fixture(scope="module")
def goldens():
    return load_golden("aev_goldens.npz")


@pytest.mark.parametrize("name,factory", [("aev1x", tt.AEVComputer.like_1x), ("aev2x", tt.AEVComputer.like_2x)])
def test_aev_matches_reference(goldens, name, factory):
    aevc = factory()
    elem = jnp.asarray(goldens[f"{name}_elem"])
    coords = jnp.asarray(goldens["coords"])
    aevs = np.asarray(aevc(elem, coords))
    np.testing.assert_allclose(aevs, goldens[f"{name}_values"], atol=5e-6, rtol=1e-5)


def test_aev_jit_matches_eager(goldens):
    aevc = tt.AEVComputer.like_1x()
    elem = jnp.asarray(goldens["aev1x_elem"])
    coords = jnp.asarray(goldens["coords"])
    eager = aevc(elem, coords)
    jitted = jax.jit(lambda c, e, x: c(e, x))(aevc, elem, coords)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=5e-6)


def test_aev_pbc_matches_reference():
    g = load_golden("aev_pbc_goldens.npz")
    aevc = tt.AEVComputer.like_1x()
    aevs = np.asarray(
        aevc(
            jnp.asarray(g["species"]),
            jnp.asarray(g["coords"]),
            cell=jnp.asarray(g["cell"]),
            pbc=jnp.asarray(np.array([True, True, True])),
        )
    )
    np.testing.assert_allclose(aevs, g["values"], atol=5e-6, rtol=1e-5)


def test_translation_invariance(goldens):
    aevc = tt.AEVComputer.like_1x()
    elem = jnp.asarray(goldens["aev1x_elem"][:2])
    coords = jnp.asarray(goldens["coords"][:2])
    base = np.asarray(aevc(elem, coords))
    rng = np.random.RandomState(0)
    for _ in range(5):
        shift = jnp.asarray(rng.randn(1, 1, 3).astype(np.float32) * 10)
        shifted = np.asarray(aevc(elem, coords + shift))
        np.testing.assert_allclose(shifted, base, atol=1e-4)


def test_pbc_translation_invariance():
    g = load_golden("aev_pbc_goldens.npz")
    aevc = tt.AEVComputer.like_1x()
    cell = jnp.asarray(g["cell"])
    pbc = jnp.asarray(np.array([True, True, True]))
    elem = jnp.asarray(g["species"][:1])
    coords = jnp.asarray(g["coords"][:1])
    base = np.asarray(aevc(elem, coords, cell=cell, pbc=pbc))
    rng = np.random.RandomState(0)
    for _ in range(5):
        shift = jnp.asarray(rng.randn(3).astype(np.float32) * 7)
        out = np.asarray(aevc(elem, coords + shift, cell=cell, pbc=pbc))
        np.testing.assert_allclose(out, base, atol=2e-4)


def test_padding_equivalence(goldens):
    """Adding padding atoms must not change real atoms' AEVs."""
    aevc = tt.AEVComputer.like_1x()
    elem = goldens["aev1x_elem"][:2]
    coords = goldens["coords"][:2]
    base = np.asarray(aevc(jnp.asarray(elem), jnp.asarray(coords)))
    pad_elem = np.concatenate([elem, np.full((2, 5), -1, dtype=elem.dtype)], axis=1)
    pad_coords = np.concatenate(
        [coords, np.zeros((2, 5, 3), dtype=coords.dtype)], axis=1
    )
    padded = np.asarray(aevc(jnp.asarray(pad_elem), jnp.asarray(pad_coords)))
    np.testing.assert_allclose(padded[:, : elem.shape[1]], base, atol=1e-6)
    assert np.abs(padded[:, elem.shape[1]:]).max() == 0.0


def test_batch_equals_individual(goldens):
    aevc = tt.AEVComputer.like_1x()
    elem = goldens["aev1x_elem"]
    coords = goldens["coords"]
    batched = np.asarray(aevc(jnp.asarray(elem), jnp.asarray(coords)))
    for i in range(3):
        single = np.asarray(aevc(jnp.asarray(elem[i: i + 1]), jnp.asarray(coords[i: i + 1])))
        np.testing.assert_allclose(single[0], batched[i], atol=1e-6)


def test_isolated_atom_and_beyond_cutoff():
    aevc = tt.AEVComputer.like_1x()
    # single atom: AEV must be exactly zero
    aev = np.asarray(aevc(jnp.asarray([[0]]), jnp.zeros((1, 1, 3))))
    assert np.abs(aev).max() == 0.0
    # two atoms far beyond cutoff
    coords = np.zeros((1, 2, 3), dtype=np.float32)
    coords[0, 1, 0] = 100.0
    aev = np.asarray(aevc(jnp.asarray([[0, 1]]), jnp.asarray(coords)))
    assert np.abs(aev).max() == 0.0


def test_superimposed_atoms_no_nan():
    aevc = tt.AEVComputer.like_1x()
    coords = np.zeros((1, 3, 3), dtype=np.float32)
    coords[0, 2, 0] = 1.0
    aev = np.asarray(aevc(jnp.asarray([[0, 0, 1]]), jnp.asarray(coords)))
    assert np.isfinite(aev).all()


def test_gradients_flow():
    """Forces (reverse) and grad-of-grad (force training) are finite."""
    aevc = tt.AEVComputer.like_1x()
    elem = jnp.asarray([[0, 1, 2, 3]])
    rng = np.random.RandomState(3)
    coords = jnp.asarray(rng.rand(1, 4, 3).astype(np.float32) * 2)

    def total(c):
        return jnp.sum(aevc(elem, c) ** 2)

    g = jax.grad(total)(coords)
    assert np.isfinite(np.asarray(g)).all()
    gg = jax.grad(lambda c: jnp.sum(jax.grad(total)(c) ** 2))(coords)
    assert np.isfinite(np.asarray(gg)).all()


def test_compute_from_neighbors_matches_call(goldens):
    aevc = tt.AEVComputer.like_1x()
    elem = jnp.asarray(goldens["aev1x_elem"][:2])
    coords = jnp.asarray(goldens["coords"][:2])
    direct = aevc(elem, coords)
    nbrs = all_pairs(aevc.radial.cutoff, elem, coords)
    via = aevc.compute_from_neighbors(elem, coords, nbrs)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via), atol=1e-6)


def test_species_specialization_under_jit(goldens):
    """The present-species fast path must fire for a jit-closed-over element
    constant and match the traced (all-species) path exactly.

    Regression: under an active jit trace even `reshape` on a concrete array
    returns a tracer, so deciding the specialization after the reshape
    silently fell back to the all-species grid path in every jitted caller
    (the MD driver paid the full 7-species angular contraction).
    """
    aevc = tt.AEVComputer.like_2x()
    elem = jnp.asarray(goldens["aev2x_elem"])
    coords = jnp.asarray(goldens["coords"])

    # sanity: the specialization is detected on the concrete array
    present = aevc._present_species(elem)
    assert present is not None and 0 < len(present) < aevc.num_species

    spec = jax.jit(lambda c: aevc(elem, c))(coords)  # elem closed over
    traced = jax.jit(lambda e, c: aevc(e, c))(elem, coords)  # elem traced
    np.testing.assert_allclose(
        np.asarray(spec), np.asarray(traced), atol=1e-6, rtol=1e-6
    )

    # gradients agree too (packed-pair vs grid backward)
    g_spec = jax.jit(jax.grad(lambda c: jnp.sum(aevc(elem, c) ** 2)))(coords)
    g_traced = jax.jit(
        jax.grad(lambda e, c: jnp.sum(aevc(e, c) ** 2), argnums=1)
    )(elem, coords)
    np.testing.assert_allclose(
        np.asarray(g_spec), np.asarray(g_traced), atol=1e-5, rtol=1e-5
    )


def test_angular_block_remat_policy_grads_match():
    """The blocked angular path (remat with the "ang_save" save-names
    policy) must produce the same AEVs and gradients as the single-block
    path — with few species so the tagged packed row path is exercised."""
    import torchani_tpu as tt
    from torchani_tpu.neighbors import all_pairs, narrow_to_cutoff

    from torchani_tpu.testing import make_water_box

    species_np, coords_np, _cell = make_water_box(63)
    species = jnp.asarray(species_np)
    coords = jnp.asarray(coords_np)
    model = tt.simple_ani(("H", "O"), ensemble_size=1)
    conv = model.species_converter
    elem = conv(species)
    aevc = model.aev_computer

    def aev_sum(c, computer):
        nb = narrow_to_cutoff(
            all_pairs(computer.radial.cutoff, elem, c), computer.radial.cutoff
        )
        return jnp.sum(computer.compute_from_neighbors(elem, c, nb) ** 2)

    blocked = aevc.replace(atom_block=16)  # 4 blocks -> lax.map + policy
    single = aevc.replace(atom_block=None)
    v1, g1 = jax.value_and_grad(lambda c: aev_sum(c, blocked))(coords)
    v2, g2 = jax.value_and_grad(lambda c: aev_sum(c, single))(coords)
    assert float(abs(v1 - v2)) < 1e-4 * abs(float(v2))
    scale = float(jnp.max(jnp.abs(g2))) + 1e-9
    assert float(jnp.max(jnp.abs(g1 - g2))) / scale < 1e-6


def test_angular_count_split_matches_unsplit():
    """The count-class angular split (angular_split=(k_small, n_dense)) must
    reproduce the unsplit AEVs and gradients, and NaN-poison when more rows
    exceed k_small than the dense class holds."""
    import torchani_tpu as tt
    from torchani_tpu.neighbors import all_pairs, narrow_to_cutoff
    from torchani_tpu.testing import make_water_box

    species_np, coords_np, _cell = make_water_box(90)
    species = jnp.asarray(species_np)
    coords = jnp.asarray(coords_np)
    model = tt.simple_ani(("H", "O"), ensemble_size=1)
    elem = model.species_converter(species)
    # angular_capacity below the table capacity forces the repack, so valid
    # lanes form the per-row prefix the split's static slice requires
    base = model.aev_computer.replace(angular_capacity=20)

    def aev(c, computer):
        nb = narrow_to_cutoff(
            all_pairs(computer.radial.cutoff, elem, c), computer.radial.cutoff
        )
        return computer.compute_from_neighbors(elem, c, nb)

    ref, g_ref = jax.value_and_grad(
        lambda c: jnp.sum(aev(c, base) ** 2)
    )(coords)
    counts_ok = base.replace(angular_split=(12, 64))
    v, g = jax.value_and_grad(lambda c: jnp.sum(aev(c, counts_ok) ** 2))(coords)
    assert float(abs(v - ref)) < 1e-4 * abs(float(ref)) + 1e-5
    scale = float(jnp.max(jnp.abs(g_ref))) + 1e-9
    assert float(jnp.max(jnp.abs(g - g_ref))) / scale < 1e-6

    # overflow: a tiny dense class cannot hold every row over k_small
    too_small = base.replace(angular_split=(8, 2))
    out = aev(coords, too_small)
    assert not bool(jnp.isfinite(out).all())


def test_angular_layout_variants_agree():
    """The three packed/grid angular formulations are numerically the same
    function (values and coordinate gradients), across the layout-switch
    boundary (small-Kp atoms-last vs pair-last vs grid)."""
    import numpy as np

    from torchani_tpu.aev.computer import (
        _angular_rows_grid,
        _angular_rows_packed,
        _angular_rows_packed_atoms_last,
    )
    from torchani_tpu.aev.terms import ANIAngular

    angular = ANIAngular.like_2x()
    rng = np.random.RandomState(0)
    m, ka, s = 160, 12, 4
    dist = jnp.asarray(rng.uniform(0.8, 3.4, (m, ka)).astype(np.float32))
    diff = jnp.asarray(rng.randn(m, ka, 3).astype(np.float32))
    # normalize diff to match dist (the math uses both consistently)
    diff = diff / jnp.linalg.norm(diff, axis=-1, keepdims=True) * dist[..., None]
    mask = rng.rand(m, ka) < 0.7
    maskf = jnp.asarray(mask.astype(np.float32))
    dist = jnp.where(maskf > 0.5, dist, 1.0)
    diff = diff * maskf[..., None]
    elem = rng.randint(0, s, (m, ka))
    oh = jax.nn.one_hot(jnp.asarray(np.where(mask, elem, -1)), s)

    def total(fn):
        def f(d):
            return jnp.sum(jnp.sin(fn(angular, s, dist, d, maskf, oh) * 3.0))

        return f

    outs = []
    grads = []
    for fn in (
        _angular_rows_grid,
        _angular_rows_packed,
        _angular_rows_packed_atoms_last,
    ):
        outs.append(np.asarray(fn(angular, s, dist, diff, maskf, oh)))
        grads.append(np.asarray(jax.grad(total(fn))(diff)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(grads[0], grads[1], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(grads[0], grads[2], rtol=2e-4, atol=1e-5)
