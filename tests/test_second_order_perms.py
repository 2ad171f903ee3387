"""Second-order AD discipline for the permutation-gather ops.

Force training differentiates the force backward (grad-of-grad): if a
permutation op's custom vjp uses a plain ``jnp.take``, the SECOND-order
pass transposes it into the scatter-add the op exists to avoid (this
regressed e+f training 29.7 -> 43 ms/step when the count-class angular
split first rode through force training).  These tests pin both the
values and the op classes: every order of AD must stay a gather.

Reference analog: cuAEV's double-backward kernels
(``/root/reference/torchani/csrc/aev.cu``) exist for exactly this reason.
"""

import jax
import jax.numpy as jnp
import numpy as np

from torchani_tpu.aev.computer import _perm_rows
from torchani_tpu.nn.partition import (
    _perm_pad_rows,
    species_blocks_static,
)


def _perm(n, seed):
    rng = np.random.RandomState(seed)
    order = rng.permutation(n).astype(np.int32)
    inv = np.empty(n, np.int32)
    inv[order] = np.arange(n, dtype=np.int32)
    return jnp.asarray(order), jnp.asarray(inv)


def test_perm_rows_grad_of_grad_matches_plain_take():
    n, d = 48, 5
    order, inv = _perm(n, 0)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    w = jnp.asarray(rng.randn(n, d).astype(np.float32))
    u = jnp.asarray(rng.randn(n, d).astype(np.float32))

    def make_loss(perm_fn):
        def first(xx):
            return jnp.sum(jnp.sin(perm_fn(xx)) * w)

        def second(xx):
            return jnp.sum(jax.grad(first)(xx) * u)

        return second

    ours = make_loss(lambda xx: _perm_rows(xx, order, inv))
    plain = make_loss(lambda xx: jnp.take(xx, order, axis=0))
    np.testing.assert_allclose(ours(x), plain(x), rtol=1e-6)
    np.testing.assert_allclose(
        jax.grad(ours)(x), jax.grad(plain)(x), rtol=1e-5, atol=1e-6
    )


def test_perm_rows_second_order_hlo_is_gather_only():
    n, d = 64, 4
    order, inv = _perm(n, 2)
    w = jnp.ones((n, d), jnp.float32)

    def first(xx):
        return jnp.sum(jnp.sin(_perm_rows(xx, order, inv)) * w)

    def second(xx):
        return jnp.sum(jax.grad(first)(xx) ** 2)

    x = jnp.zeros((n, d), jnp.float32)
    hlo = jax.jit(jax.grad(second)).lower(x).compile().as_text()
    # match the HLO op syntax, not the word (test names land in metadata)
    assert "scatter(" not in hlo, (
        "second-order AD through _perm_rows produced a scatter; its "
        "transpose must stay a linear_call permutation gather"
    )


def test_perm_pad_rows_grad_of_grad_matches_dense_reference():
    """Second-order grads through the padded species-block permutation
    equal the dense one-hot matrix formulation (which is trivially
    correct at every AD order)."""
    elem = np.asarray([1, 0, 2, 1, -1, 0, 1, -1], np.int64)
    blocks = species_blocks_static(elem, quantum=2)
    n = elem.shape[0]
    p = int(sum(blocks.caps))
    d = 3
    # dense selection matrix: out[j] = x[inv[j]] (pad slots select nothing)
    sel = np.zeros((p, n), np.float32)
    inv_host = np.asarray(blocks.inv)
    for j, src in enumerate(inv_host):
        if src < n:
            sel[j, src] = 1.0
    sel = jnp.asarray(sel)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    w = jnp.asarray(rng.randn(p, d).astype(np.float32))

    def make_loss(fwd):
        def first(xx):
            return jnp.sum(jnp.cos(fwd(xx)) * w)

        def second(xx):
            return jnp.sum(jax.grad(first)(xx) ** 2)

        return second

    ours = make_loss(lambda xx: _perm_pad_rows(xx, blocks.inv, blocks.pos))
    dense = make_loss(lambda xx: sel @ xx)
    np.testing.assert_allclose(ours(x), dense(x), rtol=1e-6)
    np.testing.assert_allclose(
        jax.grad(ours)(x), jax.grad(dense)(x), rtol=1e-5, atol=1e-6
    )


def test_perm_pad_rows_second_order_hlo_is_gather_only():
    elem = np.asarray([0, 1, 0, 1, 1, -1], np.int64)
    blocks = species_blocks_static(elem, quantum=2)
    n = elem.shape[0]
    w = jnp.ones((int(sum(blocks.caps)), 2), jnp.float32)

    def first(xx):
        return jnp.sum(jnp.sin(_perm_pad_rows(xx, blocks.inv, blocks.pos)) * w)

    def second(xx):
        return jnp.sum(jax.grad(first)(xx) ** 2)

    x = jnp.zeros((n, 2), jnp.float32)
    hlo = jax.jit(jax.grad(second)).lower(x).compile().as_text()
    assert "scatter(" not in hlo


def test_force_training_step_with_split_adds_no_scatters():
    """BOTH the energy-only and the grad-of-grad (e+f) training programs
    with the angular split active compile scatter-free: the split's
    permutations are linear_call gathers, the permutation inverse is a
    sort, and the species-pair packing is a static column stack."""
    import optax

    import torchani_tpu as tt
    from torchani_tpu.testing import make_molecs
    from torchani_tpu.training import make_train_step, tune_angular_split
    from torchani_tpu.training.loop import _model_with_angular_capacity

    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1)
    model = model.replace(
        energy_shifter=model.energy_shifter.replace(enabled=False)
    )
    species, coords = make_molecs(48, 12, seed=5)
    batch = {
        "species": jnp.asarray(species),
        "coordinates": jnp.asarray(coords),
        "energies": jnp.zeros((48,), jnp.float32),
        "forces": jnp.zeros((48, 12, 3), jnp.float32),
    }
    base = _model_with_angular_capacity(model, 12)
    host = {
        "species": np.asarray(batch["species"]),
        "coordinates": np.asarray(batch["coordinates"]),
    }
    split = tune_angular_split(base, [host], margin=2.0)
    assert split.potentials["nnp"].aev_computer.angular_split is not None

    def scatter_count(force_training):
        init_fn, step_fn = make_train_step(
            split, optax.adam(1e-3), force_training=force_training
        )
        state = init_fn()
        b = dict(batch)
        if not force_training:
            b.pop("forces")
        hlo = jax.jit(step_fn).lower(state, b).compile().as_text()
        return hlo.count("scatter(")

    assert scatter_count(False) == 0
    assert scatter_count(True) == 0
