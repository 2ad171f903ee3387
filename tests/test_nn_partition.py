"""Species-blocked NN path (traced-species partition) parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import torchani_tpu as tt
from torchani_tpu.grad import energies_and_forces
from torchani_tpu.nn.partition import (
    block_rows,
    measure_caps,
    species_blocks,
    unblock_rows,
)
from torchani_tpu.testing import make_molecs
from torchani_tpu.training import make_train_step, tune_species_partition


@pytest.fixture(scope="module")
def batch():
    species, coords = make_molecs(24, 11, seed=5)
    return {
        "species": jnp.asarray(species),
        "coordinates": jnp.asarray(coords),
        "energies": jnp.asarray(
            np.random.RandomState(2).randn(24).astype(np.float32)
        ),
        "forces": jnp.zeros((24, 11, 3), np.float32),
    }


def test_block_unblock_roundtrip():
    rng = np.random.RandomState(0)
    elem = jnp.asarray(rng.randint(-1, 4, size=(50,)), jnp.int32)
    x = jnp.asarray(rng.randn(50, 7).astype(np.float32))
    caps = measure_caps([np.asarray(elem)], 4, quantum=8)

    def roundtrip(x):
        blocks = species_blocks(elem, caps)
        return unblock_rows(block_rows(x, blocks), blocks)

    y = jax.jit(roundtrip)(x)
    real = np.asarray(elem) >= 0
    np.testing.assert_array_equal(np.asarray(y)[real], np.asarray(x)[real])
    # dummy rows are dropped
    assert (np.asarray(y)[~real] == 0).all()
    # the round trip is a (partial) permutation: its backward is exact too
    g = jax.jit(jax.grad(lambda x: jnp.sum(roundtrip(x) * x)))(x)
    np.testing.assert_allclose(
        np.asarray(g)[real], 2 * np.asarray(x)[real], rtol=1e-6
    )
    assert (np.asarray(g)[~real] == 0).all()


def test_blocked_matches_padded_ef(batch):
    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=2)
    modelp = tune_species_partition(model, [batch], quantum=8)
    caps = modelp.potentials["nnp"].neural_networks.partition
    assert caps is not None and len(caps) == 4

    e0, f0 = jax.jit(lambda s, c: energies_and_forces(model, s, c))(
        batch["species"], batch["coordinates"]
    )
    e1, f1 = jax.jit(lambda s, c: energies_and_forces(modelp, s, c))(
        batch["species"], batch["coordinates"]
    )
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-5)


def test_blocked_force_training_step_matches(batch):
    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1)
    modelp = tune_species_partition(model, [batch], quantum=8)
    losses = []
    for m in (model, modelp):
        init_fn, step_fn = make_train_step(
            m, optax.adamw(1e-3), force_training=True
        )
        state = init_fn()
        state, metrics = jax.jit(step_fn)(state, batch)
        # one more step so optimizer-updated weights feed the next loss
        state, metrics = jax.jit(step_fn)(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[0])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_concrete_scattered_uses_static_blocks():
    """Concrete species with scattered rows (>=512 atoms) run the blocked
    path with a host-precomputed permutation; results match the traced
    (padded) evaluation."""
    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=2)
    species, coords = make_molecs(64, 12, seed=9)  # 768 rows, scattered
    s = jnp.asarray(species)
    c = jnp.asarray(coords)
    e_concrete = model(s, c)  # eager: concrete species -> static blocks
    e_traced = jax.jit(lambda s_, c_: model(s_, c_))(s, c)  # traced, padded
    np.testing.assert_allclose(
        np.asarray(e_concrete), np.asarray(e_traced), atol=1e-6
    )


def test_static_blocks_permutation():
    from torchani_tpu.nn.partition import species_blocks_static

    elem = np.asarray([2, -1, 0, 0, 3, -1, 2, 0], np.int32)
    blocks = species_blocks_static(elem)
    inv = np.asarray(blocks.inv)
    pos = np.asarray(blocks.pos)
    n = elem.shape[0]
    for i, e in enumerate(elem):
        if e < 0:
            assert pos[i] == len(inv)  # dropped
        else:
            assert inv[pos[i]] == i
    # empty slots point at the zero pad row
    real_slots = set(int(p) for p, e in zip(pos, elem) if e >= 0)
    for slot in range(len(inv)):
        if slot not in real_slots:
            assert inv[slot] == n


def test_partition_overflow_poisons(batch):
    model = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=1)
    nnp = model.potentials["nnp"]
    nets = nnp.neural_networks.replace(partition=(8, 8, 8, 8))
    pots = dict(model.potentials)
    pots["nnp"] = nnp.replace(neural_networks=nets)
    bad = model.replace(potentials=pots)
    e = jax.jit(lambda s, c: bad(s, c))(
        batch["species"], batch["coordinates"]
    )
    assert bool(jnp.all(jnp.isnan(e)))
