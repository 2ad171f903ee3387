"""Replica-exchange (parallel tempering) MD tests.

Beyond-reference capability (the reference has no native MD at all); these
check the physics invariants the implementation must honor: equal-
temperature ladders accept every swap (delta == 0), swaps permute whole
configurations consistently, and the batched Langevin dynamics stay finite
and deterministic under a fixed seed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchani_tpu as tt
from torchani_tpu.replica import ReplicaExchange


@pytest.fixture(scope="module")
def model():
    return tt.simple_ani(
        ("H", "C", "N", "O"), ensemble_size=1, key=jax.random.PRNGKey(3)
    )


SPECIES = np.array([8, 1, 1])
COORDS = np.array(
    [[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]],
    np.float32,
)


def test_replica_ladder_runs(model):
    rex = ReplicaExchange(
        model, SPECIES, temperatures=(250.0, 300.0, 360.0, 430.0)
    )
    st = rex.init(COORDS, seed=1)
    assert st.coords.shape == (4, 3, 3)
    st = rex.run(st, segments=4, steps_per_segment=10)
    assert int(st.step) == 40
    assert bool(jnp.all(jnp.isfinite(st.energy)))
    assert bool(jnp.all(jnp.isfinite(st.coords)))
    # 4 replicas alternate 2/1 pairs per segment over 4 segments = 6 attempts
    assert int(st.swaps_attempted) == 6
    assert 0 <= int(st.swaps_accepted) <= 6


def test_equal_temperatures_accept_all_swaps(model):
    """With a flat ladder the Metropolis delta is exactly 0 -> p = 1."""
    rex = ReplicaExchange(model, SPECIES, temperatures=(300.0,) * 4)
    st = rex.init(COORDS, seed=2)
    st = rex.run(st, segments=3, steps_per_segment=5)
    assert int(st.swaps_accepted) == int(st.swaps_attempted) > 0


def test_swap_permutes_consistently(model):
    """After a forced swap, (coords, energy) pairs remain each other's
    model evaluation — the permutation must move them together."""
    rex = ReplicaExchange(model, SPECIES, temperatures=(300.0, 300.0))
    st = rex.init(COORDS, seed=3)
    st = rex.run(st, segments=1, steps_per_segment=8)
    e_check = np.asarray(
        model(rex.species, st.coords, None, None)
    )
    np.testing.assert_allclose(np.asarray(st.energy), e_check, atol=1e-5)


def test_deterministic_under_seed(model):
    rex = ReplicaExchange(model, SPECIES, temperatures=(280.0, 340.0))
    a = rex.run(rex.init(COORDS, seed=7), segments=2, steps_per_segment=6)
    b = rex.run(rex.init(COORDS, seed=7), segments=2, steps_per_segment=6)
    np.testing.assert_array_equal(np.asarray(a.coords), np.asarray(b.coords))
    assert int(a.swaps_accepted) == int(b.swaps_accepted)
