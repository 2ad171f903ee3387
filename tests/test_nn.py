"""NN container tests: stacked padded MLPs, ensembles, species converter."""

import jax
import jax.numpy as jnp
import numpy as np

from torchani_tpu.nn import AtomicNetworks, Ensemble, SpeciesConverter


def test_padded_stacking_is_exact():
    """Zero-padded ragged dims must not perturb outputs or gradients."""
    net = AtomicNetworks.like_1x(key=jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    elem = jnp.asarray(rng.randint(0, 4, size=(3, 6)))
    aevs = jnp.asarray(rng.randn(3, 6, 384).astype(np.float32))
    out = net(elem, aevs)
    # gradient wrt weights: padded regions must receive zero gradient
    def loss(n):
        return jnp.sum(n(elem, aevs) ** 2)

    grads = jax.grad(loss)(net)
    for li in range(len(net.weights)):
        for si, d in enumerate(net.layer_dims):
            din, dout = d[li], d[li + 1]
            gw = np.asarray(grads.weights[li][si])
            if gw[din:, :].size:
                assert np.abs(gw[din:, :]).max() == 0.0
            if gw[:, dout:].size:
                assert np.abs(gw[:, dout:]).max() == 0.0
    assert np.isfinite(np.asarray(out)).all()


def test_dummy_atoms_contribute_zero():
    net = AtomicNetworks.like_1x(key=jax.random.PRNGKey(2))
    rng = np.random.RandomState(1)
    elem = jnp.asarray([[0, 1, -1, -1]])
    aevs = jnp.asarray(rng.randn(1, 4, 384).astype(np.float32))
    atomic = np.asarray(net(elem, aevs, atomic=True))
    assert atomic[0, 2] == 0.0 and atomic[0, 3] == 0.0
    total = np.asarray(net(elem, aevs))
    np.testing.assert_allclose(total[0], atomic[0].sum(), atol=1e-6)


def test_ensemble_mean_matches_members():
    members = [AtomicNetworks.like_1x(key=jax.random.PRNGKey(i)) for i in range(3)]
    ens = Ensemble.from_members(members)
    rng = np.random.RandomState(2)
    elem = jnp.asarray(rng.randint(0, 4, size=(2, 5)))
    aevs = jnp.asarray(rng.randn(2, 5, 384).astype(np.float32))
    mean = np.asarray(ens(elem, aevs))
    per_member = np.stack([np.asarray(m(elem, aevs)) for m in members])
    np.testing.assert_allclose(mean, per_member.mean(axis=0), atol=1e-5)
    values = np.asarray(ens(elem, aevs, ensemble_values=True))
    np.testing.assert_allclose(values, per_member, atol=1e-5)


def test_ensemble_active_members():
    members = [AtomicNetworks.like_1x(key=jax.random.PRNGKey(i)) for i in range(3)]
    ens = Ensemble.from_members(members).set_active_members([0, 2])
    rng = np.random.RandomState(3)
    elem = jnp.asarray(rng.randint(0, 4, size=(1, 4)))
    aevs = jnp.asarray(rng.randn(1, 4, 384).astype(np.float32))
    out = np.asarray(ens(elem, aevs))
    expect = (
        np.asarray(members[0](elem, aevs)) + np.asarray(members[2](elem, aevs))
    ) / 2
    np.testing.assert_allclose(out, expect, atol=1e-6)
    assert ens.get_active_members_num() == 2


def test_member_roundtrip():
    members = [AtomicNetworks.like_1x(key=jax.random.PRNGKey(i)) for i in range(2)]
    ens = Ensemble.from_members(members)
    m1 = ens.member(1)
    for a, b in zip(m1.weights, members[1].weights):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_species_converter():
    conv = SpeciesConverter(("H", "C", "N", "O"))
    out = np.asarray(conv(jnp.asarray([[1, 6, 7, 8, -1]])))
    np.testing.assert_array_equal(out, [[0, 1, 2, 3, -1]])


def test_species_converter_validates():
    conv = SpeciesConverter(("H", "C"))
    try:
        conv(jnp.asarray([[1, 79]]), validate=True)
        assert False, "should have raised"
    except ValueError as e:
        assert "79" in str(e)


def test_precision_knob_plumbs_through():
    """`precision` survives member extraction / ensemble stacking and maps
    to a lax.Precision (values identical on CPU, where precision is a
    no-op; the TPU speed/accuracy tradeoff is tools/nn_precision_bench.py)."""
    import jax

    net = AtomicNetworks.from_layer_dims(
        ("H", "O"), ((16, 8, 1), (16, 8, 1)), key=jax.random.PRNGKey(0)
    )
    assert net.precision == "highest"
    fast = net.replace(precision="high")
    assert fast._matmul_precision == jax.lax.Precision.HIGH
    ens = Ensemble.from_members([fast, fast])
    assert ens.precision == "high"
    assert ens.member(0).precision == "high"

    elem = jnp.asarray([[0, 1, -1]])
    aevs = jnp.asarray(np.random.RandomState(0).randn(1, 3, 16), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ens(elem, aevs)),
        np.asarray(ens.replace(precision="highest")(elem, aevs)),
        rtol=1e-6,
    )
