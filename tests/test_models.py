"""Model-zoo factory tests (random init; pretrained weights unavailable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchani_tpu import models

WATER_S = jnp.asarray([[8, 1, 1]])
WATER_C = jnp.asarray(
    [[[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]]]
)


@pytest.mark.parametrize(
    "factory",
    [
        lambda: models.ANI1x(pretrained=False),
        lambda: models.ANI2x(pretrained=False),
        lambda: models.ANI2xr(pretrained=False),
        lambda: models.ANIdr(pretrained=False),
        lambda: models.ANIr2s(pretrained=False),
        lambda: models.SnnANI2xr(pretrained=False),
    ],
    ids=["ani1x", "ani2x", "ani2xr", "anidr", "anir2s", "snnani2xr"],
)
def test_factories_run(factory):
    model = factory()
    e = np.asarray(model(WATER_S, WATER_C))
    assert np.isfinite(e).all()
    # GSAE shift dominates: water total should be around -76 Ha
    assert -80 < float(e[0]) < -70


def test_ensemble_member_selection():
    full = models.ANI2x(pretrained=False)
    sub = models.ANI2x(model_index=2, pretrained=False)
    members = np.asarray(full(WATER_S, WATER_C, ensemble_values=True))
    single = np.asarray(sub(WATER_S, WATER_C))
    np.testing.assert_allclose(single[0], members[2, 0], atol=1e-6)


def test_animbis_charges():
    m = models.ANImbis(pretrained=False)
    out = m.energies_and_charges(WATER_S, WATER_C)
    np.testing.assert_allclose(float(out.scalars.sum()), 0.0, atol=1e-6)


def test_missing_pretrained_raises():
    with pytest.raises(FileNotFoundError):
        models.ANI2x(pretrained=True)


def test_anir2s_solvents_differ():
    w = models.ANIr2s("water", pretrained=False)
    c = models.ANIr2s("chcl3", pretrained=False)
    # same architecture/seed, different GSAEs -> different energies
    ew = float(np.asarray(w(WATER_S, WATER_C))[0])
    ec = float(np.asarray(c(WATER_S, WATER_C))[0])
    assert ew != ec


def test_custom_models_hook(tmp_path, monkeypatch):
    monkeypatch.setenv("TORCHANI_TPU_DATA_DIR", str(tmp_path))
    mdir = tmp_path / "CustomModels" / "MyANI"
    mdir.mkdir(parents=True)
    (mdir / "model.py").write_text(
        "import torchani_tpu as tt\n"
        "def MyANI(**kw):\n"
        "    return tt.simple_ani(('H','O'), ensemble_size=1)\n"
    )
    from torchani_tpu import models

    assert type(models.MyANI()).__name__ == "ANI"
    import pytest

    with pytest.raises(AttributeError):
        models.NoSuchModel


def test_periodic_table_indexing_equivalence():
    """Atomic-number inputs (periodic_table_index=True) and pre-converted
    element indices (False) must give identical results (reference
    tests/test_periodic_table_indexing.py)."""
    import torchani_tpu as tt

    m_znum = tt.simple_ani(("H", "C", "N", "O"), ensemble_size=2)
    m_idx = m_znum.replace(periodic_table_index=False)
    znums = jnp.asarray([[6, 1, 1, 1, 1]])  # CH4
    elem = m_znum.species_converter(znums)
    assert elem.tolist() == [[1, 0, 0, 0, 0]]
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.rand(1, 5, 3).astype(np.float32) * 2)
    e_znum = np.asarray(m_znum(znums, coords))
    e_idx = np.asarray(m_idx(elem, coords))
    np.testing.assert_allclose(e_znum, e_idx, atol=0.0)
    # padding (-1) passes through the converter untouched
    padded = jnp.asarray([[6, 1, 1, 1, 1, -1]])
    assert m_znum.species_converter(padded).tolist()[0][-1] == -1


def test_to_infer_model_is_equivalent():
    """`to_infer_model` (reference BMM/MNP inference conversion) must be a
    no-op-by-design here — the default execution IS the fused batched form
    — and keep producing identical energies."""
    import torchani_tpu as tt

    m = tt.simple_ani(("H", "O"), ensemble_size=3)
    infer = m.to_infer_model(use_mnp=True)
    sp = jnp.asarray([[8, 1, 1]])
    co = jnp.asarray(
        [[[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]]]
    )
    np.testing.assert_allclose(
        np.asarray(m(sp, co)), np.asarray(infer(sp, co)), atol=0.0
    )


def test_export_serialization_roundtrip():
    """jax.export round-trip: the TPU-native analog of the reference's
    TorchScript-everywhere test axis (reference _testing.py jit variants) —
    the model must survive StableHLO serialization and reload bit-exactly."""
    import torchani_tpu as tt

    try:
        from jax import export as jax_export
    except ImportError:
        import pytest

        pytest.skip("jax.export unavailable in this jax version")

    m = tt.simple_ani(("H", "O"), ensemble_size=2)
    sp = jnp.asarray([[8, 1, 1]])
    co = jnp.asarray(
        [[[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]]]
    )
    exported = jax_export.export(jax.jit(lambda z, c: m(z, c)))(sp, co)
    blob = exported.serialize()
    reloaded = jax_export.deserialize(blob)
    np.testing.assert_array_equal(
        np.asarray(reloaded.call(sp, co)), np.asarray(m(sp, co))
    )
