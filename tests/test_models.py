"""Model-zoo factory tests (random init; pretrained weights unavailable)."""

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
