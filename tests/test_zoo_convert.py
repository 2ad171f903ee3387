"""Full published-scheme weight-converter parity.

The goldens (`tools/make_goldens.py:make_zoo_goldens`) run the REFERENCE
model factories (random seeded weights — this environment cannot download
the published ``.pt`` files) and record their state dicts, energies and
forces.  Loading those state dicts through `convert.load_state_dict` into
our factories must reproduce E/F to the BASELINE gate (1e-5 Ha / 1e-5
Ha/A), which validates the exact published key schemes end-to-end:

- ANI-2x: 8 members x 7 species, `potentials.nnp.neural_networks.members.*`
  (reference models.py:165-199)
- ANI-2xr: simple_ani + xTB repulsion tables (reference models.py:255-288)
- ANI-mbis: ANIq with 2-wide discard-first charge networks
  (reference models.py:201-252)
- plus the reference's backward-compat key remaps (reference
  arch.py:278-290, nn/_containers.py:340-358) applied to the same goldens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import load_golden
from torchani_tpu import models as zoo
from torchani_tpu.convert import canonicalize_torch_keys, load_state_dict
from torchani_tpu.grad import energies_and_forces


def _split(golden):
    sd = {k[len("sd."):]: golden[k] for k in golden if k.startswith("sd.")}
    data = {k: golden[k] for k in golden if not k.startswith("sd.")}
    return sd, data


def _check_ef(model, data, tag):
    species = jnp.asarray(data["species"])
    coords = jnp.asarray(data["coords"])
    e, f = energies_and_forces(model, species, coords)
    de = float(jnp.max(jnp.abs(e - jnp.asarray(data["energies"]))))
    df = float(jnp.max(jnp.abs(f - jnp.asarray(data["forces"]))))
    assert de < 1e-5, f"{tag}: energy mismatch {de}"
    assert df < 1e-5, f"{tag}: force mismatch {df}"


@pytest.mark.parametrize(
    "name,factory",
    [
        ("ani2x", lambda: zoo.ANI2x(pretrained=False)),
        ("ani2xr", lambda: zoo.ANI2xr(pretrained=False)),
    ],
)
def test_zoo_state_dict_parity(name, factory):
    golden = load_golden(f"zoo_goldens_{name}.npz")
    sd, data = _split(golden)
    model = load_state_dict(factory(), sd)
    _check_ef(model, data, name)


def test_zoo_mbis_parity_with_charges():
    golden = load_golden("zoo_goldens_animbis.npz")
    sd, data = _split(golden)
    model = load_state_dict(zoo.ANImbis(pretrained=False), sd)
    _check_ef(model, data, "animbis")
    qs = model.atomic_charges(
        jnp.asarray(data["species"]), jnp.asarray(data["coords"])
    )
    dq = float(jnp.max(jnp.abs(qs - jnp.asarray(data["charges"]))))
    assert dq < 1e-5, f"charges mismatch {dq}"


def test_legacy_key_schemes_canonicalize():
    """Checkpoints from before the reference's potentials-dict and
    layers-Sequential refactors load identically after canonicalization."""
    golden = load_golden("zoo_goldens_ani2xr.npz")
    sd, data = _split(golden)

    def to_legacy(k):
        # modern: potentials.nnp.neural_networks.members.0.atomics.H.layers.0.weight
        # legacy: neural_networks.members.0.H.0.weight (Sequential numbering,
        # no potentials prefix, no atomics segment); xtb tables sat at
        # numeric potential slot 1
        k = k.replace(".atomics.", ".")
        if ".layers." in k:
            head, rest = k.split(".layers.", 1)
            idx, leaf = rest.split(".", 1)
            k = f"{head}.{2 * int(idx)}.{leaf}"
        k = k.replace(".final_layer.", ".6.")
        if k.startswith("potentials.nnp."):
            k = k[len("potentials.nnp."):]
        elif k.startswith("potentials.repulsion_xtb."):
            k = "potentials.1." + k[len("potentials.repulsion_xtb."):]
        return k

    legacy = {to_legacy(k): v for k, v in sd.items()}
    assert any(".6.weight" in k for k in legacy)
    assert any(k.startswith("neural_networks.") for k in legacy)
    assert any(k.startswith("potentials.1.") for k in legacy)
    canon = canonicalize_torch_keys(legacy)
    assert set(canon) == set(sd)
    model = load_state_dict(zoo.ANI2xr(pretrained=False), legacy)
    _check_ef(model, data, "ani2xr-legacy")
