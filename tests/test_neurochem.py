"""NeuroChem format parsing tests (against the reference's sample files)."""

import numpy as np

from torchani_tpu.neurochem import (
    load_aev_computer_and_symbols,
    load_aev_constants_and_symbols,
    load_sae,
    _parse_nnf,
)

PARAMS_1X = "/root/reference/tests/resources/rHCNO-5.2R_16-3.5A_a4-8.params"
PARAMS_2X = "/root/reference/tests/resources/rHCNOSFCl-5.1R_16-3.5A_a8-4.params"


def test_parse_params_1x():
    consts, symbols = load_aev_constants_and_symbols(PARAMS_1X)
    assert symbols == ("H", "C", "N", "O")
    assert consts.radial_cutoff == 5.2
    assert consts.angular_cutoff == 3.5
    assert consts.radial_eta == 16.0
    assert consts.angular_zeta == 32.0
    assert len(consts.radial_shifts) == 16
    assert len(consts.sections) == 8
    assert len(consts.angular_shifts) == 4


def test_parse_params_2x():
    consts, symbols = load_aev_constants_and_symbols(PARAMS_2X)
    assert symbols == ("H", "C", "N", "O", "S", "F", "Cl")
    assert consts.radial_cutoff == 5.1
    assert len(consts.angular_shifts) == 8
    assert len(consts.sections) == 4


def test_aev_computer_from_params_matches_like_1x():
    import jax.numpy as jnp
    import torchani_tpu as tt

    aev_nc, symbols = load_aev_computer_and_symbols(PARAMS_1X)
    aev_std = tt.AEVComputer.like_1x()
    assert aev_nc.out_dim == aev_std.out_dim == 384
    rng = np.random.RandomState(0)
    elem = jnp.asarray([[0, 1, 2, 3]])
    coords = jnp.asarray(rng.rand(1, 4, 3).astype(np.float32) * 3)
    np.testing.assert_allclose(
        np.asarray(aev_nc(elem, coords)),
        np.asarray(aev_std(elem, coords)),
        atol=1e-6,
    )


def test_load_sae(tmp_path):
    sae_file = tmp_path / "sae_linfit.dat"
    sae_file.write_text(
        "H,0=-0.600953\nC,1=-38.08316\nN,2=-54.7077\nO,3=-75.194466\n"
    )
    shifter = load_sae(sae_file)
    assert shifter.symbols == ("H", "C", "N", "O")
    np.testing.assert_allclose(
        np.asarray(shifter.self_energies),
        [-0.600953, -38.08316, -54.7077, -75.194466],
        rtol=1e-6,
    )


def test_parse_nnf_block():
    nnf = """layer [
        nodes=160;
        activation=9;
        weights=FILE: weights0.wparam[61440];
        biases=FILE: biases0.bparam[160];
    ]
    layer [
        nodes=1;
        activation=6;
        weights=FILE: weights1.wparam[160];
        biases=FILE: biases1.bparam[1];
    ]"""
    specs = _parse_nnf(nnf)
    assert len(specs) == 2
    assert specs[0].nodes == 160 and specs[0].activation == 9
    assert specs[0].weights == "weights0.wparam"
    assert specs[0].weight_numel == 61440
    assert specs[1].bias_numel == 1
