"""Pre-trained model-zoo factories.

Counterpart of ``/root/reference/torchani/models.py:78-482``.  Each factory
builds the exact architecture of the published model family; weights are
loaded from a local state-dict file (``.pt`` or ``.npz``) when available in
`torchani_tpu.paths.state_dicts_dir` (this environment has no network
egress, so there is no download path — drop the published
``ani{name}_state_dict.pt`` files there to enable pretrained weights).
"""

import typing as tp
from pathlib import Path

import jax

from torchani_tpu.arch import ANI, Assembler
from torchani_tpu.paths import state_dicts_dir
from torchani_tpu.potentials.repulsion import RepulsionXTB, RepulsionZBL
from torchani_tpu.utils import SYMBOLS_1X, SYMBOLS_2X

__all__ = [
    "ANI1x",
    "ANI1ccx",
    "ANI2x",
    "ANI2xr",
    "ANIdr",
    "ANI2dr",
]


def _maybe_load(model: ANI, name: str, pretrained: bool) -> ANI:
    if not pretrained:
        return model
    for ext in (".npz", ".pt"):
        path = state_dicts_dir() / f"{name}_state_dict{ext}"
        if path.exists():
            from torchani_tpu.convert import load_state_dict, load_torch_state_dict

            if ext == ".pt":
                sd = load_torch_state_dict(path)
            else:
                import numpy as np

                with np.load(path) as data:
                    sd = {k: data[k] for k in data.files}
            return load_state_dict(model, sd)
    raise FileNotFoundError(
        f"No pretrained weights for {name!r} in {state_dicts_dir()} and this "
        "build has no download path. Pass pretrained=False for random init."
    )


def _base_assembler(
    symbols, aev: str, networks: str, lot: str, cutoff_fn: str = "cosine"
) -> Assembler:
    asm = Assembler(periodic_table_index=True)
    asm.set_symbols(symbols)
    asm.set_global_cutoff_fn(cutoff_fn)
    asm.set_aev_computer(radial=aev, angular=aev)
    asm.set_atomic_networks(ctor=networks)
    asm.set_gsaes_as_self_energies(lot)
    return asm


def ANI1x(
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """ANI-1x: HCNO, wB97X/6-31G(d), 8-member ensemble."""
    asm = _base_assembler(SYMBOLS_1X, "ani1x", "ani1x", "wb97x-631gd")
    model = asm.assemble(8 if model_index is None else 8, key=key)
    model = _maybe_load(model, "ani1x", pretrained)
    if model_index is not None:
        model = _select_member(model, model_index)
    return model


def ANI1ccx(
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """ANI-1ccx: HCNO, CCSD(T)*/CBS transfer-learned, 8-member ensemble."""
    asm = _base_assembler(SYMBOLS_1X, "ani1ccx", "ani1x", "ccsd(t)star-cbs")
    model = asm.assemble(8, key=key)
    model = _maybe_load(model, "ani1ccx", pretrained)
    if model_index is not None:
        model = _select_member(model, model_index)
    return model


def ANI2x(
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """ANI-2x: HCNOSFCl, wB97X/6-31G(d), 8-member ensemble."""
    asm = _base_assembler(SYMBOLS_2X, "ani2x", "ani2x", "wb97x-631gd")
    model = asm.assemble(8, key=key)
    model = _maybe_load(model, "ani2x", pretrained)
    if model_index is not None:
        model = _select_member(model, model_index)
    return model


def ANI2xr(
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """ANI-2x-repulsion: ANI-2x architecture + ZBL repulsion, smooth cutoff."""
    asm = _base_assembler(
        SYMBOLS_2X, "ani2x", "anidr", "wb97x-631gd", cutoff_fn="smooth"
    )
    asm.add_potential(
        "repulsion_zbl",
        RepulsionZBL.make(SYMBOLS_2X, cutoff=5.1, cutoff_fn="smooth"),
    )
    model = asm.assemble(8, key=key)
    model = _maybe_load(model, "ani2xr", pretrained)
    if model_index is not None:
        model = _select_member(model, model_index)
    return model


def ANIdr(
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """ANI-dr: ANI-2x elements + repulsion + D3 dispersion."""
    from torchani_tpu.potentials.dispersion import TwoBodyDispersionD3

    asm = _base_assembler(
        SYMBOLS_2X, "ani2x", "anidr", "wb97x-631gd", cutoff_fn="smooth"
    )
    asm.add_potential(
        "repulsion_xtb",
        RepulsionXTB.make(SYMBOLS_2X, cutoff=5.1, cutoff_fn="smooth"),
    )
    asm.add_potential(
        "dispersion_d3",
        TwoBodyDispersionD3.make(SYMBOLS_2X, functional="wb97x"),
    )
    model = asm.assemble(8, key=key)
    model = _maybe_load(model, "anidr", pretrained)
    if model_index is not None:
        model = _select_member(model, model_index)
    return model


ANI2dr = ANIdr


def _select_member(model: ANI, idx: int) -> ANI:
    from torchani_tpu.nn import Ensemble

    nnp = model.potentials["nnp"]
    networks = nnp.neural_networks
    if isinstance(networks, Ensemble):
        networks = networks.member(idx)
    pots = dict(model.potentials)
    pots["nnp"] = nnp.replace(neural_networks=networks)
    return model.replace(potentials=pots)
