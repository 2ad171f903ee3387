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
    "ANImbis",
    "ANIr2s",
    "ANIr2s_water",
    "ANIr2s_chcl3",
    "ANIr2s_ch3cn",
    "SnnANI2xr",
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


def ANImbis(
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
):
    """ANI-mbis: ANI-2x elements with MBIS atomic charges (ANIq model)."""
    from torchani_tpu.arch import simple_aniq

    model = simple_aniq(
        SYMBOLS_2X,
        lot="wb97x-631gd",
        ensemble_size=8,
        merge_charge_networks=False,
        repulsion=False,
        cutoff_fn="cosine",
        radial_start=0.8,
        radial_cutoff=5.1,
        angular_start=0.8,
        activation="celu",
        bias=True,
        key=key,
    )
    model = _maybe_load(model, "animbis", pretrained)
    if model_index is not None:
        model = _select_member(model, model_index)
    return model


def ANIr2s(
    solvent: str = "water",
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """ANI-r2s solvent models (r2scan-3c level of theory, alt-smooth cutoff)."""
    from torchani_tpu.cutoffs import AltCutoffSmooth

    lots = {
        "vacuum": "r2scan3c-def2mtzvpp",
        "water": "r2scan3c_water-def2mtzvpp",
        "chcl3": "r2scan3c_chcl3-def2mtzvpp",
        "ch3cn": "r2scan3c_ch3cn-def2mtzvpp",
    }
    if solvent not in lots:
        raise ValueError(f"Unsupported solvent {solvent!r}; options {sorted(lots)}")
    from torchani_tpu.arch import Assembler

    asm = Assembler(periodic_table_index=True)
    asm.set_symbols(SYMBOLS_2X)
    asm.set_global_cutoff_fn(AltCutoffSmooth())
    asm.set_aev_computer(radial="ani2x", angular="ani2x")
    asm.set_atomic_networks(ctor="ani2x")
    functional, basis = lots[solvent].split("-")
    asm.set_gsaes_as_self_energies(f"{functional}-{basis}")
    model = asm.assemble(8, key=key)
    model = _maybe_load(model, f"anir2s_{solvent}", pretrained)
    if model_index is not None:
        model = _select_member(model, model_index)
    return model


def SnnANI2xr(
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """SingleNN variant of ANI-2xr (one shared network, per-element head)."""
    import jax as _jax

    from torchani_tpu.aev import AEVComputer
    from torchani_tpu.nn import SingleNN
    from torchani_tpu.potentials.nnp import NNPotential
    from torchani_tpu.sae import SelfEnergy

    aev = AEVComputer.like_2x(cutoff_fn="smooth")
    networks = SingleNN.default(
        SYMBOLS_2X, aev.out_dim, key=key or _jax.random.PRNGKey(0)
    )
    model = ANI(
        potentials={
            "nnp": NNPotential.make(SYMBOLS_2X, aev, networks),
            "repulsion_zbl": RepulsionZBL.make(
                SYMBOLS_2X, cutoff=5.1, cutoff_fn="smooth"
            ),
        },
        energy_shifter=SelfEnergy.from_lot(SYMBOLS_2X, "wb97x-631gd"),
        symbols=SYMBOLS_2X,
    )
    return _maybe_load(model, "snnani2xr", pretrained)


def _select_member(model: ANI, idx: int) -> ANI:
    from torchani_tpu.nn import Ensemble

    nnp = model.potentials["nnp"]
    networks = nnp.neural_networks
    if isinstance(networks, Ensemble):
        networks = networks.member(idx)
    pots = dict(model.potentials)
    pots["nnp"] = nnp.replace(neural_networks=networks)
    return model.replace(potentials=pots)


def ANIr2s_water(
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """ANI-r2s in implicit water (reference ``models.py`` factory)."""
    return ANIr2s("water", model_index, pretrained, key)


def ANIr2s_chcl3(
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """ANI-r2s in implicit chloroform (reference ``models.py`` factory)."""
    return ANIr2s("chcl3", model_index, pretrained, key)


def ANIr2s_ch3cn(
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """ANI-r2s in implicit acetonitrile (reference ``models.py`` factory)."""
    return ANIr2s("ch3cn", model_index, pretrained, key)


# ---- custom models (reference models.py:469-482 analog) ----
def __getattr__(name: str):
    """Resolve unknown attributes against ``custom_models_dir()``.

    Each ``<Name>/model.py`` under the custom-models dir may define factories;
    the first directory whose name prefixes ``name`` is imported and searched.
    """
    if name.startswith("__"):
        raise AttributeError(name)
    import importlib.util

    from torchani_tpu.paths import custom_models_dir

    for p in sorted(custom_models_dir().iterdir()):
        if p.is_dir() and p.name.startswith(name) and (p / "model.py").is_file():
            spec = importlib.util.spec_from_file_location(
                f"torchani_tpu._custom_models.{p.name}", p / "model.py"
            )
            assert spec is not None and spec.loader is not None
            module = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(module)
            try:
                return getattr(module, name)
            except AttributeError:
                continue
    raise AttributeError(f"module 'torchani_tpu.models' has no attribute {name!r}")
