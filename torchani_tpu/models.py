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
    """ANI-2xr: the `simple_ani` architecture (0.9/5.2 smooth AEV, like-2x
    gelu/no-bias networks, xTB repulsion at the radial cutoff) over the
    ANI-2x elements in atomic-number order, 8-member ensemble.

    Reference: ``models.py:255-288`` (simple_ani(lot="wb97x-631gd",
    symbols=SYMBOLS_2X_ZNUM_ORDER, ensemble_size=8, repulsion=True)).
    """
    from torchani_tpu.arch import simple_ani
    from torchani_tpu.utils import SYMBOLS_2X_ZNUM_ORDER

    model = simple_ani(
        SYMBOLS_2X_ZNUM_ORDER, "wb97x-631gd", ensemble_size=8, key=key
    )
    model = _maybe_load(model, "ani2xr", pretrained)
    if model_index is not None:
        model = _select_member(model, model_index)
    return model


def ANI2dr(
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """ANI-2dr: `simple_ani` architecture at the B973c level of theory with
    xTB repulsion AND D3(BJ) dispersion (functional "b973c"), ANI-2x
    elements in atomic-number order, 8-member ensemble.

    Reference: ``models.py:290-323`` (simple_ani(lot="b973c-def2mtzvp",
    symbols=SYMBOLS_2X_ZNUM_ORDER, ensemble_size=8, dispersion=True,
    repulsion=True)).
    """
    from torchani_tpu.arch import simple_ani
    from torchani_tpu.utils import SYMBOLS_2X_ZNUM_ORDER

    model = simple_ani(
        SYMBOLS_2X_ZNUM_ORDER,
        "b973c-def2mtzvp",
        ensemble_size=8,
        dispersion=True,
        repulsion=True,
        key=key,
    )
    model = _maybe_load(model, "ani2dr", pretrained)
    if model_index is not None:
        model = _select_member(model, model_index)
    return model


#: Alias: this family is also referred to as ANI-dr
ANIdr = ANI2dr


def ANImbis(
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
):
    """ANI-mbis: ANI-2x AEV/energy networks with MBIS atomic charges.

    ANIq model whose charge networks are 2-wide like-2x heads (gelu,
    no bias) with the FIRST output scalar discarded, normalized with
    (electronegativity/hardness)^2 weights scaled by q^2.

    Reference: ``models.py:201-252`` (Assembler(cls=ANIq) + ani2x AEV +
    _ANINetworksDiscardFirstScalar charge networks).
    """
    import jax as _jax

    from torchani_tpu.arch import ANIq
    from torchani_tpu.electro import ChargeNormalizer
    from torchani_tpu.nn import AtomicNetworksDiscardFirstScalar
    from torchani_tpu.potentials.nnp_charges import SeparateChargesNNPotential

    asm = _base_assembler(SYMBOLS_2X, "ani2x", "ani2x", "wb97x-631gd")
    base = asm.assemble(8, key=key)
    nnp = base.potentials["nnp"]
    charge_networks = AtomicNetworksDiscardFirstScalar.like_2x(
        SYMBOLS_2X,
        in_dim=nnp.aev_computer.out_dim,
        out_dim=2,
        activation="gelu",
        bias=False,
        key=key if key is not None else _jax.random.PRNGKey(7),
    )
    normalizer = ChargeNormalizer.from_electronegativity_and_hardness(
        SYMBOLS_2X, scale_weights_by_charges_squared=True
    )
    pots = dict(base.potentials)
    pots["nnp"] = SeparateChargesNNPotential.make(
        SYMBOLS_2X, nnp.aev_computer, nnp.neural_networks,
        charge_networks, normalizer,
    )
    model = ANIq(
        potentials=pots,
        energy_shifter=base.energy_shifter,
        symbols=base.symbols,
        neighborlist=base.neighborlist,
        periodic_table_index=base.periodic_table_index,
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
    """ANI-r2s solvent models: `simple_ani` with the exact ANI-2x AEV
    (0.8/5.1), smooth cutoff, and an UN-enveloped xTB repulsion
    (infinite repulsion cutoff), r2scan-3c level of theory.

    Reference: ``models.py:325-369`` (simple_ani(..., repulsion=True,
    repulsion_cutoff=False, cutoff_fn="smooth", radial_start=0.8,
    angular_start=0.8, radial_cutoff=5.1)).
    """
    from torchani_tpu.arch import simple_ani

    lots = {
        "vacuum": "r2scan3c-def2mtzvpp",
        "water": "r2scan3c_water-def2mtzvpp",
        "chcl3": "r2scan3c_chcl3-def2mtzvpp",
        "ch3cn": "r2scan3c_ch3cn-def2mtzvpp",
    }
    if solvent not in lots:
        raise ValueError(f"Unsupported solvent {solvent!r}; options {sorted(lots)}")
    model = simple_ani(
        SYMBOLS_2X,
        lots[solvent],
        ensemble_size=8,
        repulsion=True,
        repulsion_cutoff=False,
        cutoff_fn="smooth",
        radial_start=0.8,
        angular_start=0.8,
        radial_cutoff=5.1,
        key=key,
    )
    model = _maybe_load(model, f"anir2s_{solvent}", pretrained)
    if model_index is not None:
        model = _select_member(model, model_index)
    return model


def SnnANI2xr(
    model_index: tp.Optional[int] = None,
    pretrained: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """SingleNN variant of ANI-2xr: an 8-member ensemble of fully-shared
    "large" networks (320/256/256/512 + species embedding, per-element
    output column), 6 angular sections, xTB repulsion.

    Reference: ``models.py:431-467`` (simple_ani(..., container="SingleNN",
    container_ctor="large", repulsion=True, sections=6)).
    """
    from torchani_tpu.arch import simple_ani
    from torchani_tpu.utils import SYMBOLS_2X_ZNUM_ORDER

    model = simple_ani(
        SYMBOLS_2X_ZNUM_ORDER,
        "wb97x-631gd",
        ensemble_size=8,
        container="SingleNN",
        container_ctor="large",
        sections=6,
        key=key,
    )
    model = _maybe_load(model, "snnani2xr", pretrained)
    if model_index is not None:
        model = _select_member(model, model_index)
    return model


def _select_member(model: ANI, idx: int) -> ANI:
    from torchani_tpu.nn import Ensemble, GenericEnsemble

    nnp = model.potentials["nnp"]
    networks = nnp.neural_networks
    if isinstance(networks, (Ensemble, GenericEnsemble)):
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
