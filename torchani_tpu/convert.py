"""Weight conversion from the reference (torch) state-dict key scheme.

The reference stores models as flat torch state dicts with keys like
``potentials.nnp.neural_networks.members.{e}.atomics.{sym}.layers.{i}.weight``
(see reference ``arch.py`` module structure).  This module loads such dicts
(from ``.pt`` files via torch, or from plain ``.npz``) into the TPU-native
pytree model, transposing Linear weights ``(out, in) -> (in, out)`` and
zero-padding the ragged per-element layer shapes into the stacked layout.
"""

import typing as tp

import jax.numpy as jnp
import numpy as np

from torchani_tpu.arch import ANI
from torchani_tpu.nn import AtomicNetworks, Ensemble

__all__ = [
    "canonicalize_torch_keys",
    "load_torch_state_dict",
    "numpy_state_dict",
    "load_state_dict",
    "save_state_dict",
]


def canonicalize_torch_keys(
    sd: tp.Mapping[str, np.ndarray],
) -> tp.Dict[str, np.ndarray]:
    """Apply the reference's backward-compat key remaps to a flat state dict.

    Published checkpoints predate two reference refactors, and the reference
    rewrites their keys at load time; this reproduces both remaps so any
    vintage of checkpoint loads here:

    - model level (reference ``arch.py:278-290``): numeric potential slots
      ``potentials.{0,1,2}.*`` -> ``dispersion_d3 / repulsion_xtb / nnp``,
      and bare ``aev_computer.* / neural_networks.*`` ->
      ``potentials.nnp.*``.
    - network container level (reference ``nn/_containers.py:340-358``):
      keys missing the ``atomics.`` segment gain it, and
      ``torch.nn.Sequential``-numbered layers (even indices = Linear)
      become ``layers.{i}``, with index 6 -> ``final_layer``.
    """
    even = [0, 2, 4, 6, 8]
    out: tp.Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("potentials.0"):
            k = k.replace("potentials.0", "potentials.dispersion_d3", 1)
        elif k.startswith("potentials.1"):
            k = k.replace("potentials.1", "potentials.repulsion_xtb", 1)
        elif k.startswith("potentials.2"):
            k = k.replace("potentials.2", "potentials.nnp", 1)
        elif k.startswith("aev_computer") or k.startswith("neural_networks"):
            k = "potentials.nnp." + k
        for nn_name in ("neural_networks.", "charge_networks."):
            pos = k.find(nn_name)
            if pos < 0:
                continue
            head = k[: pos + len(nn_name)]
            parts = k[pos + len(nn_name):].split(".")
            i = 2 if parts[0] == "members" else 0
            if i < len(parts) and parts[i] != "atomics":
                parts.insert(i, "atomics")
            i += 1  # parts[i] is now the element symbol slot
            j = i + 1
            if j < len(parts) - 1 and parts[j].isdigit():
                n = int(parts[j])
                if n == 6:
                    parts[j] = "final_layer"
                else:
                    parts[j : j + 1] = ["layers", str(even.index(n))]
            k = head + ".".join(parts)
            break
        out[k] = v
    return out


def load_torch_state_dict(path) -> tp.Dict[str, np.ndarray]:
    """Load a ``.pt`` state dict into numpy arrays (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        # lightning checkpoint tolerance (reference utils.py:483-489)
        sd = {
            k[len("model."):]: v
            for k, v in sd["state_dict"].items()
            if k.startswith("model.")
        }
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def numpy_state_dict(torch_module) -> tp.Dict[str, np.ndarray]:
    """State dict of a live torch module as numpy arrays (for tests)."""
    return {
        k: v.detach().cpu().numpy() for k, v in torch_module.state_dict().items()
    }


def _network_arrays(
    sd: tp.Mapping[str, np.ndarray], prefix: str, symbols: tp.Sequence[str]
) -> tp.Dict[str, tp.List[tp.Tuple[np.ndarray, tp.Optional[np.ndarray]]]]:
    """Collect per-symbol [(W, b), ...] layers (torch layout) under prefix."""
    out: tp.Dict[str, tp.List[tp.Tuple[np.ndarray, tp.Optional[np.ndarray]]]] = {}
    for sym in symbols:
        layers = []
        i = 0
        while f"{prefix}atomics.{sym}.layers.{i}.weight" in sd:
            w = sd[f"{prefix}atomics.{sym}.layers.{i}.weight"]
            b = sd.get(f"{prefix}atomics.{sym}.layers.{i}.bias")
            layers.append((w, b))
            i += 1
        w = sd[f"{prefix}atomics.{sym}.final_layer.weight"]
        b = sd.get(f"{prefix}atomics.{sym}.final_layer.bias")
        layers.append((w, b))
        out[sym] = layers
    return out


def _fill_container(
    container: AtomicNetworks,
    per_symbol: tp.Mapping[str, tp.List[tp.Tuple[np.ndarray, tp.Optional[np.ndarray]]]],
) -> AtomicNetworks:
    num_layers = len(container.weights)
    new_weights = []
    new_biases = [] if container.biases is not None else None
    for li in range(num_layers):
        wstack = np.zeros(np.shape(container.weights[li]), dtype=np.float32)
        bstack = (
            np.zeros(np.shape(container.biases[li]), dtype=np.float32)
            if container.biases is not None
            else None
        )
        for si, sym in enumerate(container.symbols):
            w, b = per_symbol[sym][li]
            wt = np.asarray(w, dtype=np.float32).T  # (in, out)
            wstack[si, : wt.shape[0], : wt.shape[1]] = wt
            if bstack is not None and b is not None:
                bb = np.asarray(b, dtype=np.float32)
                bstack[si, : bb.shape[0]] = bb
        new_weights.append(jnp.asarray(wstack))
        if new_biases is not None:
            new_biases.append(jnp.asarray(bstack))
    return container.replace(
        weights=tuple(new_weights),
        biases=None if new_biases is None else tuple(new_biases),
    )


def _container_arrays(
    container: AtomicNetworks, prefix: str
) -> tp.Dict[str, np.ndarray]:
    """Export one container's ragged per-symbol layers in torch layout."""
    out: tp.Dict[str, np.ndarray] = {}
    num_layers = len(container.weights)
    for si, sym in enumerate(container.symbols):
        dims = container.layer_dims[si]
        for li in range(num_layers):
            w = np.asarray(container.weights[li][si])[: dims[li], : dims[li + 1]].T
            name = (
                f"{prefix}atomics.{sym}.final_layer"
                if li == num_layers - 1
                else f"{prefix}atomics.{sym}.layers.{li}"
            )
            out[f"{name}.weight"] = w
            if container.biases is not None:
                out[f"{name}.bias"] = np.asarray(
                    container.biases[li][si]
                )[: dims[li + 1]]
    return out


def save_state_dict(model: ANI) -> tp.Dict[str, np.ndarray]:
    """Export a model as a flat dict using the reference's torch key scheme.

    Inverse of `load_state_dict` (round-trippable); useful for interchange
    with the reference implementation and for ``.npz`` weight archives.
    """
    sd: tp.Dict[str, np.ndarray] = {
        "energy_shifter.self_energies": np.asarray(
            model.energy_shifter.self_energies
        ),
    }
    nnp = model.potentials["nnp"]
    aev = nnp.aev_computer
    prefix = "potentials.nnp.aev_computer."
    sd[prefix + "radial.eta"] = np.asarray(aev.radial.eta)
    sd[prefix + "radial.shifts"] = np.asarray(aev.radial.shifts)
    sd[prefix + "angular.eta"] = np.asarray(aev.angular.eta)
    sd[prefix + "angular.zeta"] = np.asarray(aev.angular.zeta)
    sd[prefix + "angular.shifts"] = np.asarray(aev.angular.shifts)
    sd[prefix + "angular.sections"] = np.asarray(aev.angular.sections)

    networks = nnp.neural_networks
    base = "potentials.nnp.neural_networks."
    if isinstance(networks, Ensemble):
        for e in range(networks.total_members_num):
            sd.update(_container_arrays(networks.member(e), f"{base}members.{e}."))
    else:
        sd.update(_container_arrays(networks, base))
    charge_nets = getattr(nnp, "charge_networks", None)
    if charge_nets is not None and hasattr(charge_nets, "layer_dims"):
        basec = "potentials.nnp.charge_networks."
        if isinstance(charge_nets, Ensemble):
            for e in range(charge_nets.total_members_num):
                sd.update(
                    _container_arrays(charge_nets.member(e), f"{basec}members.{e}.")
                )
        else:
            sd.update(_container_arrays(charge_nets, basec))

    for name, pot in model.potentials.items():
        if name == "nnp":
            continue
        for field in ("y_ab", "sqrt_alpha_ab", "k_rep_ab"):
            if getattr(pot, field, None) is not None:
                sd[f"potentials.{name}.{field}"] = np.asarray(getattr(pot, field))
    return sd


def load_state_dict(model: ANI, sd: tp.Mapping[str, np.ndarray]) -> ANI:
    """Return a copy of ``model`` with weights taken from a torch state dict.

    Accepts any checkpoint vintage: keys are first normalized through
    `canonicalize_torch_keys` (the reference's bw-compat remaps).
    """
    sd = canonicalize_torch_keys(sd)
    symbols = model.symbols
    pots = dict(model.potentials)
    nnp = pots["nnp"]

    # AEV constants
    aev = nnp.aev_computer
    prefix = "potentials.nnp.aev_computer."

    def grab(name, current):
        arr = sd.get(prefix + name)
        if arr is None:
            return current
        return jnp.asarray(np.asarray(arr, dtype=np.float32).reshape(np.shape(current)))

    radial = aev.radial.replace(
        eta=grab("radial.eta", aev.radial.eta),
        shifts=grab("radial.shifts", aev.radial.shifts),
    )
    angular = aev.angular.replace(
        eta=grab("angular.eta", aev.angular.eta),
        zeta=grab("angular.zeta", aev.angular.zeta),
        shifts=grab("angular.shifts", aev.angular.shifts),
        sections=grab("angular.sections", aev.angular.sections),
    )
    aev = aev.replace(radial=radial, angular=angular)

    # Networks
    networks = nnp.neural_networks
    base = "potentials.nnp.neural_networks."
    if isinstance(networks, Ensemble):
        members = []
        for e in range(networks.total_members_num):
            per_symbol = _network_arrays(sd, f"{base}members.{e}.", symbols)
            members.append(_fill_container(networks.member(e), per_symbol))
        networks = Ensemble.from_members(members).replace(
            active_members=networks.active_members
        )
    else:
        per_symbol = _network_arrays(sd, base, symbols)
        networks = _fill_container(networks, per_symbol)
    nnp_updates: tp.Dict[str, tp.Any] = dict(
        aev_computer=aev, neural_networks=networks
    )

    # Charge networks (ANIq models; reference ANImbis loads these under
    # potentials.nnp.charge_networks.*, models.py:236-252)
    charge_nets = getattr(nnp, "charge_networks", None)
    basec = "potentials.nnp.charge_networks."
    if charge_nets is not None and any(k.startswith(basec) for k in sd):
        if isinstance(charge_nets, Ensemble):
            members = []
            for e in range(charge_nets.total_members_num):
                per_symbol = _network_arrays(sd, f"{basec}members.{e}.", symbols)
                members.append(_fill_container(charge_nets.member(e), per_symbol))
            charge_nets = Ensemble.from_members(members).replace(
                active_members=charge_nets.active_members
            )
        else:
            charge_nets = _fill_container(
                charge_nets, _network_arrays(sd, basec, symbols)
            )
        nnp_updates["charge_networks"] = charge_nets
    pots["nnp"] = nnp.replace(**nnp_updates)

    # Extra pair potentials (xTB repulsion tables etc.)
    for name, pot in pots.items():
        if name == "nnp":
            continue
        updates = {}
        for field in ("y_ab", "sqrt_alpha_ab", "k_rep_ab"):
            arr = sd.get(f"potentials.{name}.{field}")
            if arr is not None and hasattr(pot, field):
                updates[field] = jnp.asarray(np.asarray(arr, dtype=np.float32))
        if updates:
            pots[name] = pot.replace(**updates)

    shifter = model.energy_shifter
    if "energy_shifter.self_energies" in sd:
        shifter = shifter.replace(
            self_energies=jnp.asarray(
                np.asarray(sd["energy_shifter.self_energies"], dtype=np.float32)
            )
        )
    return model.replace(potentials=pots, energy_shifter=shifter)
