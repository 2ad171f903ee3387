"""Parsers for the original NeuroChem (ANI-1) file formats.

Counterpart of ``/root/reference/torchani/neurochem.py:40-510``: loads
``.params`` AEV constants, ``sae_linfit.dat`` self energies, and bz2
-compressed ``.nnf`` network specs with ``.wparam``/``.bparam`` binary
weights — producing TPU-native model components.  Enables loading the
published NeuroChem model-zoo directories (ANI-1x/1ccx/2x ensembles).
"""

import bz2
import struct as _struct
import typing as tp
from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from torchani_tpu.aev import AEVComputer, ANIAngular, ANIRadial
from torchani_tpu.nn import AtomicNetworks, Ensemble
from torchani_tpu.sae import SelfEnergy

__all__ = [
    "NeurochemParseError",
    "AEVConstants",
    "load_aev_constants_and_symbols",
    "load_aev_computer_and_symbols",
    "load_sae",
    "load_atomic_networks",
    "load_atomic_network",
    "load_member",
    "load_ensemble",
    "load_model_from_info",
    "load_model_from_info_file",
    "load_model_from_name",
    "modules_from_info",
    "modules_from_info_file",
    "modules_from_model_name",
    "model_dir_from_prefix",
    "download_model_parameters",
    "NeurochemInfo",
    "NeurochemLayerSpec",
]


class NeurochemParseError(RuntimeError):
    pass


@dataclass
class AEVConstants:
    radial_cutoff: float
    radial_eta: float
    radial_shifts: tp.Tuple[float, ...]
    angular_cutoff: float
    angular_eta: float
    angular_zeta: float
    angular_shifts: tp.Tuple[float, ...]
    sections: tp.Tuple[float, ...]


def _parse_bracket_list(value: str) -> tp.List[str]:
    return [x.strip() for x in value.replace("[", "").replace("]", "").split(",")]


def load_aev_constants_and_symbols(
    consts_file,
) -> tp.Tuple[AEVConstants, tp.Tuple[str, ...]]:
    """Parse a ``.params`` AEV-constants file (e.g. ``rHCNO-5.2R_16-...params``)."""
    floats: tp.Dict[str, float] = {}
    seqs: tp.Dict[str, tp.Tuple[float, ...]] = {}
    symbols: tp.Tuple[str, ...] = ()
    try:
        with open(consts_file, "rt") as f:
            for raw in f:
                if "=" not in raw:
                    continue
                name, value = (x.strip() for x in raw.split("=", 1))
                if name in ("Rcr", "Rca"):
                    floats[name] = float(value)
                elif name in ("EtaR", "Zeta", "EtaA"):
                    vals = [float(x) for x in _parse_bracket_list(value)]
                    if len(vals) != 1:
                        raise NeurochemParseError(
                            f"Only single {name} supported, got {vals}"
                        )
                    floats[name] = vals[0]
                elif name in ("ShfR", "ShfZ", "ShfA"):
                    seqs[name] = tuple(float(x) for x in _parse_bracket_list(value))
                elif name == "Atyp":
                    symbols = tuple(_parse_bracket_list(value))
    except NeurochemParseError:
        raise
    except Exception as e:
        raise NeurochemParseError(f"Unable to parse const file {consts_file}") from e
    return (
        AEVConstants(
            radial_cutoff=floats["Rcr"],
            radial_eta=floats["EtaR"],
            radial_shifts=seqs["ShfR"],
            angular_cutoff=floats["Rca"],
            angular_eta=floats["EtaA"],
            angular_zeta=floats["Zeta"],
            angular_shifts=seqs["ShfA"],
            sections=seqs["ShfZ"],
        ),
        symbols,
    )


def load_aev_computer_and_symbols(
    consts_file, cutoff_fn: str = "cosine", **kwargs
) -> tp.Tuple[AEVComputer, tp.Tuple[str, ...]]:
    """Build an `AEVComputer` from a ``.params`` file."""
    c, symbols = load_aev_constants_and_symbols(consts_file)
    aev = AEVComputer.make(
        radial=ANIRadial.make(
            c.radial_eta, c.radial_shifts, c.radial_cutoff, cutoff_fn
        ),
        angular=ANIAngular.make(
            c.angular_eta,
            c.angular_zeta,
            c.angular_shifts,
            c.sections,
            c.angular_cutoff,
            cutoff_fn,
        ),
        num_species=len(symbols),
        **kwargs,
    )
    return aev, symbols


def load_sae(filename) -> SelfEnergy:
    """Parse a NeuroChem ``sae_linfit.dat`` self-energy file."""
    entries = []
    with open(Path(filename), "rt", encoding="utf-8") as f:
        for raw in f:
            if "=" not in raw:
                continue
            left, value = (x.strip() for x in raw.split("=", 1))
            symbol, idx = (x.strip() for x in left.split(","))
            entries.append((int(idx), symbol, float(value)))
    entries.sort()
    return SelfEnergy.make(
        [s for _, s, _ in entries], [e for _, _, e in entries]
    )


@dataclass
class _LayerSpec:
    nodes: int
    activation: int
    weights: str
    weight_numel: int
    biases: str
    bias_numel: int


def _decompress_nnf(buffer_: bytes) -> str:
    while buffer_ and buffer_[0] != ord("="):
        buffer_ = buffer_[1:]
    buffer_ = buffer_[2:]
    return bz2.decompress(buffer_)[:-1].decode("ascii").strip()


def _parse_nnf(nnf_str: str) -> tp.List[_LayerSpec]:
    """Parse the (already decompressed) .nnf layer-spec text.

    The format is a sequence of ``layer [ key=value; ... ]`` blocks; values of
    interest are ``nodes``, ``activation`` and the FILE references to the
    weight/bias blobs with their element counts.
    """
    import re

    specs: tp.List[_LayerSpec] = []
    blocks = nnf_str.replace("\n", "").replace("$", "").split("layer")[1:]
    for block in blocks:
        fields: tp.Dict[str, str] = {}
        for m in re.finditer(r"(\w+)\s*=\s*(FILE:\s*[^;]+|[^;\]]+);", block):
            fields[m.group(1)] = m.group(2).strip()
        files = re.findall(r"FILE:\s*([\w\.\-]+)\[(\d+)\]", block)
        wfile = bfile = ""
        wnum = bnum = 0
        for fname, numel in files:
            if fname.endswith(".wparam"):
                wfile, wnum = fname, int(numel)
            elif fname.endswith(".bparam"):
                bfile, bnum = fname, int(numel)
        specs.append(
            _LayerSpec(
                nodes=int(fields["nodes"]),
                activation=int(fields.get("activation", -1)),
                weights=wfile,
                weight_numel=wnum,
                biases=bfile,
                bias_numel=bnum,
            )
        )
    return specs


def _load_param_file(path: Path, numel: int) -> np.ndarray:
    raw = path.read_bytes()
    floats = _struct.unpack(f"{numel}f", raw[: numel * 4])
    return np.asarray(floats, dtype=np.float32)


def _activation_name(index: int) -> str:
    # NeuroChem activation table: 9 = CELU(0.1), 6 = linear (output layer)
    if index == 9:
        return "celu"
    raise NeurochemParseError(f"Unsupported activation index {index}")


def load_atomic_networks(
    network_dir, symbols: tp.Sequence[str], in_dim: int
) -> AtomicNetworks:
    """Load one member's per-element networks from a ``networks/`` dir.

    Expects ``ANN-{symbol}.nnf`` plus the referenced ``.wparam/.bparam``
    blobs, as in the published NeuroChem model zoo.
    """
    network_dir = Path(network_dir)
    per_symbol: tp.Dict[str, tp.List[tp.Tuple[np.ndarray, np.ndarray]]] = {}
    layer_dims: tp.List[tp.Tuple[int, ...]] = []
    activation = "celu"
    for sym in symbols:
        nnf_path = network_dir / f"ANN-{sym}.nnf"
        specs = _parse_nnf(_decompress_nnf(nnf_path.read_bytes()))
        layers = []
        dims = [in_dim]
        prev = in_dim
        for i, spec in enumerate(specs):
            w = _load_param_file(
                network_dir / spec.weights, spec.weight_numel
            ).reshape(spec.nodes, prev)
            b = _load_param_file(network_dir / spec.biases, spec.bias_numel)
            layers.append((w, b))
            dims.append(spec.nodes)
            prev = spec.nodes
            if i < len(specs) - 1 and spec.activation >= 0:
                activation = _activation_name(spec.activation)
        per_symbol[sym] = layers
        layer_dims.append(tuple(dims))
    container = AtomicNetworks.from_layer_dims(
        tuple(symbols), tuple(layer_dims), activation=activation, bias=True
    )
    from torchani_tpu.convert import _fill_container

    return _fill_container(container, per_symbol)


def load_member(model_dir, consts_file) -> tp.Tuple[AEVComputer, AtomicNetworks, tp.Tuple[str, ...]]:
    """Load (aev_computer, networks, symbols) for one ensemble member dir."""
    aev, symbols = load_aev_computer_and_symbols(consts_file)
    networks = load_atomic_networks(Path(model_dir) / "networks", symbols, aev.out_dim)
    return aev, networks, symbols


def load_model_from_info(info_file, model_index: tp.Optional[int] = None):
    """Build a full ANI model from a NeuroChem ``.info`` file.

    The info file names (in order): the ``.params`` constants file, the
    ``sae_linfit.dat`` file, the ensemble prefix dir and the ensemble size.
    """
    info_file = Path(info_file)
    lines = [
        line.strip()
        for line in info_file.read_text().splitlines()
        if line.strip()
    ]
    root = info_file.parent
    consts_file = root / lines[0]
    sae_file = root / lines[1]
    prefix = root / lines[2]
    size = int(lines[3])

    aev, symbols = load_aev_computer_and_symbols(consts_file)
    shifter = load_sae(sae_file)
    members = []
    idxs = range(size) if model_index is None else [model_index]
    for i in idxs:
        net_dir = Path(f"{prefix}{i}") / "networks"
        members.append(load_atomic_networks(net_dir, symbols, aev.out_dim))
    networks = members[0] if len(members) == 1 else Ensemble.from_members(members)

    from torchani_tpu.arch import ANI
    from torchani_tpu.potentials.nnp import NNPotential

    return ANI(
        potentials={"nnp": NNPotential.make(symbols, aev, networks)},
        energy_shifter=shifter,
        symbols=tuple(symbols),
    )


# ---- reference-parity entry points -----------------------------------------


def model_dir_from_prefix(prefix, idx: int) -> Path:
    """Network dir of the idx-th ensemble member (reference
    ``neurochem.py:40-42``)."""
    prefix = Path(prefix)
    return (prefix.parent / f"{prefix.name}{idx}") / "networks"


def _single_nnf_layers(
    nnf_path: Path,
) -> tp.Tuple[tp.List[tp.Tuple[np.ndarray, np.ndarray]], tp.List[int], str]:
    """(layers, dims, activation) of one ``.nnf`` network file."""
    nnf_path = Path(nnf_path)
    specs = _parse_nnf(_decompress_nnf(nnf_path.read_bytes()))
    in_dim = specs[0].weight_numel // specs[0].nodes
    layers = []
    dims = [in_dim]
    prev = in_dim
    activation = "celu"
    for i, spec in enumerate(specs):
        w = _load_param_file(
            nnf_path.parent / spec.weights, spec.weight_numel
        ).reshape(spec.nodes, prev)
        b = _load_param_file(nnf_path.parent / spec.biases, spec.bias_numel)
        layers.append((w, b))
        dims.append(spec.nodes)
        prev = spec.nodes
        if i < len(specs) - 1 and spec.activation >= 0:
            activation = _activation_name(spec.activation)
    return layers, dims, activation


def load_atomic_network(filename):
    """Load one element's MLP from a ``.nnf`` file as an
    `torchani_tpu.nn.AtomicNetwork` (reference ``neurochem.py:226-302``)."""
    from torchani_tpu.nn import AtomicNetwork

    layers, dims, activation = _single_nnf_layers(Path(filename))
    # NeuroChem stores torch-layout (out, in) weights; AtomicNetwork uses
    # (in, out) matmul layout
    return AtomicNetwork(
        weights=tuple(jnp.asarray(w.T) for w, _ in layers),
        biases=tuple(jnp.asarray(b) for _, b in layers),
        activation=activation,
    )


def _reference_load_member(symbols: tp.Sequence[str], networks_dir) -> AtomicNetworks:
    networks_dir = Path(networks_dir)
    first = _single_nnf_layers(networks_dir / f"ANN-{symbols[0]}.nnf")
    in_dim = first[1][0]
    return load_atomic_networks(networks_dir, symbols, in_dim)


def load_ensemble(symbols: tp.Sequence[str], prefix, count: int) -> Ensemble:
    """Load an ensemble from NeuroChem member dirs sharing a prefix
    (reference ``neurochem.py:320-337``)."""
    members = [
        _reference_load_member(symbols, model_dir_from_prefix(prefix, i))
        for i in range(count)
    ]
    return Ensemble.from_members(members)


@dataclass
class NeurochemInfo:
    """Paths parsed from a NeuroChem ``.info`` file (reference
    ``neurochem.py:340-370``)."""

    const: Path
    sae: Path
    ensemble_prefix: Path
    ensemble_size: int

    @classmethod
    def from_info_file(cls, info_file_path) -> "NeurochemInfo":
        info_file_path = Path(info_file_path)
        lines = [
            ln.strip()
            for ln in info_file_path.read_text().splitlines()
            if ln.strip()
        ][:4]
        root = info_file_path.parent
        return cls(
            const=root / lines[0],
            sae=root / lines[1],
            ensemble_prefix=root / lines[2],
            ensemble_size=int(lines[3]),
        )


def modules_from_info(
    info: NeurochemInfo,
    model_index: tp.Optional[int] = None,
    strategy: str = "auto",
):
    """(aev_computer, container, self_energy, symbols) from parsed info
    (reference ``neurochem.py:392-420``)."""
    aev, symbols = load_aev_computer_and_symbols(info.const)
    if strategy != "auto":
        aev = aev.set_strategy(strategy)
    shifter = load_sae(info.sae)
    if model_index is None:
        container = load_ensemble(symbols, info.ensemble_prefix, info.ensemble_size)
    else:
        container = _reference_load_member(
            symbols, model_dir_from_prefix(info.ensemble_prefix, model_index)
        )
    return aev, container, shifter, symbols


def modules_from_info_file(
    info_file, model_index: tp.Optional[int] = None, strategy: str = "auto"
):
    """`modules_from_info` over a ``.info`` file path."""
    return modules_from_info(
        NeurochemInfo.from_info_file(info_file), model_index, strategy
    )


#: Reference-name alias of `load_model_from_info`.
def load_model_from_info_file(info_file, model_index: tp.Optional[int] = None):
    return load_model_from_info(info_file, model_index)


def download_model_parameters(root=None, verbose: bool = True) -> None:
    """Unavailable here: this build runs without network egress (reference
    downloads the ani-model-zoo, ``neurochem.py:373-389``).  Place the zoo
    under `torchani_tpu.paths.neurochem_dir` instead."""
    from torchani_tpu.paths import neurochem_dir

    root = Path(root) if root is not None else neurochem_dir()
    if root.exists() and any(root.iterdir()):
        if verbose:
            print("Found existing files in directory, assuming params present")
        return
    raise RuntimeError(
        "download_model_parameters is unavailable in this environment (no "
        f"network egress). Place the ani-model-zoo files under {root} instead."
    )


def modules_from_model_name(name: str, model_index: tp.Optional[int] = None):
    """Resolve a published model name (e.g. ``ani-2x_8x``) against the local
    NeuroChem zoo dir (reference ``neurochem.py`` download path)."""
    from torchani_tpu.paths import neurochem_dir

    root = neurochem_dir()
    candidates = [
        root / f"{name}.info",
        root / name / f"{name}.info",
        root / "ani-model-zoo-ani-2x" / "resources" / f"{name}.info",
    ]
    for c in candidates:
        if c.is_file():
            return modules_from_info_file(c, model_index)
    raise FileNotFoundError(
        f"No NeuroChem info file for {name!r} under {root} (no network "
        "egress; place the ani-model-zoo files there manually)"
    )


def load_model_from_name(name: str, model_index: tp.Optional[int] = None):
    """Build a full ANI model from a published model name resolved locally."""
    from torchani_tpu.paths import neurochem_dir

    root = neurochem_dir()
    for c in (
        root / f"{name}.info",
        root / name / f"{name}.info",
        root / "ani-model-zoo-ani-2x" / "resources" / f"{name}.info",
    ):
        if c.is_file():
            return load_model_from_info(c, model_index)
    raise FileNotFoundError(
        f"No NeuroChem info file for {name!r} under {root}"
    )


#: Reference dataclass name for the ``.nnf`` layer spec.
NeurochemLayerSpec = _LayerSpec
