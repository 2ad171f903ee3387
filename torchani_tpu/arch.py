"""Model core and declarative assembly.

TPU-native counterpart of ``/root/reference/torchani/arch.py``: the `ANI`
model pytree holds a dict of potentials (always including ``"nnp"``), an
energy shifter, and a species converter.  A single neighborlist is built at
the max cutoff and every potential consumes a mask-narrowed view of it
(reference ``arch.py:371-373``), so the hot loop is one pass over the
potentials dict.

Being a frozen pytree, the model is itself a jit argument:
``jax.jit(lambda m, s, c: m(s, c))(model, species, coords)`` recompiles only
when static structure changes (shapes, strategy, enabled set), not weights.
"""

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from torchani_tpu.aev import AEVComputer
from torchani_tpu.annotations import Array, Symbols
from torchani_tpu.neighbors import (
    Neighbors,
    NeighborlistArg,
    narrow_to_cutoff,
    parse_neighborlist,
)
from torchani_tpu.nn import AtomicNetworks, Ensemble, SpeciesConverter
from torchani_tpu.potentials.core import Potential
from torchani_tpu.potentials.nnp import NNPotential
from torchani_tpu.sae import SelfEnergy
from torchani_tpu.tuples import SpeciesEnergies, SpeciesEnergiesQBC

__all__ = ["ANI", "ANIq", "Assembler", "simple_ani", "simple_aniq"]


class ANI(struct.PyTreeNode):
    """An ANI-style model: potentials + self-energies + species conversion.

    Inputs are atomic numbers by default (``periodic_table_index=True``),
    shape ``(molecules, atoms)`` with -1 padding, and coordinates in Angstrom
    ``(molecules, atoms, 3)``; output molecular energies in Hartree.
    """

    potentials: tp.Dict[str, Potential]
    energy_shifter: SelfEnergy
    symbols: Symbols = struct.field(pytree_node=False)
    neighborlist: tp.Any = struct.field(pytree_node=False, default=None)
    periodic_table_index: bool = struct.field(pytree_node=False, default=True)

    # ---- properties ----
    @property
    def species_converter(self) -> SpeciesConverter:
        return SpeciesConverter(self.symbols)

    @property
    def cutoff(self) -> float:
        return max(p.cutoff for p in self.potentials.values() if p.enabled)

    @property
    def neural_networks(self):
        return self.potentials["nnp"].neural_networks

    @property
    def aev_computer(self) -> AEVComputer:
        return self.potentials["nnp"].aev_computer

    @property
    def num_species(self) -> int:
        return len(self.symbols)

    @property
    def atomic_numbers(self) -> tp.Tuple[int, ...]:
        return self.species_converter.atomic_numbers

    def set_enabled(self, name: str, enabled: bool = True) -> "ANI":
        pots = dict(self.potentials)
        pots[name] = pots[name].replace(enabled=enabled)
        return self.replace(potentials=pots)

    def to_infer_model(self, use_mnp: bool = False) -> "ANI":
        # Inference-optimized execution is the default on TPU (stacked
        # batched matmuls); kept for API parity.
        return self

    # ---- core computation ----
    def _convert(self, species: Array) -> Array:
        if not self.periodic_table_index:
            return species
        # Concrete species (the usual jit-closed-over or eager case) convert
        # on HOST so the element array STAYS concrete through the trace:
        # inside an active trace even a table lookup on a constant returns a
        # tracer, which would disable every trace-time specialization
        # downstream (present-species packed angular, static NN partition).
        if not isinstance(species, jax.core.Tracer):
            table = np.full((120,), -1, dtype=np.int32)
            for i, z in enumerate(self.species_converter.atomic_numbers):
                table[z] = i
            host = np.asarray(jax.device_get(species))
            conv = np.where(host >= 0, table[np.clip(host, 0, 119)], -1)
            # return a NUMPY array: under an active trace even
            # jnp.asarray(constant) returns a tracer, which would disable
            # the downstream trace-time specializations
            return conv.astype(np.int32)
        return self.species_converter(species)

    def __call__(
        self,
        species: Array,
        coords: tp.Optional[Array] = None,
        cell: tp.Optional[Array] = None,
        pbc: tp.Optional[Array] = None,
        charge: int = 0,
        atomic: bool = False,
        ensemble_values: bool = False,
    ) -> Array:
        """Total energies (Hartree), shape ``(molecules,)``.

        With ``atomic=True``: per-atom energies ``(molecules, atoms)``.
        With ``ensemble_values=True``: leading ensemble-member axis.
        Also accepts the reference's tuple calling convention
        ``model((species, coords), cell, pbc)`` (reference ``arch.py:302``).
        """
        if isinstance(species, (tuple, list)):
            # reference tuple convention: model((species, coords), cell, pbc)
            # — positional cell/pbc arrive shifted one slot right
            if coords is not None:
                if pbc is not None:
                    raise TypeError(
                        "With the (species, coords) tuple convention pass "
                        "cell/pbc positionally after the tuple or as keywords"
                    )
                cell, pbc = coords, cell
            species, coords = species
        if species.ndim != 2 or coords.shape != species.shape + (3,):
            raise ValueError(
                f"Expected species (molecules, atoms) and coords "
                f"(molecules, atoms, 3); got {species.shape} and {coords.shape}"
            )
        if charge != 0:
            raise ValueError("Model only supports neutral molecules")
        elem_idxs = self._convert(species)
        neighbors = self._neighborlist()(self.cutoff, elem_idxs, coords, cell, pbc)
        return self.compute_from_neighbors(
            elem_idxs, coords, neighbors, charge, atomic, ensemble_values
        ).energies

    def _neighborlist(self):
        if self.neighborlist is None:
            return parse_neighborlist("adaptive")
        return self.neighborlist

    def compute_from_neighbors(
        self,
        elem_idxs: Array,
        coords: tp.Optional[Array],
        neighbors: Neighbors,
        charge: int = 0,
        atomic: bool = False,
        ensemble_values: bool = False,
        ghost_flags: tp.Optional[Array] = None,
    ) -> SpeciesEnergies:
        energies = None
        for name, pot in sorted(self.potentials.items()):
            if not pot.enabled:
                continue
            pot_neighbors = (
                narrow_to_cutoff(neighbors, pot.cutoff)
                if pot.cutoff < self.cutoff
                else neighbors
            )
            e = pot.compute_from_neighbors(
                elem_idxs,
                coords,
                pot_neighbors,
                charge=charge,
                atomic=atomic,
                ensemble_values=ensemble_values,
                ghost_flags=ghost_flags,
            ).energies
            energies = e if energies is None else energies + e
        if self.energy_shifter.enabled:
            shift = self.energy_shifter(elem_idxs, atomic=atomic)
            energies = energies + shift
        return SpeciesEnergies(elem_idxs, energies)

    def compute_from_external_neighbors(
        self,
        species: Array,
        coords: tp.Optional[Array],
        neighbors: Neighbors,
        charge: int = 0,
        atomic: bool = False,
        ghost_flags: tp.Optional[Array] = None,
    ) -> SpeciesEnergies:
        """LAMMPS-style entry: caller owns the neighbor table.

        Analog of reference ``arch.py:171-206`` (domain-decomposition hook):
        ``ghost_flags`` marks ghost atoms whose pair energies are half-counted.
        """
        elem_idxs = self._convert(species)
        return self.compute_from_neighbors(
            elem_idxs, coords, neighbors, charge, atomic, False, ghost_flags
        )

    def ase(self, **kwargs):
        """Return an ASE calculator wrapping this model (reference
        ``arch.py`` ``ANI.ase()`` analog; requires the ``ase`` package)."""
        from torchani_tpu.ase import Calculator

        return Calculator(self, **kwargs)

    # ---- ensemble analytics ----
    def members_energies(
        self,
        species: Array,
        coords: Array,
        cell: tp.Optional[Array] = None,
        pbc: tp.Optional[Array] = None,
    ) -> Array:
        """Per-member energies, shape ``(E, molecules)``."""
        return self(species, coords, cell, pbc, ensemble_values=True)

    def atomic_energies(
        self,
        species: Array,
        coords: Array,
        cell: tp.Optional[Array] = None,
        pbc: tp.Optional[Array] = None,
        ensemble_values: bool = False,
    ) -> Array:
        return self(
            species, coords, cell, pbc, atomic=True, ensemble_values=ensemble_values
        )

    def energies_qbcs(
        self,
        species: Array,
        coords: Array,
        cell: tp.Optional[Array] = None,
        pbc: tp.Optional[Array] = None,
        unbiased: bool = True,
    ) -> SpeciesEnergiesQBC:
        """Energies and query-by-committee uncertainties.

        qbc = std over ensemble members / sqrt(num_atoms)
        (reference ``grad.py:376-380``).
        """
        elem_idxs = self._convert(species)
        member_energies = self(species, coords, cell, pbc, ensemble_values=True)
        num_atoms = jnp.sum(elem_idxs >= 0, axis=-1)
        ddof = 1 if unbiased else 0
        qbc = jnp.std(member_energies, axis=0, ddof=ddof) / jnp.sqrt(
            num_atoms.astype(member_energies.dtype)
        )
        return SpeciesEnergiesQBC(
            elem_idxs, jnp.mean(member_energies, axis=0), qbc
        )

    def atomic_stdev(
        self,
        species: Array,
        coords: Array,
        cell: tp.Optional[Array] = None,
        pbc: tp.Optional[Array] = None,
    ) -> Array:
        """Per-atom stdev over ensemble members."""
        atomic = self(species, coords, cell, pbc, atomic=True, ensemble_values=True)
        return jnp.std(atomic, axis=0, ddof=1)


class ANIq(ANI):
    """ANI-style model that also predicts (normalized) atomic charges.

    Counterpart of reference ``ANIq`` (``arch.py:579-692``): the ``"nnp"``
    potential is a `MergedChargesNNPotential` or
    `SeparateChargesNNPotential`; `energies_and_charges` returns both.
    """

    def compute_with_charges(
        self,
        species: Array,
        coords: Array,
        cell: tp.Optional[Array] = None,
        pbc: tp.Optional[Array] = None,
        charge: int = 0,
        atomic: bool = False,
        ensemble_values: bool = False,
    ):
        from torchani_tpu.tuples import EnergiesScalars

        if species.ndim != 2 or coords.shape != species.shape + (3,):
            raise ValueError(
                f"Expected species (molecules, atoms) and coords "
                f"(molecules, atoms, 3); got {species.shape} and {coords.shape}"
            )
        elem_idxs = self._convert(species)
        neighbors = self._neighborlist()(self.cutoff, elem_idxs, coords, cell, pbc)
        energies = None
        charges = None
        for name, pot in sorted(self.potentials.items()):
            if not pot.enabled:
                continue
            pot_neighbors = (
                narrow_to_cutoff(neighbors, pot.cutoff)
                if pot.cutoff < self.cutoff
                else neighbors
            )
            e, qs = pot.compute_from_neighbors(
                elem_idxs,
                coords,
                pot_neighbors,
                charge=charge,
                atomic=atomic,
                ensemble_values=ensemble_values,
            )
            energies = e if energies is None else energies + e
            if name == "nnp":
                charges = qs
        if self.energy_shifter.enabled:
            energies = energies + self.energy_shifter(elem_idxs, atomic=atomic)
        return EnergiesScalars(energies, charges)

    def __call__(
        self,
        species: Array,
        coords: Array,
        cell: tp.Optional[Array] = None,
        pbc: tp.Optional[Array] = None,
        charge: int = 0,
        atomic: bool = False,
        ensemble_values: bool = False,
    ) -> Array:
        return self.compute_with_charges(
            species, coords, cell, pbc, charge, atomic, ensemble_values
        ).energies

    def energies_and_charges(
        self,
        species: Array,
        coords: Array,
        cell: tp.Optional[Array] = None,
        pbc: tp.Optional[Array] = None,
        charge: int = 0,
    ):
        return self.compute_with_charges(species, coords, cell, pbc, charge)

    def atomic_charges(
        self,
        species: Array,
        coords: Array,
        cell: tp.Optional[Array] = None,
        pbc: tp.Optional[Array] = None,
        charge: int = 0,
    ) -> Array:
        return self.compute_with_charges(species, coords, cell, pbc, charge).scalars


def simple_aniq(
    symbols: tp.Sequence[str],
    lot: str = "wb97x-631gd",
    ensemble_size: int = 1,
    merge_charge_networks: bool = False,
    repulsion: bool = True,
    scale_charge_normalizer_weights: bool = True,
    normalize: bool = True,
    key: tp.Optional[jax.Array] = None,
    **kwargs,
) -> ANIq:
    """One-call charge-model builder (reference ``simple_aniq``,
    ``arch.py:1071-1180``): defaults mirror the reference — separate charge
    networks, charge-normalizer weights scaled by q^2."""
    from torchani_tpu.electro import ChargeNormalizer
    from torchani_tpu.nn import AtomicNetworks
    from torchani_tpu.potentials.nnp_charges import (
        MergedChargesNNPotential,
        SeparateChargesNNPotential,
    )

    base = simple_ani(
        symbols, lot, ensemble_size, repulsion=repulsion, key=key, **kwargs
    )
    nnp = base.potentials["nnp"]
    if normalize:
        normalizer = ChargeNormalizer.from_electronegativity_and_hardness(
            tuple(symbols),
            scale_weights_by_charges_squared=scale_charge_normalizer_weights,
        )
    else:
        # uniform weights, no electronegativity prior
        normalizer = ChargeNormalizer.make(tuple(symbols))
    if key is None:
        key = jax.random.PRNGKey(7)
    if merge_charge_networks:
        # rebuild networks with a 2-wide output head
        networks = AtomicNetworks.like_2x(
            tuple(symbols),
            in_dim=nnp.aev_computer.out_dim,
            out_dim=2,
            activation="gelu",
            bias=False,
            key=key,
        )
        if ensemble_size > 1:
            members = []
            for i in range(ensemble_size):
                key, sub = jax.random.split(key)
                members.append(
                    AtomicNetworks.like_2x(
                        tuple(symbols),
                        in_dim=nnp.aev_computer.out_dim,
                        out_dim=2,
                        activation="gelu",
                        bias=False,
                        key=sub,
                    )
                )
            networks = Ensemble.from_members(members)
        new_nnp = MergedChargesNNPotential.make(
            tuple(symbols), nnp.aev_computer, networks, normalizer
        )
    else:
        charge_networks = AtomicNetworks.like_2x(
            tuple(symbols),
            in_dim=nnp.aev_computer.out_dim,
            out_dim=1,
            activation="gelu",
            bias=False,
            key=key,
        )
        new_nnp = SeparateChargesNNPotential.make(
            tuple(symbols),
            nnp.aev_computer,
            nnp.neural_networks,
            charge_networks,
            normalizer,
        )
    pots = dict(base.potentials)
    pots["nnp"] = new_nnp
    return ANIq(
        potentials=pots,
        energy_shifter=base.energy_shifter,
        symbols=base.symbols,
        neighborlist=base.neighborlist,
        periodic_table_index=base.periodic_table_index,
    )


class Assembler:
    """Declarative builder for ANI-style models.

    Mirror of reference ``Assembler`` (``arch.py:695-1100``): set symbols,
    AEV terms, network constructor, self-energies and extra potentials, then
    ``assemble(ensemble_size)``.
    """

    def __init__(self, periodic_table_index: bool = True) -> None:
        self.periodic_table_index = periodic_table_index
        self.symbols: tp.Optional[Symbols] = None
        self._global_cutoff_fn = "smooth"
        self._aev_kwargs: tp.Dict[str, tp.Any] = {}
        self._aev: tp.Optional[AEVComputer] = None
        self._network_factory: tp.Optional[tp.Callable] = None
        self._self_energies: tp.Optional[tp.Sequence[float]] = None
        self._extra_potentials: tp.Dict[str, Potential] = {}
        self._neighborlist: NeighborlistArg = "adaptive"

    def set_symbols(self, symbols: tp.Sequence[str]) -> "Assembler":
        self.symbols = tuple(symbols)
        return self

    def set_global_cutoff_fn(self, cutoff_fn: str) -> "Assembler":
        self._global_cutoff_fn = cutoff_fn
        return self

    def set_aev_computer(
        self, radial: str = "ani2x", angular: tp.Optional[str] = None, **kwargs
    ) -> "Assembler":
        angular = angular if angular is not None else radial
        self._aev_kwargs = dict(radial=radial, angular=angular, **kwargs)
        return self

    def set_atomic_networks(
        self, ctor: str = "ani2x", cls: tp.Optional[type] = None, **kwargs
    ) -> "Assembler":
        """Pick the network-container factory.

        ``ctor`` names a constructor; with ``cls`` given, the same names
        resolve to classmethods of that class (reference
        ``Assembler.set_atomic_networks``, ``arch.py:824-836``) — e.g.
        ``cls=SingleNN, ctor="large"``.
        """
        if cls is not None:
            name = {
                "ani1x": "like_1x",
                "ani1ccx": "like_1x",
                "ani2x": "like_2x",
                "anidr": "like_dr",
                "aniala": "like_ala",
            }.get(ctor, ctor)
            factory = getattr(cls, name)
        else:
            factory = {
                "ani1x": AtomicNetworks.like_1x,
                "ani1ccx": AtomicNetworks.like_1x,
                "ani2x": AtomicNetworks.like_2x,
                "anidr": AtomicNetworks.like_dr,
                "aniala": AtomicNetworks.like_ala,
            }[ctor]
        self._network_factory = lambda symbols, in_dim, key: factory(
            symbols, in_dim, key=key, **kwargs
        )
        return self

    def set_gsaes_as_self_energies(self, lot: str) -> "Assembler":
        self._lot = lot
        self._self_energies = None
        return self

    def set_self_energies(self, self_energies: tp.Sequence[float]) -> "Assembler":
        self._self_energies = tuple(self_energies)
        return self

    def set_neighborlist(self, neighborlist: NeighborlistArg) -> "Assembler":
        self._neighborlist = neighborlist
        return self

    def add_potential(self, name: str, potential: Potential) -> "Assembler":
        self._extra_potentials[name] = potential
        return self

    def assemble(
        self, ensemble_size: int = 1, key: tp.Optional[jax.Array] = None
    ) -> ANI:
        # Model construction is eager (many tiny PRNG/constant ops).  On an
        # accelerator backend each eager op compiles+dispatches individually
        # — minutes over this environment's tunneled TPU — so build on the
        # host CPU; the (uncommitted) arrays migrate to the accelerator at
        # first jitted use with no semantic difference.
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if cpu:
            with jax.default_device(cpu[0]):
                return self._assemble(ensemble_size, key)
        return self._assemble(ensemble_size, key)

    def _assemble(
        self, ensemble_size: int = 1, key: tp.Optional[jax.Array] = None
    ) -> ANI:
        if self.symbols is None:
            raise ValueError("Symbols must be set before assembling")
        if key is None:
            key = jax.random.PRNGKey(0)
        aev = AEVComputer.make(
            num_species=len(self.symbols),
            cutoff_fn=self._global_cutoff_fn,
            **{
                k: (
                    v
                    if k not in ("radial", "angular")
                    else _term_with_cutoff_fn(k, v, self._global_cutoff_fn)
                )
                for k, v in self._aev_kwargs.items()
            },
        )
        if self._network_factory is None:
            self.set_atomic_networks("ani2x")
        members = []
        for i in range(ensemble_size):
            key, sub = jax.random.split(key)
            members.append(self._network_factory(self.symbols, aev.out_dim, sub))
        if ensemble_size == 1:
            networks = members[0]
        elif isinstance(members[0], AtomicNetworks):
            networks = Ensemble.from_members(members)
        else:
            # SingleNN/shared containers: stacked-pytree vmap ensemble
            from torchani_tpu.nn import GenericEnsemble

            networks = GenericEnsemble.from_members(members)
        if self._self_energies is not None:
            shifter = SelfEnergy.make(self.symbols, self._self_energies)
        elif getattr(self, "_lot", None):
            shifter = SelfEnergy.from_lot(self.symbols, self._lot)
        else:
            shifter = SelfEnergy.make(self.symbols, [0.0] * len(self.symbols))
        potentials: tp.Dict[str, Potential] = {
            "nnp": NNPotential.make(self.symbols, aev, networks)
        }
        potentials.update(self._extra_potentials)
        return ANI(
            potentials=potentials,
            energy_shifter=shifter,
            symbols=self.symbols,
            neighborlist=parse_neighborlist(self._neighborlist),
            periodic_table_index=self.periodic_table_index,
        )


def _term_with_cutoff_fn(kind: str, term: str, cutoff_fn: str):
    from torchani_tpu.aev.terms import ANIAngular, ANIRadial

    table = {
        ("radial", "ani1x"): lambda: ANIRadial.like_1x(cutoff_fn),
        ("radial", "ani1ccx"): lambda: ANIRadial.like_1x(cutoff_fn),
        ("radial", "ani2x"): lambda: ANIRadial.like_2x(cutoff_fn),
        ("angular", "ani1x"): lambda: ANIAngular.like_1x(cutoff_fn),
        ("angular", "ani1ccx"): lambda: ANIAngular.like_1x(cutoff_fn),
        ("angular", "ani2x"): lambda: ANIAngular.like_2x(cutoff_fn),
    }
    if isinstance(term, str):
        return table[(kind, term)]()
    return term


def simple_ani(
    symbols: tp.Sequence[str],
    lot: str = "wb97x-631gd",
    ensemble_size: int = 1,
    radial_start: float = 0.9,
    angular_start: float = 0.9,
    radial_cutoff: float = 5.2,
    angular_cutoff: float = 3.5,
    radial_shifts: int = 16,
    angular_shifts: int = 8,
    sections: int = 4,
    radial_precision: float = 19.7,
    angular_precision: float = 12.5,
    angular_zeta: float = 14.1,
    cutoff_fn: str = "smooth",
    repulsion: bool = True,
    dispersion: bool = False,
    container: str = "ANINetworks",
    container_ctor: str = "default",
    activation: str = "gelu",
    bias: bool = False,
    neighborlist: NeighborlistArg = "all_pairs",
    repulsion_cutoff: bool = True,
    key: tp.Optional[jax.Array] = None,
) -> ANI:
    """One-call model builder with the reference's defaults
    (``arch.py:992-1069``): ANI-2x-like AEV with smooth cutoff, gelu/no-bias
    networks, xTB repulsion enveloped at the radial cutoff.  ``container``
    selects the network family ("ANINetworks", "SingleNN",
    "ANISharedNetworks") and ``container_ctor`` its constructor (e.g.
    "large" for the SnnANI2xr head).
    """
    from torchani_tpu.aev.terms import ANIAngular, ANIRadial

    asm = Assembler(periodic_table_index=True)
    asm.set_symbols(symbols)
    asm.set_global_cutoff_fn(cutoff_fn)
    asm.set_aev_computer(
        radial=ANIRadial.cover_linearly(
            start=radial_start,
            cutoff=radial_cutoff,
            eta=radial_precision,
            num_shifts=radial_shifts,
            cutoff_fn=cutoff_fn,
        ),
        angular=ANIAngular.cover_linearly(
            start=angular_start,
            cutoff=angular_cutoff,
            eta=angular_precision,
            zeta=angular_zeta,
            num_shifts=angular_shifts,
            num_sections=sections,
            cutoff_fn=cutoff_fn,
        ),
    )
    if container == "ANINetworks":
        # the reference's "default" ANINetworks ctor is like_2x with the
        # passed activation/bias (reference nn/_containers.py:535-544)
        ctor = "ani2x" if container_ctor == "default" else container_ctor
        asm.set_atomic_networks(ctor=ctor, activation=activation, bias=bias)
    else:
        from torchani_tpu.nn import ANISharedNetworks, SingleNN

        cls = {"SingleNN": SingleNN, "ANISharedNetworks": ANISharedNetworks}[
            container
        ]
        asm.set_atomic_networks(
            ctor=container_ctor, cls=cls, activation=activation, bias=bias
        )
    asm.set_neighborlist(neighborlist)
    asm.set_gsaes_as_self_energies(lot)
    if repulsion:
        from torchani_tpu.potentials.repulsion import RepulsionXTB

        asm.add_potential(
            "repulsion_xtb",
            RepulsionXTB.make(
                tuple(symbols),
                cutoff=radial_cutoff if repulsion_cutoff else math.inf,
                cutoff_fn=cutoff_fn,
            ),
        )
    if dispersion:
        from torchani_tpu.potentials.dispersion import TwoBodyDispersionD3

        asm.add_potential(
            "dispersion_d3",
            TwoBodyDispersionD3.make(
                tuple(symbols), functional=lot.split("-")[0], cutoff=8.0
            ),
        )
    return asm.assemble(ensemble_size, key=key)
