"""Generate golden parity data by running the reference implementation.

The reference's own golden files (NeuroChem pickles for 97 GDB molecules)
are not present in this environment (broken download symlinks), so we follow
the same strategy one level up: run the *reference TorchANI* itself (pure
Python paths, CPU) on deterministic random molecules and record inputs,
weights and outputs.  Tests then check the TPU build against these files
without importing torch.

Run:  python tools/make_goldens.py
"""

import sys
from pathlib import Path

import numpy as np


def _ensure_ref_stubs() -> None:
    """Create minimal stubs for packages the reference imports but this
    environment lacks (typer for its CLI; parameterized for _testing)."""
    stub_root = Path("/tmp/refstub")
    typer = stub_root / "typer"
    typer.mkdir(parents=True, exist_ok=True)
    (typer / "__init__.py").write_text(
        "class Typer:\n"
        "    def __init__(self, *a, **k): pass\n"
        "    def command(self, *a, **k):\n"
        "        def deco(f): return f\n"
        "        return deco\n"
        "    def callback(self, *a, **k):\n"
        "        def deco(f): return f\n"
        "        return deco\n"
        "    def add_typer(self, *a, **k): pass\n"
        "    def __call__(self, *a, **k): pass\n"
        "def Argument(*a, **k): return None\n"
        "def Option(*a, **k): return None\n"
        "class Abort(Exception): pass\n"
    )
    param = stub_root / "parameterized"
    param.mkdir(parents=True, exist_ok=True)
    (param / "__init__.py").write_text(
        "def parameterized_class(*a, **k):\n"
        "    def deco(cls): return cls\n"
        "    return deco\n"
        "class parameterized:\n"
        "    @staticmethod\n"
        "    def expand(*a, **k):\n"
        "        def deco(f): return f\n"
        "        return deco\n"
    )


_ensure_ref_stubs()
sys.path.insert(0, "/tmp/refstub")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import warnings  # noqa: E402

warnings.filterwarnings("ignore")

import torch  # noqa: E402
import torchani  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tests" / "resources"
OUT.mkdir(parents=True, exist_ok=True)

SEED = 1234


def random_molecules(rng, num, max_atoms, znums=(1, 6, 7, 8)):
    species = np.full((num, max_atoms), -1, dtype=np.int64)
    coords = np.zeros((num, max_atoms, 3), dtype=np.float32)
    for i in range(num):
        n = rng.randint(3, max_atoms + 1)
        species[i, :n] = rng.choice(znums, size=n)
        coords[i, :n] = rng.rand(n, 3) * 4.0
    return species, coords


def make_aev_goldens():
    """AEV values for like_1x (cosine) and like_2x (cosine) computers."""
    rng = np.random.RandomState(SEED)
    species, coords = random_molecules(rng, 8, 12)
    out = {"species": species, "coords": coords}
    for name, aevc, conv in (
        ("aev1x", torchani.AEVComputer.like_1x(), (1, 6, 7, 8)),
        ("aev2x", torchani.AEVComputer.like_2x(), (1, 6, 7, 8, 16, 9, 17)),
    ):
        table = np.full(120, -1, dtype=np.int64)
        for i, z in enumerate(conv):
            table[z] = i
        elem = np.where(species >= 0, table[np.clip(species, 0, 119)], -1)
        with torch.no_grad():
            aevs = aevc(torch.tensor(elem), torch.tensor(coords)).numpy()
        out[f"{name}_elem"] = elem
        out[f"{name}_values"] = aevs
    np.savez_compressed(OUT / "aev_goldens.npz", **out)
    print("wrote aev_goldens.npz")


def make_aev_pbc_goldens():
    """AEV values under PBC with a tight cell (images matter)."""
    rng = np.random.RandomState(SEED + 1)
    num, a = 4, 10
    species = rng.choice([0, 1, 2, 3], size=(num, a)).astype(np.int64)
    cell = np.eye(3, dtype=np.float32) * 6.0
    cell[1, 0] = 1.0  # mild triclinicity
    coords = (rng.rand(num, a, 3).astype(np.float32) - 0.2) @ cell
    aevc = torchani.AEVComputer.like_1x()
    pbc = torch.tensor([True, True, True])
    # NOTE: the reference's batched-PBC path is silently broken (its
    # _all_pairs_pbc indices lack per-molecule offsets, so molecules 1+ use
    # molecule 0's geometry) — generate goldens one molecule at a time.
    chunks = []
    with torch.no_grad():
        for m in range(num):
            chunks.append(
                aevc(
                    torch.tensor(species[m: m + 1]),
                    torch.tensor(coords[m: m + 1]),
                    cell=torch.tensor(cell),
                    pbc=pbc,
                ).numpy()
            )
    aevs = np.concatenate(chunks, axis=0)
    np.savez_compressed(
        OUT / "aev_pbc_goldens.npz",
        species=species,
        coords=coords,
        cell=cell,
        values=aevs,
    )
    print("wrote aev_pbc_goldens.npz")


def make_model_goldens():
    """simple_ani (ensemble 2) energies/forces + its full state dict."""
    torch.manual_seed(SEED)
    ref = torchani.arch.simple_ani(("H", "C", "N", "O"), lot="wb97x-631gd", ensemble_size=2)
    ref.eval()
    sd = {f"sd.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(SEED + 2)
    species, coords = random_molecules(rng, 6, 10)
    ts = torch.tensor(species)
    tc = torch.tensor(coords, requires_grad=True)
    energies = ref((ts, tc)).energies
    forces = -torch.autograd.grad(energies.sum(), tc)[0]
    with torch.no_grad():
        atomic = ref((ts, torch.tensor(coords)), atomic=True).energies.numpy()
        members = ref((ts, torch.tensor(coords)), ensemble_values=True).energies.numpy()
    np.savez_compressed(
        OUT / "model_goldens.npz",
        species=species,
        coords=coords,
        energies=energies.detach().numpy(),
        forces=forces.detach().numpy(),
        atomic=atomic,
        members=members,
        **sd,
    )
    print("wrote model_goldens.npz")


def make_potential_goldens():
    """Pair-potential energies/forces on random molecules (xTB/ZBL/D3/LJ/Coulomb)."""
    from torchani.potentials import (
        DispersionLJ,
        FixedCoulomb,
        FixedMNOK,
        LennardJones,
        RepulsionLJ,
        RepulsionXTB,
        RepulsionZBL,
        TwoBodyDispersionD3,
    )

    rng = np.random.RandomState(SEED + 3)
    species, coords = random_molecules(rng, 4, 8)
    table = np.full(120, -1, dtype=np.int64)
    for i, z in enumerate((1, 6, 7, 8)):
        table[z] = i
    elem = np.where(species >= 0, table[np.clip(species, 0, 119)], -1)
    out = {"species": species, "coords": coords, "elem": elem}
    sym = ("H", "C", "N", "O")
    charges = (0.2, -0.3, -0.4, 0.5)
    etas = (0.9, 0.8, 0.7, 0.6)
    for name, pot in (
        ("xtb", RepulsionXTB(sym, cutoff=5.2)),
        ("zbl", RepulsionZBL(sym, cutoff=5.2)),
        ("xtb_inf", RepulsionXTB(sym)),
        ("d3", TwoBodyDispersionD3.from_functional(sym, "wb97x", cutoff=8.0)),
        ("d3_inf", TwoBodyDispersionD3.from_functional(sym, "b973c")),
        ("lj", LennardJones.ff19SB(sym, cutoff=6.0)),
        ("lj_rep", RepulsionLJ.ff19SB(sym)),
        ("lj_disp", DispersionLJ.ff19SB(sym)),
        ("coulomb", FixedCoulomb(sym, dielectric=2.0, charges=charges, cutoff=6.0)),
        ("mnok", FixedMNOK(sym, charges=charges, eta=etas)),
    ):
        tc = torch.tensor(coords, requires_grad=True)
        e = pot(torch.tensor(elem), tc, atomic_nums_input=False)
        f = -torch.autograd.grad(e.sum(), tc)[0]
        # NOTE: reference Potential.forward(atomic=True) silently routes the
        # flag into the `charge` positional of compute_from_neighbors, so
        # per-atom energies must be requested via compute_from_neighbors.
        from torchani.neighbors import all_pairs as ref_all_pairs

        with torch.no_grad():
            nbrs = ref_all_pairs(
                pot.cutoff if pot.cutoff != float("inf") else float("inf"),
                torch.tensor(elem),
                torch.tensor(coords),
            )
            atomic = pot.compute_from_neighbors(
                torch.tensor(elem), torch.tensor(coords), nbrs, atomic=True
            ).energies.numpy()
        out[f"{name}_energies"] = e.detach().numpy()
        out[f"{name}_forces"] = f.detach().numpy()
        out[f"{name}_atomic"] = atomic
    np.savez_compressed(OUT / "potential_goldens.npz", **out)
    print("wrote potential_goldens.npz")


def make_acceptance_goldens():
    """Repackage the reference's OWN shipped potential goldens.

    ``/root/reference/tests/resources/potentials/*.pkl`` hold expected
    energies/forces for `make_molecs(10, 10, seed=1234)` molecules
    (reference ``test_potentials_acceptance.py``).  We reproduce the exact
    inputs with the reference's factory and bundle inputs + expectations.
    """
    import pickle

    from torchani.constants import ATOMIC_NUMBER
    from torchani.utils import SYMBOLS_2X

    def ref_make_molecs(molecs_num, atoms_num, symbols, seed):
        # exact reimplementation of torchani._testing.make_molecs sampling
        # (the module itself needs 'expecttest', absent here)
        rng = torch.Generator(device="cpu")
        rng.manual_seed(seed)
        torch.manual_seed(seed)
        coords = (
            torch.rand((molecs_num, atoms_num, 3), generator=rng) * 10.0 + 1.0e-3
        )
        idxs = torch.randint(
            0, len(symbols), (molecs_num * atoms_num,), generator=rng
        )
        kinds = torch.tensor([ATOMIC_NUMBER[s] for s in symbols])
        return kinds[idxs].view(molecs_num, atoms_num), coords

    znums_hcno, coords_hcno = ref_make_molecs(10, 10, ("H", "C", "N", "O"), 1234)
    znums_2x, coords_2x = ref_make_molecs(10, 10, SYMBOLS_2X, 1234)
    out = {
        "e_atomic_nums": znums_hcno.numpy(),
        "e_coords": coords_hcno.numpy(),
        "f_atomic_nums": znums_2x.numpy(),
        "f_coords": coords_2x.numpy(),
    }
    res = Path("/root/reference/tests/resources/potentials")
    for name in ("zbl", "lj", "rep-lj", "disp-lj", "fixed-coulomb", "fixed-mnok"):
        with open(res / f"{name}-energies.pkl", "rb") as f:
            out[f"{name}_energies"] = np.asarray(pickle.load(f))
        with open(res / f"{name}-energies-forces.pkl", "rb") as f:
            e, forces = pickle.load(f)
            out[f"{name}_f_energies"] = np.asarray(e)
            out[f"{name}_forces"] = np.asarray(forces)
    np.savez_compressed(OUT / "acceptance_goldens.npz", **out)
    print("wrote acceptance_goldens.npz")


def make_vib_goldens():
    """Hessian + vibrational frequencies for a small molecule."""
    torch.manual_seed(SEED)
    ref = torchani.arch.simple_ani(("H", "C", "N", "O"), lot="wb97x-631gd", ensemble_size=1)
    ref.eval()
    sd = {f"sd.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    # water-like geometry
    species = np.array([[8, 1, 1]], dtype=np.int64)
    coords = np.array(
        [[[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]]],
        dtype=np.float32,
    )
    res = torchani.grad.single_point(
        ref,
        torch.tensor(species),
        torch.tensor(coords),
        forces=True,
        hessians=True,
    )
    np.savez_compressed(
        OUT / "vib_goldens.npz",
        species=species,
        coords=coords,
        energies=res["energies"].detach().numpy(),
        forces=res["forces"].detach().numpy(),
        hessians=res["hessians"].detach().numpy(),
        **sd,
    )
    print("wrote vib_goldens.npz")


def make_zoo_goldens():
    """Published-architecture goldens through the reference factories.

    The real pretrained ``.pt`` files cannot be downloaded in this
    environment, so the next-best parity artifact is the reference's OWN
    architectures with seeded random weights: the state dicts carry the
    exact published key schemes (ANI-2x: 8 members x 7 species; ANI-2xr:
    simple_ani + repulsion; ANI-mbis: ANIq + DiscardFirstScalar charge
    networks), so `convert.load_state_dict` is validated against the full
    real scheme and a real ``.pt`` will load bit-correctly the day one
    appears (reference models.py:165-252).
    """
    from torchani.arch import ANIq, Assembler, simple_ani
    from torchani.electro import ChargeNormalizer
    from torchani.nn._internal import _ANINetworksDiscardFirstScalar
    from torchani.utils import SYMBOLS_2X, SYMBOLS_2X_ZNUM_ORDER

    rng = np.random.RandomState(SEED + 9)
    species, coords = random_molecules(
        rng, 4, 12, znums=(1, 6, 7, 8, 16, 9, 17)
    )
    ts = torch.tensor(species)

    def golden(name, ref, charges=False):
        ref.eval()
        # Round every float tensor through f16 and reload, then store the
        # f16 arrays: halves the archive (the 8-member stacks dominate) and
        # stays EXACT — f16 -> f32 is lossless, and the recorded E/F are
        # recomputed with the rounded weights the test will load.
        sd_t = {}
        for k, v in ref.state_dict().items():
            if v.is_floating_point():
                v = v.detach().half()
            sd_t[k] = v
        ref.load_state_dict(
            {
                k: (v.float() if v.is_floating_point() else v)
                for k, v in sd_t.items()
            }
        )
        sd = {f"sd.{k}": v.numpy() for k, v in sd_t.items()}
        tc = torch.tensor(coords, requires_grad=True)
        out = ref((ts, tc))
        energies = out.energies
        forces = -torch.autograd.grad(energies.sum(), tc)[0]
        data = dict(
            species=species,
            coords=coords,
            energies=energies.detach().numpy(),
            forces=forces.detach().numpy(),
            **sd,
        )
        if charges:
            data["charges"] = out.atomic_charges.detach().numpy()
        np.savez_compressed(OUT / f"zoo_goldens_{name}.npz", **data)
        print(f"wrote zoo_goldens_{name}.npz")

    # ANI-2x: the flagship scheme (reference models.py:165-199, minus the
    # unavailable weight download)
    torch.manual_seed(SEED + 11)
    asm = Assembler(periodic_table_index=True)
    asm.set_symbols(SYMBOLS_2X)
    asm.set_global_cutoff_fn("cosine")
    asm.set_aev_computer(radial="ani2x", angular="ani2x", strategy="pyaev")
    asm.set_atomic_networks(ctor="ani2x")
    asm.set_neighborlist("all_pairs")
    asm.set_gsaes_as_self_energies("wb97x-631gd")
    golden("ani2x", asm.assemble(8))

    # ANI-2xr: simple_ani + xTB repulsion, znum symbol order
    # (reference models.py:255-288)
    torch.manual_seed(SEED + 12)
    golden(
        "ani2xr",
        simple_ani(
            lot="wb97x-631gd",
            symbols=SYMBOLS_2X_ZNUM_ORDER,
            ensemble_size=8,
            dispersion=False,
            repulsion=True,
            strategy="pyaev",
        ),
    )

    # ANI-mbis: ANIq + 2-wide discard-first charge networks
    # (reference models.py:201-252)
    torch.manual_seed(SEED + 13)
    asm = Assembler(cls=ANIq, periodic_table_index=True)
    asm.set_symbols(SYMBOLS_2X)
    asm.set_global_cutoff_fn("cosine")
    asm.set_aev_computer(radial="ani2x", angular="ani2x", strategy="pyaev")
    asm.set_atomic_networks(ctor="ani2x")
    asm.set_charge_networks(
        cls=_ANINetworksDiscardFirstScalar,
        ctor="ani2x",
        kwargs={"out_dim": 2, "bias": False, "activation": "gelu"},
        normalizer=ChargeNormalizer.from_electronegativity_and_hardness(
            asm.symbols, scale_weights_by_charges_squared=True
        ),
    )
    asm.set_neighborlist("all_pairs")
    asm.set_gsaes_as_self_energies("wb97x-631gd")
    golden("animbis", asm.assemble(8), charges=True)


if __name__ == "__main__":
    make_aev_goldens()
    make_aev_pbc_goldens()
    make_model_goldens()
    make_potential_goldens()
    make_acceptance_goldens()
    make_vib_goldens()
    make_zoo_goldens()
