"""Test/benchmark system factories (reference ``torchani/_testing.py`` analog)."""

import typing as tp

import numpy as np

__all__ = [
    "make_molecs",
    "make_chain_molecs",
    "make_water_box",
    "make_solvated_system",
    "Molecs",
    "make_molec",
    "make_reference_molecs",
    "make_elem_idxs",
    "make_neighbors",
    "make_tensor",
    "ANITestCase",
    "TestCase",
    "expand",
]


def make_molecs(
    num: int,
    max_atoms: int,
    seed: int = 0,
    znums: tp.Sequence[int] = (1, 6, 7, 8),
    box: float = 4.0,
) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Random padded molecule batch: (species znums (C,A), coords (C,A,3))."""
    rng = np.random.RandomState(seed)
    species = np.full((num, max_atoms), -1, dtype=np.int64)
    coords = np.zeros((num, max_atoms, 3), dtype=np.float32)
    for i in range(num):
        n = rng.randint(3, max_atoms + 1)
        species[i, :n] = rng.choice(znums, size=n)
        coords[i, :n] = rng.rand(n, 3) * box
    return species, coords


def make_water_box(
    target_atoms: int = 10000,
    density_molec_per_a3: float = 0.0334,
    seed: int = 0,
) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Periodic water box: (species (1, A), coords (1, A, 3), cell (3, 3)).

    Water molecules on a perturbed cubic lattice at liquid density
    (0.0334 molecules/A^3 ~ 1 g/cm^3).  Geometry is rigid TIP3P-like
    (r_OH = 0.9572 A, angle 104.52 deg).
    """
    n_water = target_atoms // 3
    n_side = int(np.ceil(n_water ** (1 / 3)))
    # spacing from density directly: sizing the box for n_water but filling
    # an n_side^3 lattice would over-pack partial lattices (2x local density
    # at 30 molecules), so partial lattices get a slightly larger box with
    # vacancies instead
    spacing = (1.0 / density_molec_per_a3) ** (1 / 3)
    box = n_side * spacing
    rng = np.random.RandomState(seed)

    r_oh = 0.9572
    theta = np.deg2rad(104.52)
    base = np.array(
        [
            [0.0, 0.0, 0.0],
            [r_oh, 0.0, 0.0],
            [r_oh * np.cos(theta), r_oh * np.sin(theta), 0.0],
        ],
        dtype=np.float64,
    )

    species_list = []
    coords_list = []
    count = 0
    for ix in range(n_side):
        for iy in range(n_side):
            for iz in range(n_side):
                if count >= n_water:
                    break
                origin = (np.array([ix, iy, iz]) + 0.5) * spacing
                # random orientation
                q = rng.randn(4)
                q /= np.linalg.norm(q)
                w, x, y, z = q
                rot = np.array(
                    [
                        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                    ]
                )
                mol = base @ rot.T + origin + rng.randn(3) * 0.05
                coords_list.append(mol)
                species_list.extend([8, 1, 1])
                count += 1
    species = np.asarray(species_list, dtype=np.int64)[None]
    coords = np.concatenate(coords_list, axis=0).astype(np.float32)[None]
    cell = np.eye(3, dtype=np.float32) * box
    return species, coords, cell


# ---- reference-parity test harness (reference ``_testing.py:20-182``) ------


class Molecs(tp.NamedTuple):
    """A group of molecules (reference ``_testing.py:86-91``)."""

    coords: tp.Any
    atomic_nums: tp.Any
    cell: tp.Optional[tp.Any]
    pbc: tp.Optional[tp.Any]


def make_tensor(shape, low: float = 0.0, high: float = 1.0, seed: int = 0):
    """Random f32 array in [low, high) (torch ``make_tensor`` analog)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    return jnp.asarray(
        (rng.rand(*shape) * (high - low) + low).astype(np.float32)
    )


def make_elem_idxs(
    molecs_num: int,
    atoms_num: int,
    symbols: tp.Sequence[str] = ("H", "C", "N", "O"),
    seed: tp.Optional[int] = None,
):
    """Random element-index batch (reference ``_testing.py:94-114``)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    return jnp.asarray(
        rng.randint(0, len(symbols), size=(molecs_num, atoms_num)).astype(
            np.int32
        )
    )


def make_molec(
    atoms: int,
    cell_size: float = 10.0,
    pbc: bool = False,
    symbols: tp.Sequence[str] = ("H", "C", "N", "O"),
    seed: tp.Optional[int] = None,
) -> Molecs:
    """One random molecule as a `Molecs` (reference ``_testing.py:155-164``)."""
    return make_reference_molecs(1, atoms, cell_size, pbc, symbols, seed)


def make_reference_molecs(
    molecs_num: int,
    atoms_num: int,
    cell_size: float = 10.0,
    pbc: bool = False,
    symbols: tp.Sequence[str] = ("H", "C", "N", "O"),
    seed: tp.Optional[int] = None,
) -> Molecs:
    """Random molecule batch in the reference's `Molecs` layout
    (``_testing.py:117-152``; the 2-tuple `make_molecs` above predates it)."""
    import jax.numpy as jnp

    from torchani_tpu.constants import ATOMIC_NUMBER

    rng = np.random.RandomState(seed)
    coords = (rng.rand(molecs_num, atoms_num, 3) * cell_size + 1e-3).astype(
        np.float32
    )
    kinds = np.asarray([ATOMIC_NUMBER[s] for s in symbols])
    nums = kinds[rng.randint(0, len(symbols), size=(molecs_num, atoms_num))]
    if pbc:
        cell = jnp.eye(3, dtype=jnp.float32) * (cell_size + 2e-3)
        pbc_arr = jnp.asarray([True, True, True])
    else:
        cell = None
        pbc_arr = None
    return Molecs(jnp.asarray(coords), jnp.asarray(nums), cell, pbc_arr)


def make_neighbors(
    atoms: int,
    cutoff: float = 5.2,
    symbols: tp.Sequence[str] = ("H", "C", "N", "O"),
    seed: tp.Optional[int] = None,
):
    """Random molecule's neighbor table (reference ``_testing.py:167-177``)."""
    from torchani_tpu.neighbors import adaptive_list
    from torchani_tpu.nn import SpeciesConverter

    molec = make_molec(atoms, 10.0, False, symbols, seed)
    elem = SpeciesConverter(tuple(symbols))(molec.atomic_nums)
    return adaptive_list(cutoff, elem, molec.coords)


def expand(jit: tp.Optional[bool] = None, platform: str = "current"):
    """Class decorator multiplying an `ANITestCase` over {jit, nojit}.

    The TPU analog of the reference's {cpu, cuda} x {jit, nojit} harness
    (``_testing.py:25-50``): devices are managed by JAX platform config
    (tests pin the CPU backend in conftest), so the axis that remains is
    eager vs ``jax.jit`` execution.
    """
    import unittest

    jits = (False, True) if jit is None else (bool(jit),)

    def decorator(cls):
        module = __import__(cls.__module__, fromlist=["__name__"])
        for use_jit in jits:
            name = f"{cls.__name__}{'_jit' if use_jit else ''}"
            new_cls = type(name, (cls,), {"_jit": use_jit})
            setattr(module, name, new_cls)
        # replace the original with a skipped placeholder so it doesn't
        # double-run unparameterized
        return unittest.skip("expanded into jit/nojit variants")(cls)

    return decorator


import unittest as _unittest  # noqa: E402

TestCase = _unittest.TestCase


class ANITestCase(_unittest.TestCase):
    """unittest.TestCase base with a jit axis (reference ``_testing.py:57-83``).

    ``self._setup(fn)`` returns ``jax.jit(fn)`` in jit variants and ``fn``
    otherwise, so one test body covers both execution modes.
    """

    _jit: bool = False

    @property
    def jit(self) -> bool:
        return self._jit

    def _setup(self, fn):
        if self._jit:
            import jax

            return jax.jit(fn)
        return fn


def make_chain_molecs(
    num: int,
    max_atoms: int,
    seed: int = 0,
    znums: tp.Sequence[int] = (1, 6, 7, 8),
) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Random tree-bonded (GDB-like) molecule batch.

    Unlike `make_molecs` (uniform points in a 4 A box — every atom within
    every cutoff of every other, maximally dense neighbor tables), atoms
    grow as a random tree with ~1.4 A bonds and a 0.9 A exclusion radius:
    realistic molecular geometry where the within-3.5-A angular neighbor
    count is O(10), not O(atoms).  Returns (species (C, A), coords (C, A, 3))
    with -1/zero padding.
    """
    rng = np.random.RandomState(seed)
    species = np.full((num, max_atoms), -1, dtype=np.int64)
    coords = np.zeros((num, max_atoms, 3), dtype=np.float32)
    for i in range(num):
        n = rng.randint(3, max_atoms + 1)
        species[i, :n] = rng.choice(znums, size=n)
        pos = np.zeros((n, 3))
        degree = np.zeros(n, dtype=np.int64)
        for a in range(1, n):
            for _attempt in range(20):
                # attach to a random existing atom with low degree
                weights = 1.0 / (1.0 + degree[:a]) ** 2
                parent = rng.choice(a, p=weights / weights.sum())
                direction = rng.randn(3)
                direction /= np.linalg.norm(direction)
                bond = 1.4 + rng.randn() * 0.08
                cand = pos[parent] + direction * bond
                d = np.linalg.norm(pos[:a] - cand, axis=1)
                # non-bonded exclusion ~ VdW contact; the bonded parent sits
                # at ~1.4 A and is exempt
                d[parent] = np.inf
                if np.all(d > 1.6):
                    break
            pos[a] = cand
            degree[parent] += 1
            degree[a] += 1
        coords[i, :n] = pos + rng.randn(1, 3) * 0.01
    return species, coords


def make_solvated_system(
    solute_pdb,
    water_pdb,
    box: float,
    clash: float = 1.7,
) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Solvate a PDB solute in tiled PDB water: ``(species, coords, cell)``.

    The heterogeneous-MD benchmark input (BASELINE config 5; the reference
    benchmarks MD on solvated proteins from ``dataset/pdb/``,
    ``tools/scaling-md-benchmark.py:37-38``).  The water template cell is
    tiled to fill an orthorhombic ``box`` (A), the solute is centered in it,
    and any water molecule with an atom within ``clash`` A of a solute atom
    (minimum image) is removed.  Species are atomic numbers, shape ``(A,)``.
    """
    from torchani_tpu.io import read_pdb

    wz, wc, wcell = read_pdb(water_pdb)
    if wcell is None:
        raise ValueError("water template must have a CRYST1 cell")
    side = float(wcell[0, 0])
    n_rep = int(np.ceil(box / side))
    cell = np.diag([box, box, box]).astype(np.float32)
    # one water molecule = consecutive (O, H, H) records; wrap each molecule
    # into the template cell by its centroid (keeps molecules whole and the
    # density uniform), then tile
    mols = wc.reshape(-1, 3, 3)
    centroid = mols.mean(axis=1, keepdims=True)
    mols = mols - np.floor(centroid / side) * side
    offsets = np.stack(
        np.meshgrid(*[np.arange(n_rep) * side] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    tiled = (mols[None] + offsets[:, None, None, :]).reshape(-1, 3, 3)
    tiled_z = np.tile(wz.reshape(-1, 3), (len(offsets), 1))
    # drop whole molecules whose centroid fell outside the (possibly
    # non-multiple-of-side) target box
    inside = (tiled.mean(axis=1) < box).all(axis=-1)
    waters_xyz = tiled[inside]
    waters_z = tiled_z[inside]

    if solute_pdb is not None:
        sz, sc, _ = read_pdb(solute_pdb)
        extent = float((sc.max(axis=0) - sc.min(axis=0)).max())
        if box < extent + 2.0 * clash:
            import warnings

            # a solute bigger than the box overlaps its own periodic image;
            # tolerated for composition tests, but MD on such a box is
            # physically broken and extreme density can explode neighbor
            # capacities (a box-14 1hz5 run hung in compilation)
            warnings.warn(
                f"box {box} A smaller than solute extent {extent:.1f} A "
                f"(+ {clash} A clash margin): periodic self-overlap",
                stacklevel=2,
            )
        sc = sc - sc.mean(axis=0) + box / 2.0
        # minimum-image clash check, chunked over water atoms
        flat = waters_xyz.reshape(-1, 3)
        mind = np.empty(len(flat), dtype=np.float64)
        for i0 in range(0, len(flat), 4096):
            d = flat[i0 : i0 + 4096, None, :] - sc[None, :, :]
            d -= np.round(d / box) * box
            mind[i0 : i0 + 4096] = np.sqrt((d**2).sum(-1)).min(axis=1)
        keep = (mind.reshape(-1, 3) > clash).all(axis=1)
        waters_xyz = waters_xyz[keep]
        waters_z = waters_z[keep]
        species = np.concatenate([sz, waters_z.reshape(-1)])
        coords = np.concatenate([sc, waters_xyz.reshape(-1, 3)], axis=0)
    else:
        species = waters_z.reshape(-1)
        coords = waters_xyz.reshape(-1, 3)
    return species.astype(np.int64), coords.astype(np.float32), cell
