"""Legacy (TorchANI-1 style) lazy data pipeline.

Counterpart of ``/root/reference/torchani/legacy_data/__init__.py:139-441``:
a chainable lazy iterable over conformer dicts loaded from (legacy) HDF5
files — ``load(path).species_to_indices().subtract_self_energies(...)
.shuffle().cache().collate(batch).split(...)``.
"""

import typing as tp
from pathlib import Path

import numpy as np

from torchani_tpu.nn import SpeciesConverter
from torchani_tpu.utils import PADDING, pad_atomic_properties

__all__ = [
    "load",
    "TransformableIterable",
    "Transformations",
    "IterableAdapter",
    "IterableAdapterWithLength",
    "collate_fn",
    "stack_with_padding",
    "anidataloader",
    "datapacker",
]

Properties = tp.Dict[str, np.ndarray]


def _iter_hdf5(path) -> tp.Iterator[Properties]:
    import h5py

    with h5py.File(path, "r") as f:
        groups: tp.List[tp.Tuple[str, tp.Any]] = []

        def visit(name, obj):
            if isinstance(obj, h5py.Group) and any(
                isinstance(c, h5py.Dataset) for c in obj.values()
            ):
                groups.append((name, None))

        f.visititems(visit)
        for name, _ in sorted(groups):
            g = f[name]
            data = {}
            for k in g.keys():
                arr = np.asarray(g[k])
                if arr.dtype.kind in "SO":
                    arr = arr.astype(str)
                data[k] = arr
            yield data


def _split_conformers(group: Properties) -> tp.Iterator[Properties]:
    key = "species" if "species" in group else "numbers"
    species = group[key]
    if species.ndim == 1:
        # legacy files store one species row shared by all conformers
        n = group["coordinates"].shape[0]
        for i in range(n):
            yield {
                "species": species,
                **{
                    k: v[i]
                    for k, v in group.items()
                    if k not in ("species", "numbers")
                },
            }
    else:
        n = species.shape[0]
        for i in range(n):
            yield {k: v[i] for k, v in group.items()}


class TransformableIterable:
    """Lazy chainable iterable of single-conformer dicts."""

    def __init__(
        self, iterable: tp.Iterable[Properties], transforms: tp.Tuple = ()
    ) -> None:
        self._iterable = iterable
        self.transforms = transforms

    def __iter__(self) -> tp.Iterator[Properties]:
        return iter(self._iterable)

    def _chain(self, gen: tp.Callable[[], tp.Iterator[Properties]], name: str):
        return TransformableIterable(_Regenerable(gen), self.transforms + (name,))

    # ---- transformations ----
    def species_to_indices(
        self, symbols: tp.Sequence[str] = ("H", "C", "N", "O", "F", "S", "Cl")
    ) -> "TransformableIterable":
        import jax.numpy as jnp

        conv = SpeciesConverter(tuple(symbols))
        symbol_map = {s: i for i, s in enumerate(symbols)}

        def gen():
            for c in self:
                out = dict(c)
                sp = np.asarray(c["species"])
                if sp.dtype.kind in "UO":
                    out["species"] = np.asarray(
                        [symbol_map[s] for s in sp], dtype=np.int64
                    )
                else:
                    out["species"] = np.asarray(
                        conv(jnp.asarray(sp[None]))
                    )[0]
                yield out

        return self._chain(gen, "species_to_indices")

    def subtract_self_energies(
        self, self_energies: tp.Union[tp.Mapping[int, float], tp.Sequence[float]]
    ) -> "TransformableIterable":
        if isinstance(self_energies, tp.Mapping):
            table = dict(self_energies)
        else:
            table = {i: e for i, e in enumerate(self_energies)}

        def gen():
            for c in self:
                out = dict(c)
                sae = sum(table[int(s)] for s in c["species"] if int(s) >= 0)
                out["energies"] = np.asarray(c["energies"], dtype=np.float64) - sae
                yield out

        return self._chain(gen, "subtract_self_energies")

    def shuffle(self, seed: int = 0) -> "TransformableIterable":
        def gen():
            items = list(self)
            np.random.RandomState(seed).shuffle(items)
            yield from items

        return self._chain(gen, "shuffle")

    def cache(self) -> "TransformableIterable":
        items = list(self)
        return TransformableIterable(items, self.transforms + ("cache",))

    def collate(self, batch_size: int) -> "TransformableIterable":
        def gen():
            batch: tp.List[Properties] = []
            for c in self:
                batch.append(
                    {
                        k: (np.asarray(v)[None] if np.ndim(v) >= 1 else np.asarray([v]))
                        for k, v in c.items()
                    }
                )
                if len(batch) == batch_size:
                    yield pad_atomic_properties(batch, PADDING)
                    batch.clear()
            if batch:
                yield pad_atomic_properties(batch, PADDING)

        return self._chain(gen, "collate")

    def split(self, *fractions: tp.Optional[float]) -> tp.Tuple["TransformableIterable", ...]:
        items = list(self)
        n = len(items)
        out = []
        start = 0
        for frac in fractions:
            if frac is None:
                out.append(
                    TransformableIterable(items[start:], self.transforms + ("split",))
                )
                start = n
            else:
                stop = start + int(frac * n)
                out.append(
                    TransformableIterable(
                        items[start:stop], self.transforms + ("split",)
                    )
                )
                start = stop
        return tuple(out)

    def __len__(self) -> int:
        if hasattr(self._iterable, "__len__"):
            return len(self._iterable)  # type: ignore[arg-type]
        raise TypeError("Lazy iterable has no length; call .cache() first")


class _Regenerable:
    def __init__(self, gen: tp.Callable[[], tp.Iterator[Properties]]):
        self._gen = gen

    def __iter__(self):
        return self._gen()


def load(path) -> TransformableIterable:
    """Lazily load conformers from a (legacy) HDF5 file or directory."""
    path = Path(path)
    files = sorted(path.glob("*.h5")) if path.is_dir() else [path]

    def gen():
        for f in files:
            for group in _iter_hdf5(f):
                yield from _split_conformers(group)

    return TransformableIterable(_Regenerable(gen))


# ---- reference-parity helpers (reference legacy_data/__init__.py:139-356
# and legacy_data/_pyanitools.py) -------------------------------------------


def stack_with_padding(
    properties: tp.Sequence[Properties], padding: tp.Mapping[str, float]
) -> Properties:
    """Stack single-conformer dicts, padding the atom axis (reference
    ``legacy_data/__init__.py:139-149``), as numpy arrays."""
    keys = properties[0].keys()
    out: Properties = {}
    for k in keys:
        vals = [np.asarray(p[k]) for p in properties]
        if vals[0].ndim == 0:
            out[k] = np.stack(vals)
            continue
        max_len = max(v.shape[0] for v in vals)
        fill = padding.get(k, 0)
        stacked = np.full(
            (len(vals), max_len) + vals[0].shape[1:], fill, dtype=vals[0].dtype
        )
        for i, v in enumerate(vals):
            stacked[i, : v.shape[0]] = v
        out[k] = stacked
    return out


def collate_fn(
    samples: tp.Sequence[Properties],
    padding: tp.Optional[tp.Mapping[str, float]] = None,
) -> Properties:
    """Batch collation with default ANI padding values (reference
    ``legacy_data/__init__.py:152-156``)."""
    if padding is None:
        padding = PADDING
    return stack_with_padding(samples, padding)


class IterableAdapter:
    """Reenterable iterable from a generator factory (reference
    ``legacy_data/__init__.py:159-167``)."""

    def __init__(self, iterable_factory, length: tp.Optional[int] = None):
        self.iterable_factory = iterable_factory
        self.length = length

    def __iter__(self):
        return iter(self.iterable_factory())


class IterableAdapterWithLength(IterableAdapter):
    def __init__(self, iterable_factory, length: int):
        super().__init__(iterable_factory)
        self.length = length

    def __len__(self) -> int:
        return self.length


class Transformations:
    """Static transformations over reenterable iterables (reference
    ``legacy_data/__init__.py:179-356``).  The method-chaining form on
    `TransformableIterable` is the primary API; these statics delegate."""

    @staticmethod
    def _wrap(it) -> TransformableIterable:
        if isinstance(it, TransformableIterable):
            return it
        return TransformableIterable(it)

    @staticmethod
    def species_to_indices(
        it, species_order=("H", "C", "N", "O", "F", "S", "Cl")
    ) -> TransformableIterable:
        return Transformations._wrap(it).species_to_indices(species_order)

    @staticmethod
    def subtract_self_energies(it, self_energies) -> TransformableIterable:
        return Transformations._wrap(it).subtract_self_energies(self_energies)

    @staticmethod
    def shuffle(it, seed: int = 0) -> TransformableIterable:
        return Transformations._wrap(it).shuffle(seed)

    @staticmethod
    def cache(it) -> TransformableIterable:
        return Transformations._wrap(it).cache()

    @staticmethod
    def collate(it, batch_size: int, padding=None) -> TransformableIterable:
        return Transformations._wrap(it).collate(batch_size)

    @staticmethod
    def pin_memory(it) -> TransformableIterable:
        # host memory pinning is a torch/CUDA concept; no-op under JAX
        return Transformations._wrap(it)


class datapacker:
    """pyanitools-compatible HDF5 writer (reference
    ``legacy_data/_pyanitools.py:10-31``)."""

    def __init__(self, store_file, mode: str = "w-", complib: str = "gzip",
                 complevel: int = 6):
        import h5py

        self.store = h5py.File(store_file, mode=mode)
        self.clib = complib
        self.clev = complevel

    def store_data(self, store_loc: str, **kwargs) -> None:
        g = self.store.create_group(store_loc)
        for k, v in kwargs.items():
            if isinstance(v, list) and v and isinstance(v[0], str):
                v = [a.encode("utf-8") for a in v]
            g.create_dataset(
                k, data=v, compression=self.clib, compression_opts=self.clev
            )

    def cleanup(self) -> None:
        self.store.close()


class anidataloader:
    """pyanitools-compatible HDF5 reader (reference
    ``legacy_data/_pyanitools.py:34-107``)."""

    def __init__(self, store_file):
        import os

        import h5py

        if not os.path.exists(store_file):
            raise FileNotFoundError(f"file not found: {store_file}")
        self.store = h5py.File(store_file, "r")

    def h5py_dataset_iterator(self, g, prefix: str = ""):
        import h5py

        for key in g.keys():
            item = g[key]
            path = f"{prefix}/{key}"
            if isinstance(item, h5py.Dataset):
                continue
            keys = list(item.keys())
            if keys and all(isinstance(item[k], h5py.Dataset) for k in keys):
                data = {"path": path}
                for k in keys:
                    arr = np.asarray(item[k][()])
                    if arr.dtype.kind == "S" or (
                        arr.dtype.kind == "O"
                        and arr.size
                        and isinstance(arr.reshape(-1)[0], bytes)
                    ):
                        arr = [a.decode("ascii") for a in arr.reshape(-1)]
                    data[k] = arr
                yield data
            else:
                yield from self.h5py_dataset_iterator(item, path)

    def __iter__(self):
        return self.h5py_dataset_iterator(self.store)

    def get_group_list(self):
        return list(self.store.values())

    def group_size(self):
        return len(self.get_group_list())

    def size(self):
        return sum(1 for _ in self)

    def cleanup(self) -> None:
        self.store.close()
