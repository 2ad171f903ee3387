"""Dataset stack: conformer stores, batching, filters."""

from torchani_tpu.datasets.anidataset import ANIDataset
from torchani_tpu.datasets.backends import (
    HDF5Store,
    InMemoryStore,
    ParquetStore,
    Store,
    create_store,
)
from torchani_tpu.datasets.batching import (
    ANIBatchedDataset,
    ANIBatchedInMemoryDataset,
    Batcher,
    batch_all_in_ram,
    create_batched_dataset,
)
from torchani_tpu.datasets.builtin import (
    TestData,
    available_datasets,
    builtin_dataset,
)
from torchani_tpu.datasets.filters import (
    filter_by_high_energy_error,
    filter_by_high_force,
)

__all__ = [
    "ANIDataset",
    "ANIBatchedDataset",
    "ANIBatchedInMemoryDataset",
    "Batcher",
    "HDF5Store",
    "InMemoryStore",
    "ParquetStore",
    "Store",
    "batch_all_in_ram",
    "create_batched_dataset",
    "create_store",
    "filter_by_high_energy_error",
    "filter_by_high_force",
    "TestData",
    "available_datasets",
    "builtin_dataset",
]
