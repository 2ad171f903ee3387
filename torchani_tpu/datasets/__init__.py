"""Dataset stack: conformer stores, batching, filters."""

from torchani_tpu.datasets.anidataset import ANIDataset, concatenate
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
    BatchedDataset,
    Batcher,
    Div,
    batch_all_in_ram,
    create_batched_dataset,
)
from torchani_tpu.datasets.builtin import (
    ANI1ccx,
    ANI1e,
    ANI1q,
    ANI1x,
    ANI2qHeavy,
    ANI2x,
    COMP6v1,
    COMP6v2,
    IonsHeavy,
    IonsLight,
    IonsVeryHeavy,
    TestData,
    TestDataForcesDipoles,
    TestDataIons,
    available_datasets,
    builtin_dataset,
)
from torchani_tpu.datasets import filters
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
    "BatchedDataset",
    "Div",
    "concatenate",
    "filters",
    "TestData",
    "TestDataForcesDipoles",
    "TestDataIons",
    "ANI1x",
    "ANI1ccx",
    "ANI1e",
    "ANI1q",
    "ANI2x",
    "ANI2qHeavy",
    "COMP6v1",
    "COMP6v2",
    "IonsLight",
    "IonsHeavy",
    "IonsVeryHeavy",
    "available_datasets",
    "builtin_dataset",
]
