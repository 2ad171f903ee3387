"""Multi-chip sharding helpers."""

from torchani_tpu.parallel.md import ShardedMolecularDynamics
from torchani_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    shard_ensemble,
)

__all__ = [
    "ShardedMolecularDynamics",
    "make_mesh",
    "shard_batch",
    "shard_ensemble",
]
