"""Device-mesh sharding for training and batched inference.

The reference is a single-device library (SURVEY SS2.3: no NCCL/MPI anywhere);
multi-chip execution here is additive capability, done the TPU way:

- ``data`` axis: molecules of a batch, sharded across chips (pure data
  parallelism — the only inter-chip axis needed for ANI training; gradient
  all-reduce is inserted by XLA as ``psum`` over ICI).
- ``model`` axis: ensemble members (the (E, S, in, out) weight stacks shard
  naturally along E — "ensemble parallelism").

Everything rides GSPMD: we place the inputs/params with `NamedSharding` and
let ``jit`` propagate; no hand-written collectives.
"""

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "shard_ensemble"]


def make_mesh(
    n_data: tp.Optional[int] = None,
    n_model: int = 1,
    devices: tp.Optional[tp.Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} does not cover {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(batch: tp.Dict[str, jax.Array], mesh: Mesh) -> tp.Dict[str, jax.Array]:
    """Shard every batch array along its leading (molecule) axis."""
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def shard_ensemble(networks, mesh: Mesh):
    """Shard stacked ensemble weights along the member axis ('model').

    Non-ensemble containers (no leading E axis) are replicated.
    """
    from torchani_tpu.nn import Ensemble

    if not isinstance(networks, Ensemble):
        return jax.device_put(networks, NamedSharding(mesh, P()))
    member_sharded = NamedSharding(mesh, P("model"))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, member_sharded)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, networks)
