"""Checkpoint/resume utilities (orbax-backed).

The reference uses plain ``state_dict`` files with a latest/best convention
(``examples/training.py:90-199``); here train state pytrees are saved with
orbax, with the same latest/best layout, plus `merge_state_dicts` to combine
single-model checkpoints into an ensemble (reference ``utils.py:476-505``).
"""

import typing as tp
from pathlib import Path

import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "latest_step",
    "merge_members",
    "merge_state_dicts",
]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory, state, step: int, keep: int = 3) -> Path:
    """Save a pytree under ``directory/step_{N}`` and prune old steps."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / f"step_{step:010d}"
    _checkpointer().save(path.resolve(), state, force=True)
    steps = sorted(directory.glob("step_*"))
    for old in steps[:-keep]:
        import shutil

        shutil.rmtree(old)
    return path


def latest_step(directory) -> tp.Optional[int]:
    directory = Path(directory)
    steps = sorted(directory.glob("step_*"))
    if not steps:
        return None
    return int(steps[-1].name.split("_")[1])


def load_checkpoint(directory, template, step: tp.Optional[int] = None):
    """Restore a pytree saved by `save_checkpoint` into ``template``'s
    structure; returns None if no checkpoint exists.

    Device-agnostic (the reference's ``torch.load(map_location=...)``
    semantics): array leaves are restored as host numpy and re-committed to
    the default device, so a checkpoint written on one topology (e.g. a TPU
    run) resumes cleanly on another (e.g. CPU) — orbax's default replays the
    recorded sharding and fails when that device no longer exists.
    """
    directory = Path(directory)
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None
    path = (directory / f"step_{step:010d}").resolve()
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    restore_args = jax.tree.map(
        lambda leaf: ocp.RestoreArgs(restore_type=np.ndarray)
        if isinstance(leaf, (jax.Array, np.ndarray))
        else ocp.RestoreArgs(),
        template,
    )
    restored = _checkpointer().restore(
        path, item=template, restore_args=restore_args
    )
    return jax.tree.map(
        lambda tmpl, leaf: jnp.asarray(leaf)
        if isinstance(tmpl, jax.Array)
        else leaf,
        template,
        restored,
    )


def merge_members(containers: tp.Sequence) -> "tp.Any":
    """Merge single-model containers into an `Ensemble` (checkpoint combine)."""
    from torchani_tpu.nn import Ensemble

    return Ensemble.from_members(list(containers))


def merge_state_dicts(paths: tp.Iterable) -> tp.Dict[str, np.ndarray]:
    """Merge single-model state dicts into an ensemble state dict.

    Reference ``utils.py:476-505`` semantics: ``neural_networks.*`` keys of
    the j-th (sorted) file become ``neural_networks.{j}.*``; all other keys
    must agree across files.  Accepts torch ``.pt`` files (via
    `torchani_tpu.convert.load_torch_state_dict`, incl. lightning-format
    ``{"state_dict": {"model.*": ...}}`` tolerance) or ``.npz`` files.
    """
    paths = sorted(Path(p) for p in paths)
    if any(not p.is_file() for p in paths):
        raise ValueError("All passed paths must be existing files with state dicts")
    merged: tp.Dict[str, np.ndarray] = {}
    for j, path in enumerate(paths):
        if path.suffix == ".npz":
            sd = dict(np.load(path))
        else:
            from torchani_tpu.convert import load_torch_state_dict

            sd = load_torch_state_dict(path)  # handles lightning layout
        for k, v in sd.items():
            if "neural_networks" in k:
                k = k.replace("neural_networks", f"neural_networks.{j}")
            elif j > 0:
                prev = merged.get(k)
                if prev is None or prev.shape != np.shape(v):
                    raise ValueError(f"Mismatched non-network key {k!r}")
                continue
            merged[k] = np.asarray(v)
    return merged
