"""Filesystem locations for bundled resources and user data.

Mirrors the role of the reference's ``torchani/paths.py`` (resource root +
``TORCHANI_DATA_DIR`` override, see reference ``paths.py:40-52``) for the
TPU-native rebuild.
"""

import os
import typing as tp
from pathlib import Path

_data_dir_override: tp.Optional[Path] = None


def resources_dir() -> Path:
    """Directory holding bundled physical-constant resources."""
    return Path(__file__).resolve().parent / "resources"


def set_data_dir(path: tp.Union[str, Path, None]) -> None:
    """Override the data root for this process (reference ``paths.py`` name).

    ``None`` restores the default (env var or ``~/.local/share``) resolution.
    """
    global _data_dir_override
    _data_dir_override = None if path is None else Path(path)


def data_dir() -> Path:
    """Root directory for downloaded/user data (datasets, state dicts).

    Resolution order: `set_data_dir` override, ``TORCHANI_TPU_DATA_DIR``,
    ``TORCHANI_DATA_DIR`` (reference-compatible), then
    ``~/.local/share/TorchaniTPU``.
    """
    if _data_dir_override is not None:
        d = _data_dir_override
    else:
        env = os.getenv("TORCHANI_TPU_DATA_DIR") or os.getenv("TORCHANI_DATA_DIR")
        if env:
            d = Path(env)
        else:
            d = Path.home() / ".local" / "share" / "TorchaniTPU"
    d.mkdir(parents=True, exist_ok=True)
    return d


def neurochem_dir() -> Path:
    """Directory for NeuroChem-format model files (reference ``paths.py``)."""
    d = data_dir() / "Neurochem"
    d.mkdir(parents=True, exist_ok=True)
    return d


def state_dicts_dir() -> Path:
    d = data_dir() / "StateDicts"
    d.mkdir(parents=True, exist_ok=True)
    return d


def datasets_dir() -> Path:
    d = data_dir() / "Datasets"
    d.mkdir(parents=True, exist_ok=True)
    return d


def custom_models_dir() -> Path:
    """Directory scanned for user-defined model factories.

    Reference parity (``/root/reference/torchani/models.py:469-482``): each
    subdirectory ``<Name>/model.py`` defines a factory importable as
    ``torchani_tpu.models.<Name>``.
    """
    d = data_dir() / "CustomModels"
    d.mkdir(parents=True, exist_ok=True)
    return d
