"""Filesystem locations for bundled resources and user data.

Mirrors the role of the reference's ``torchani/paths.py`` (resource root +
``TORCHANI_DATA_DIR`` override, see reference ``paths.py:40-52``) for the
TPU-native rebuild.
"""

import os
from pathlib import Path


def resources_dir() -> Path:
    """Directory holding bundled physical-constant resources."""
    return Path(__file__).resolve().parent / "resources"


def data_dir() -> Path:
    """Root directory for downloaded/user data (datasets, state dicts).

    Override with the ``TORCHANI_TPU_DATA_DIR`` environment variable.
    """
    env = os.getenv("TORCHANI_TPU_DATA_DIR")
    if env:
        d = Path(env)
    else:
        d = Path.home() / ".local" / "share" / "TorchaniTPU"
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
