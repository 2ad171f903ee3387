"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the driver separately dry-runs the
multi-chip path; real-TPU checks happen in bench runs).  The platform must be
forced *before* JAX initializes its backends — this environment registers an
'axon' TPU plugin that otherwise wins.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

RESOURCES = os.path.join(os.path.dirname(__file__), "resources")


@pytest.fixture(scope="session")
def resources_dir():
    return RESOURCES


def load_golden(name: str) -> dict:
    path = os.path.join(RESOURCES, name)
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}
