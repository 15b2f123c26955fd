"""Test configuration: run JAX on CPU with 8 virtual devices.

This is the TPU-native analogue of the reference's thread-count-invariance
testing (SURVEY.md §4): multi-device sharding is validated on a virtual CPU
mesh via XLA_FLAGS=--xla_force_host_platform_device_count.
"""

import os

# Hard override: the shell environment pins JAX_PLATFORMS=axon (the TPU
# tunnel); tests must run on local CPU with a virtual 8-device mesh.
# jaxtyping's pytest plugin imports jax before this conftest, so the env var
# alone is too late — override the already-imported config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from tardis_tpu.atomic.synthetic import make_synthetic_atom_data


@pytest.fixture(scope="session")
def atom_data():
    return make_synthetic_atom_data()


@pytest.fixture(scope="session")
def atom_data_prepared(atom_data):
    return atom_data.prepare(
        selected_atoms=[8, 12, 14, 16, 18, 20],
        line_interaction_type="macroatom",
    )
