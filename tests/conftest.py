"""Pytest configuration: run all tests on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere. This is how the
multi-device (DP/TP sharding) paths are tested without real multi-chip
hardware — see SURVEY.md §4.
"""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

# The container's sitecustomize pre-imports jax and pins the `axon` TPU
# platform, so the env var alone is not enough — force it back to CPU.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
