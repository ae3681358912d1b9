"""Test configuration: CPU backend with 8 virtual devices + float64.

Multi-device sharding tests run on a virtual CPU mesh per SURVEY.md §4.
NOTE: this environment pre-imports jax at interpreter startup (axon
sitecustomize), so env vars are too late — we must use jax.config.update.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(23)  # TESTCASE_SEED from the reference


@pytest.fixture
def key():
    return jax.random.PRNGKey(23)
