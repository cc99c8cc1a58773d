"""Test config: run everything on a virtual 8-device CPU mesh in float64.

The environment preloads jax via sitecustomize (with the axon TPU platform),
so setting JAX_PLATFORMS here is too late; use jax.config instead, which
works as long as no backend has been initialized yet.

MRCAL_TPU_TEST_TPU=1 keeps the real TPU backend instead (for the few
TPU-gated tests, e.g. test_ops.py::test_pallas_cholesky_tpu — run those
one at a time; the axon tunnel serializes clients).
"""

import os

import jax

if not os.environ.get("MRCAL_TPU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=8")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
