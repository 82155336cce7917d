"""Test harness config: force an 8-device virtual CPU topology BEFORE jax
imports, so multi-chip sharding is exercised without TPU hardware
(SURVEY.md §4 test plan)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep TF (used only as a parity oracle in tests) quiet and off any accelerator.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

import jax
import numpy as np
import pytest

# Force CPU via jax.config too: some hosted environments register a TPU PJRT
# plugin that overrides the JAX_PLATFORMS env var; only the config API wins.
# Running the suite on one real chip would break every 8-device mesh test.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against f32 TF oracles; JAX's default conv/matmul
# precision on some backends is bf16-ish, which shows up as ~1e-3 noise.
jax.config.update("jax_default_matmul_precision", "float32")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
