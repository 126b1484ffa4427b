"""Test environment: 8 virtual CPU devices (SURVEY §4.4).

Sharding/collective tests run on a fake 8-device CPU mesh; must be set
before jax import, hence in conftest at collection time.
"""

import os

# Force CPU: the ambient axon sitecustomize pre-imports jax and registers
# the TPU tunnel backend, so the JAX_PLATFORMS env var alone is NOT enough —
# tests must also flip the live jax config to the fake 8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import dataclasses  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def cpu_friendly(cfg):
    """bf16 conv emulation on the CPU test backend is very slow; numeric
    behavior under test (shapes, semantics, parity) is dtype-independent,
    so tests run the models in float32."""
    return cfg.replace(model=dataclasses.replace(cfg.model, dtype="float32"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration tests")
