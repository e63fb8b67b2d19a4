"""Test harness: force a virtual 8-device CPU platform so mesh/sharding tests
run without TPUs (SURVEY.md §4 point (e)).

Note: this environment's sitecustomize registers an `axon` TPU-tunnel PJRT
backend in every python process and sets jax_platforms="axon,cpu", which both
overrides JAX_PLATFORMS and makes every op pay tunnel latency.  Backends are
initialized lazily, so overriding jax.config here (before any jax op runs)
reliably pins tests to the 8-device host CPU platform."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")
# persistent XLA compilation cache (works for the CPU backend too): repeat
# suite runs skip recompiles of the unchanged jitted programs
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
