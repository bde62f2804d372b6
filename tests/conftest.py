"""Test harness: force the CPU backend with 8 virtual devices so sharding /
multi-chip code paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# The environment forces JAX_PLATFORMS=axon (real TPU through a tunnel, with
# ~30s remote compiles) — tests must override, not setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize hook calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, which overrides the env var — force the
# CPU backend again here (conftest runs before any test module touches a
# backend).
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: XLA-CPU compiles dominate suite wall-clock and
# are identical across runs/processes (incl. pytest-xdist workers)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
