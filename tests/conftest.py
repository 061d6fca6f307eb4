"""Test harness: run everything on a virtual 8-device CPU backend.

The driver benches on real TPU; tests exercise the same code (including
multi-chip shardings) on CPU via XLA's host-platform device-count flag
(SURVEY.md §4e).
"""

import os

# Force CPU even when the session env points at a real TPU backend. The
# environment may preimport jax (sitecustomize) before conftest runs, so the
# env var alone is not enough — use jax.config, which wins as long as no
# backend has been initialised yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by re-jitting the
# same supersteps/kernels across test processes (~25 min cold). The cache
# keys on HLO, so code changes invalidate exactly the affected programs.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DEPGAN_JAX_CACHE", "/tmp/jax_cache_depgan"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:  # CPU-backend caching is gated behind this knob in current jax
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "xla_gpu_per_fusion_autotune_cache_dir")
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tiny_volume(rng):
    """A small 3-D 'MRI' volume with distinct values per voxel."""
    return rng.normal(size=(12, 10, 6)).astype(np.float32)
