"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths
(TP/EP over a jax.sharding.Mesh) execute without TPU hardware — the pattern
recommended in SURVEY.md §4 for the tier the reference lacks.  Must set env
before the first ``import jax`` anywhere in the process.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (one real TPU chip via a
# tunnel with slow remote compiles) and sitecustomize imports jax at
# interpreter start, so env vars are too late — use jax.config instead.
# Unit tests must be fast + deterministic; TPU benches run via bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import asyncio
import inspect

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_pyfunc_call(pyfuncitem):
    """Run ``async def`` tests under asyncio.run (pytest-asyncio is not in the
    image; mirrors the reference's ``asyncio_mode = "auto"`` behavior,
    reference pyproject.toml:27-31)."""
    fn = pyfuncitem.obj
    if inspect.iscoroutinefunction(fn):
        kwargs = {k: pyfuncitem.funcargs[k]
                  for k in pyfuncitem._fixtureinfo.argnames}
        asyncio.run(fn(**kwargs))
        return True
    return None
