"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices so multi-chip sharding
(mesh/pjit/shard_map) is exercised without TPU hardware, per the rebuild's
test strategy (SURVEY.md §4).

Note: the container's sitecustomize imports jax and registers the axon TPU
plugin before pytest starts, so JAX_PLATFORMS env tweaks are too late here —
we must go through jax.config.update instead.  Set SWTPU_TEST_TPU=1 to run
the suite on the real chip.
"""

import os

import jax

if not os.environ.get("SWTPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """jax.clear_caches() at every module boundary.

    The XLA CPU compiler segfaults (inside backend.compile_and_load, no
    Python error) once ONE process accumulates the whole suite's compiled
    programs: the full run died deterministically at the same late test in
    back-to-back runs, while either half of the suite — or any pair of
    modules — passes in isolation.  Dropping executable caches between
    modules keeps the live-program count bounded; modules recompile their
    shared helpers, which costs seconds against a segfaulted suite."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices (CPU mesh); running on real hardware")
    return devs
