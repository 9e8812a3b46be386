"""Test configuration: CPU platform, 8 virtual devices, float64.

Parity with the NumPy reference requires float64; multi-chip sharding tests
use a virtual 8-device CPU mesh (`--xla_force_host_platform_device_count`),
mirroring SURVEY.md section 4's "distributed tests without a cluster" plan.
The axon sitecustomize pins JAX_PLATFORMS=axon (TPU), so we override the
platform through jax.config before any backend is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import json  # noqa: E402
import pathlib  # noqa: E402

import pytest  # noqa: E402

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound cumulative XLA state across the ~190-test suite.

    Every module compiles many distinct programs; with the caches never
    dropped, the full run accumulates hundreds of live CPU executables and
    eventually segfaults in the last modules (observed at ~91% with 125 GB
    RAM free — native XLA state, not Python heap).  Clearing per module
    trades a little recompilation for a bounded footprint.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def golden_default():
    return json.loads((GOLDEN_DIR / "default_case.json").read_text())


@pytest.fixture(scope="session")
def golden_variant():
    return json.loads((GOLDEN_DIR / "variant_case.json").read_text())


@pytest.fixture(scope="session")
def golden_shallow():
    return json.loads((GOLDEN_DIR / "shallow_case.json").read_text())


@pytest.fixture(scope="session")
def golden_custom_tower():
    return json.loads((GOLDEN_DIR / "custom_tower_case.json").read_text())


@pytest.fixture(scope="session")
def golden_singular():
    return json.loads((GOLDEN_DIR / "singular_case.json").read_text())


@pytest.fixture(scope="session")
def golden_autogen_4leg():
    return json.loads((GOLDEN_DIR / "autogen_4leg_case.json").read_text())
