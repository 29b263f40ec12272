"""Test harness config: run the whole suite on the CPU backend with 8 virtual
devices so sharding tests work without TPU hardware (SURVEY.md §4: the suite
must be CPU-runnable, the triangle demo is the e2e smoke test).

Note: the environment's site hook pins JAX_PLATFORMS=axon (the TPU tunnel), so
we must both rewrite the env var *and* update jax.config after import.
"""

import os

# TEST_PLATFORM=axon runs a (sub)suite on the real TPU — used for the slow
# scale goldens (RUN_SCALE_GOLDENS=1 TEST_PLATFORM=axon pytest
# tests/test_goldens_scale.py).  Default: CPU with 8 virtual devices.
_plat = os.environ.get("TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _plat
_flags = os.environ.get("XLA_FLAGS", "")
if _plat == "cpu" and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _plat)
jax.config.update("jax_enable_x64", False)
# Keep f32 math f32 on any backend (TPU would otherwise use bf16 matmuls).
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

# Two test tiers (VERDICT r3 #8): the default run skips the multi-minute
# compile-heavy tests (reference-GI scale golden, per-pass toggle goldens,
# the big sharded-parity frames, the end-to-end preview session) so a
# per-change `pytest tests/ -q` stays fast; RUN_SLOW=1 (CI / pre-commit of
# GI or sharding changes) runs everything.  The slow tier is documented in
# CLAUDE.md; the fast-GI 480x272 golden and one sharded-parity test stay
# default-on as the precision/parity safety net.
RUN_SLOW = os.environ.get("RUN_SLOW") == "1"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute compile-heavy tier; run with RUN_SLOW=1"
    )


def pytest_collection_modifyitems(config, items):
    if RUN_SLOW:
        return
    skip = pytest.mark.skip(reason="slow tier: set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
