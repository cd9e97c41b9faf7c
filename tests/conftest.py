"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-chip test strategy from SURVEY.md §4: CPU devices are the
TPU-world "fake backend" for exercising sharding and collectives without
hardware. Must set the env vars before jax initializes its backends.
"""

import os

# Force CPU regardless of the ambient platform (the dev box exports
# JAX_PLATFORMS=axon for the tunneled TPU chip; tests must be hermetic and
# exercise the virtual 8-device mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    # 8 virtual devices time-slice the host cores; the default 40s collective
    # rendezvous kill-switch fires spuriously on small hosts.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# jax may already be imported by a pytest plugin, capturing the ambient
# JAX_PLATFORMS at import time — override via config (effective until
# backends are initialized).
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS above covers older jax
jax.config.update("jax_enable_x64", False)
# Parity tests compare against torch fp32; keep matmul/conv at full fp32.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache, committed into the repo (.jax_cache): a
# *cold* run on a fresh box skips the big XLA:CPU compiles (the GAN train
# step alone costs minutes on one core). Entries are keyed by HLO + compile
# options + jaxlib version; the canonical XLA_FLAGS above keep keys stable.


# Machine-feature-scoped cache subdir: XLA:CPU persistent-cache entries are
# AOT artifacts compiled for THIS host's ISA — the loader itself warns that
# loading them elsewhere "could lead to execution errors such as SIGILL".
# ffwm_tpu.hostcache is jax-free and ffwm_tpu/__init__ is docstring-only, so
# this import is safe after the env/config setup above. (__graft_entry__.py
# keeps its own inline copy: the driver imports it standalone.)
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ffwm_tpu.hostcache import host_fingerprint  # noqa: E402

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache", "host-" + host_fingerprint())
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "reference: parity tests that import /root/reference as oracle"
    )
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (subprocess multi-host runs, "
        "e2e CLI epochs) — deselect with -m 'not slow' for a quick pass"
    )
    config.addinivalue_line(
        "markers", "heavy: ~1-5 min compute tests (full train-step "
        "executions, live-torch train-step parity, CLI eval e2e). Every "
        "heavy test is also tagged slow at collection, so the tiers are: "
        "-m 'not slow' = smoke (measured 6m33s wall for 143 tests on this "
        "1-core host with the committed cache warm; minutes less on any "
        "multi-core box); no filter = everything (the coverage gate)"
    )


def pytest_collection_modifyitems(items):
    # heavy implies slow: `-m "not slow"` is THE fast-feedback selection
    # (VERDICT r4 #5 — its done-criterion is that exact command); the full
    # unfiltered run remains the coverage gate.
    for item in items:
        if item.get_closest_marker("heavy") and not item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.slow)
