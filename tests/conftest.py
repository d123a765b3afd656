"""Test bootstrap: force an 8-virtual-device CPU mesh.

The reference could only exercise its distributed paths on real GPUs
(SURVEY.md section 4); JAX lets us compile and run every sharded code path
on N virtual CPU devices.

NB: the environment registers an 'axon' TPU platform plugin that overrides
``JAX_PLATFORMS`` at import time, so the env var alone is not enough — the
config must be updated after importing jax (before backend init).
Set ``ACAV_TEST_TPU=1`` to run the suite on the real chip instead.
"""

import os

if not os.environ.get("ACAV_TEST_TPU"):
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
    # XLA:CPU in-process collectives SIGABRT the process when a rendezvous
    # stalls past ~30 s; on a contended 1-core rig the 8 virtual devices'
    # threads can take that long to all arrive. Stretch the deadlines.
    if "collective_call_terminate_timeout" not in _flags:
        _flags += (
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        )
    os.environ["XLA_FLAGS"] = _flags
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    # NO persistent compile cache on the CPU suite: XLA:CPU persists AOT
    # code pinned to the *compiling* machine's CPU features, and under
    # this image's remote-compile service that machine is not this host —
    # loading such entries warns of SIGILL risk (observed hanging a smoke
    # bench). The TPU bench/graft paths do cache (executables target the
    # accelerator, safe to persist).


# -- fast/slow tiering (round-3 VERDICT weak #3) ------------------------------
# The suite outgrew a 1-core rig (~90 min full). Default run = fast tier
# (<10 min, every subsystem smoke-level); the heavy jit/oracle tests carry
# @pytest.mark.slow and run with --runslow (all tests) or `-m slow`.

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow tier too (heavy jit/oracle parity tests)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return  # explicit -m selection overrides the default skip
    skip_slow = pytest.mark.skip(
        reason="slow tier: pass --runslow (or -m slow) to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
