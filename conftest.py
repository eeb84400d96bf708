"""Root pytest config: force the CPU backend with 8 fake devices.

SURVEY.md §4.4: multi-host-without-a-cluster — all unit tests (including
shard_map sharding tests) run on `--xla_force_host_platform_device_count=8`
CPU devices; the real TPU chip is reserved for bench.py. Must run before any
`import jax` in test modules. x64 is enabled so float64 goldens are exact;
production code paths stay dtype-parametric (f32 on TPU).
"""

import os

# Force CPU regardless of the environment's JAX_PLATFORMS=axon: unit tests use
# the fake 8-device CPU mesh; only bench.py touches the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
# The axon sitecustomize claims the ONE real chip at interpreter startup when
# this var is non-empty. For the master process that claim (if any) already
# happened before this file ran, but clearing it here guarantees xdist
# workers — spawned AFTER conftest import, inheriting os.environ — start
# claim-free. Best practice remains `PALLAS_AXON_POOL_IPS= python -m pytest`.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# Slow-test gating (VERDICT r2 weak 5: the full suite exceeded 10 min; a gate
# that slow invites being skipped). Interpret-mode monsters are marked
# @pytest.mark.slow and excluded by default; `--runslow` (or RUN_SLOW=1) runs
# everything — the round's verify step uses the full suite.
# ---------------------------------------------------------------------------

def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long interpret-mode test, excluded by default "
                   "(run with --runslow or RUN_SLOW=1)")
    # Default to 4-way xdist parallelism (the CPU gate is interpret-mode
    # heavy and embarrassingly parallel across files). Done here rather than
    # via addopts so environments WITHOUT pytest-xdist still run (serially)
    # instead of dying on an unrecognized -n; explicit -n (incl. -n 0) wins.
    # (pytest_load_initial_conftests can't help: pytest only calls it for
    # setuptools plugins, never for conftest.py files.) This must run before
    # xdist's pytest_cmdline_main reads numprocesses — conftest configure
    # does. Workers re-enter this configure with workerinput set; skip them.
    if not hasattr(config, "workerinput"):
        try:
            import xdist  # noqa: F401
        except ImportError:
            pass
        else:
            if getattr(config.option, "numprocesses", None) is None:
                # xdist's own pytest_cmdline_main (which normally derives tx
                # from -n) has already run; set the derived options directly.
                # Conftest configure hooks run before plugin configure hooks,
                # so xdist's _is_distribution_mode sees these and registers
                # its DSession.
                config.option.numprocesses = 4
                config.option.dist = "load"
                config.option.tx = ["popen"] * 4


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow; use --runslow / RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
