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
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
