"""Test harness configuration.

Tests run hermetically on CPU with 8 virtual devices (so multi-chip sharding
logic is exercised without TPU hardware) and with x64 enabled (so numeric
parity with the float64 reference semantics is checked at full precision).
The real-TPU path is exercised by bench.py / __graft_entry__.py instead.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The slow tier is dominated by XLA compiles of shape-bucketed tracker/BA
# programs on this 1-core host; a persistent compilation cache makes repeat
# runs (and shared shapes across test files) pay each compile once.
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_compile_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
