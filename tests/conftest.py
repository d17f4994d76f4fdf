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
