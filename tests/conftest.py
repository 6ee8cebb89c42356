"""Test configuration: force an 8-device virtual CPU platform.

The reference has no fake backend for multi-device testing (SURVEY.md §4);
the standard JAX substitute is a host-platform device-count simulation so
sharding/collective code is exercised without real chips.
"""

import os

# Must be set before jax is imported anywhere in the test process.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
