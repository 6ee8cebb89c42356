"""Test configuration: force an 8-device virtual CPU platform.

The reference has no fake backend for multi-device testing (SURVEY.md §4);
the standard JAX substitute is a host-platform device-count simulation so
sharding/collective code is exercised without real chips.

The environment exports JAX_PLATFORMS=axon (the TPU tunnel) and jax may
already be imported by the interpreter, so we override via jax.config —
XLA_FLAGS is read lazily at backend initialization, which hasn't happened
yet at conftest time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache for the WHOLE suite (VERDICT r4 #7):
# full-suite wall time is dominated by jit compiles on this 1-core box, and
# most tests recompile the same programs run after run.  The cache is keyed
# on HLO hash (stale entries are impossible by construction), so repeat
# full-suite runs skip every unchanged compile.  In-process subprocesses
# (multi-process CLI tests) enable the same cache via their CLI entries.
from mgsv_tpu.core.cache import enable as _enable_cache  # noqa: E402

_enable_cache()

assert len(jax.devices()) == 8, (
    "expected 8 virtual CPU devices; got "
    f"{jax.devices()} on backend {jax.default_backend()}"
)
