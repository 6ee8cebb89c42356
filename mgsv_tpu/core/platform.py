"""Explicit JAX platform selection for the CLIs.

This environment (and any site that force-registers a PJRT plugin in
sitecustomize) can ignore `JAX_PLATFORMS` from the shell, so `env
JAX_PLATFORMS=cpu python -m mgsv_tpu.cli.train ...` may silently land on the
TPU backend.  The reliable override is `jax.config.update` *in-process,
before first backend use* — the same mechanism tests/conftest.py uses.  The
CLIs expose it as `--platform cpu [--cpu-devices N]`.
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger("mgsv_tpu")


def force_platform(platform: Optional[str], num_cpu_devices: Optional[int] = None):
    """Force the JAX platform before any backend initialization.

    platform=None is a no-op (keep the environment's default backend).
    Raises RuntimeError if the backend was already initialized with a
    different platform — at that point the override can't take effect and
    silently continuing would run on the wrong hardware.
    """
    if platform is None:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platform)
        if platform == "cpu" and num_cpu_devices:
            jax.config.update("jax_num_cpu_devices", int(num_cpu_devices))
    except RuntimeError as e:
        backend = jax.default_backend()
        if backend != platform:
            raise RuntimeError(
                f"--platform {platform} requested but the {backend} backend is "
                "already initialized; pass --platform before any jax use"
            ) from e
    backend = jax.default_backend()
    if backend != platform:
        raise RuntimeError(
            f"--platform {platform} did not take effect (backend={backend})")
    logger.info("forced platform=%s (%d devices)", backend, len(jax.devices()))
