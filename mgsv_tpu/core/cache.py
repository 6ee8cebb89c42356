"""Persistent XLA compilation cache setup.

First compiles over the remote-TPU tunnel are expensive (tens of seconds
for the train step, minutes for large Pallas kernels); the persistent cache
makes them one-time per machine.  Called by the CLIs before first device
use.
"""

from __future__ import annotations

import os

import jax


def enable(cache_dir: str = "") -> None:
    cache_dir = cache_dir or os.environ.get(
        "MGSV_COMPILE_CACHE", os.path.expanduser("~/.cache/mgsv_tpu/xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
