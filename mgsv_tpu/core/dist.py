"""Multi-host distributed runtime initialization.

Replaces the reference's NCCL process-group bootstrap
(torch.distributed.init_process_group("nccl"), train-MaDe.py:25) with
jax.distributed: one call per host before device use; afterwards
jax.devices() spans the slice/pod and the mesh/collective machinery in
mgsv_tpu.core.mesh works unchanged.  Rank-0 gating (the reference's
`args.local_rank == 0` checks everywhere) becomes `is_primary()`.

The whole surface is exercised (2 OS processes x 4 virtual CPU devices,
global mesh, one SPMD train step, barrier) by
tests/test_multiprocess.py — the simulated stand-in for a real pod this
environment cannot provide (SURVEY.md §4 "no fake backend" gap).
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger("mgsv_tpu")

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               platform: Optional[str] = None,
               num_cpu_devices: Optional[int] = None) -> None:
    """Initialize multi-host JAX.  No-op on single-host (the common case —
    TPU pods auto-discover coordinates from the environment).

    platform="cpu" + num_cpu_devices=N runs an N-virtual-device CPU
    process (gloo cross-process collectives) — the multi-host simulation
    used by the test suite.  Platform forcing must happen here, before
    jax.distributed touches the backend: sites that force-register a PJRT
    plugin in sitecustomize ignore JAX_PLATFORMS from the shell
    (mgsv_tpu/core/platform.py), and force_platform() itself initializes
    the backend, which would be too late.
    """
    global _initialized
    if _initialized:
        return
    import jax

    if platform is not None:
        # config updates only — jax.default_backend() here would
        # initialize the backend before jax.distributed can register the
        # other processes' devices.
        jax.config.update("jax_platforms", platform)
        if platform == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
            if num_cpu_devices:
                import os
                import re

                # replace (not skip) any pre-existing count: a shell's
                # XLA_FLAGS with a different value would silently win and
                # the caller's mesh asserts would fail far from the cause
                flags = os.environ.get("XLA_FLAGS", "")
                flags = re.sub(
                    r"--xla_force_host_platform_device_count=\d+", "",
                    flags).strip()
                os.environ["XLA_FLAGS"] = (
                    f"{flags} --xla_force_host_platform_device_count="
                    f"{int(num_cpu_devices)}").strip()
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address, num_processes,
                                       process_id)
        else:
            jax.distributed.initialize()
        _initialized = True
        logger.info("jax.distributed initialized: process %d/%d, %d local / %d global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
    except Exception as e:
        # single-process environments raise; that's fine
        logger.debug("jax.distributed.initialize skipped: %s", e)


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def process_count() -> int:
    import jax

    return jax.process_count()


def to_host(x):
    """Fetch a per-row device array to a host numpy copy on EVERY process.

    Single-process: plain np.asarray.  Multi-process: the array may be a
    non-addressable GLOBAL array (dp-sharded or replicated), so gather its
    shards with process_allgather(tiled=True) — tiled means x already has
    global shape (untiled stacking is for host-local per-process data).
    Shared by Trainer epoch aggregation and the evaluator."""
    import numpy as np

    if process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (the reference's torch.distributed.barrier,
    train-MaDe.py:634): a named psum_scalar over every global device via
    multihost_utils — the upstream-supported SPMD barrier (the previous
    pmap-over-local-devices version never crossed hosts)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
