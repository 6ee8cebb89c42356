"""Multi-host distributed runtime initialization.

Replaces the reference's NCCL process-group bootstrap
(torch.distributed.init_process_group("nccl"), train-MaDe.py:25) with
jax.distributed: one call per host before device use; afterwards
jax.devices() spans the slice/pod and the mesh/collective machinery in
mgsv_tpu.core.mesh works unchanged.  Rank-0 gating (the reference's
`args.local_rank == 0` checks everywhere) becomes `is_primary()`.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

logger = logging.getLogger("mgsv_tpu")

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX.  No-op on single-host (the common case —
    TPU pods auto-discover coordinates from the environment)."""
    global _initialized
    if _initialized:
        return
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
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (the reference's torch.distributed.barrier,
    train-MaDe.py:634) — implemented as a tiny global psum."""
    import jax.numpy as jnp

    x = jnp.ones(())
    jax.block_until_ready(
        jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(
            jnp.broadcast_to(x, (jax.local_device_count(),))))
