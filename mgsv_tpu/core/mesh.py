"""Device mesh construction and sharding helpers.

Replaces the reference's NCCL process-group / DistributedSampler scaffolding
(train-MaDe.py:25, dataloaders/data_dataloaders.py:11) with the JAX SPMD
model: one global mesh with a data-parallel axis ("dp") and a model axis
("mp", unused by the small MaDe head but part of the framework surface),
NamedSharding for batches, replicated params, XLA collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "mp"


def make_mesh(shape: Tuple[int, int] = (-1, 1),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp, mp) mesh.  shape=(-1, 1) puts every device on dp."""
    devices = list(devices if devices is not None else jax.devices())
    dp, mp = shape
    if dp == -1:
        assert len(devices) % mp == 0
        dp = len(devices) // mp
    if mp == -1:
        assert len(devices) % dp == 0
        mp = len(devices) // dp
    assert dp * mp == len(devices), (dp, mp, len(devices))
    try:
        # Topology-aware layout: keeps the mp axis on adjacent ICI links so
        # model collectives stay off DCN (mesh_utils handles multi-slice).
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh((dp, mp), devices=devices)
    except Exception:
        arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def fold_axis_into_seed(seed, axis: str = DATA_AXIS):
    """Decorrelate an in-kernel dropout seed across a mesh axis.

    The fused Pallas kernels tag PRNG draws with LOCAL row/tile indices
    (program_id-derived), so under shard_map with a replicated seed every
    shard would draw bit-identical keep masks.  Call this INSIDE the
    shard_map body, before the custom_vjp boundary, so forward and the
    backward recompute both see the folded seed (int32 wrap-around is fine
    for seeding).
    """
    import jax.numpy as jnp

    return seed + (jax.lax.axis_index(axis).astype(jnp.int32)
                   * jnp.int32(1000003))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over dp, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def process_local_rows(sharding: NamedSharding, n_rows: int) -> np.ndarray:
    """Global row indices (ascending) of a [n_rows, ...] batch that THIS
    process's devices own under `sharding`.

    The per-process feeding contract of make_array_from_process_local_data:
    local data must hold the process's global slices in ascending order.
    Derived from the sharding's own index map rather than assuming
    process-contiguous device order, so a permuted (e.g. topology-reordered)
    mesh cannot silently misfeed rows.  Replicated slices (mp > 1) dedup.
    """
    dmap = sharding.addressable_devices_indices_map((n_rows,))
    slices = sorted({(s[0].start or 0,
                      n_rows if s[0].stop is None else s[0].stop)
                     for s in dmap.values()})
    return np.concatenate([np.arange(lo, hi) for lo, hi in slices])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put every array in the batch with the dp-sharded layout."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
