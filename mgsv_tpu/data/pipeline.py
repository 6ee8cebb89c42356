"""Input pipeline: background batch assembly + device prefetch.

The reference overlaps IO with compute via 32 DataLoader worker processes
(scripts/train_kuai_all_feature.sh --num_workers 32).  Here a single
background thread assembles the next batch (the gather is a native-code
memcpy that releases the GIL) and device_puts it while the current step
runs — double buffering against an accelerator whose dispatch is already
asynchronous.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from mgsv_tpu.data.dataset import (Batch, BatchMeta, MgsvDataset,
                                   epoch_index_batches)


def make_batch_shipper(dataset: MgsvDataset, sharding=None):
    """Returns ship(idx, valid) -> (device_batch, meta) for one global batch.

    Single-process: host-gather the full batch and device_put (optionally
    with a dp sharding).  Multi-process (jax.process_count() > 1): each
    process host-gathers ONLY the rows its devices own and assembles the
    global array with jax.make_array_from_process_local_data — the
    per-process feeding role of the reference's DistributedSampler
    (dataloaders/data_dataloaders.py:11; per-GPU batch = global/gpu_num,
    :14).  The epoch index stream is seeded and identical on every process,
    so the global batch is the same multiset of rows either way; meta stays
    GLOBAL (eval aggregations see every row's ids on every process).
    """
    multiproc = jax.process_count() > 1
    if not multiproc:
        def ship(idx, valid):
            batch, meta = dataset.gather(idx)
            meta.valid &= valid
            if sharding is not None:
                batch = {k: jax.device_put(v, sharding)
                         for k, v in batch.items()}
            else:
                batch = {k: jax.device_put(v) for k, v in batch.items()}
            return batch, meta
        return ship

    assert sharding is not None, (
        "multi-process feeding needs the global batch sharding")
    from mgsv_tpu.core.mesh import process_local_rows

    def ship(idx, valid):
        gbs = len(idx)
        local = process_local_rows(sharding, gbs)
        sub, _ = dataset.gather(idx[local])
        # music_codes must encode track identity across the GLOBAL batch
        # (the ignore_same_music InfoNCE negatives span all dp shards) —
        # recompute from the global index stream and slice.
        codes = np.unique(dataset.music_rows[idx],
                          return_inverse=True)[1].astype(np.int32)
        sub["music_codes"] = codes[local]
        batch = {
            k: jax.make_array_from_process_local_data(
                sharding, v, (gbs,) + v.shape[1:])
            for k, v in sub.items()
        }
        ix = dataset.index
        meta = BatchMeta(
            video_ids=[ix.video_ids[i] for i in idx],
            music_ids=[ix.music_ids[i] for i in idx],
            valid=valid,
        )
        return batch, meta

    return ship


def prefetch_epoch(
    dataset: MgsvDataset,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int = 0,
    epoch: int = 0,
    drop_last: bool = True,
    sharding=None,
    depth: int = 2,
    start_batch: int = 0,
) -> Iterator[Tuple[Batch, BatchMeta]]:
    """Iterate (device_batch, meta) with `depth` batches in flight."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    ship = make_batch_shipper(dataset, sharding)

    def producer():
        try:
            for idx, valid in epoch_index_batches(
                    len(dataset), batch_size, shuffle=shuffle, seed=seed,
                    epoch=epoch, drop_last=drop_last,
                    start_batch=start_batch):
                if stop.is_set():
                    return
                q.put(ship(idx, valid))
        except BaseException as e:  # pragma: no cover
            q.put(("__error__", e))
        finally:
            q.put(None)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, tuple) and item[0] == "__error__":
                raise item[1]
            yield item
    finally:
        stop.set()
        # drain so the producer can exit
        while thread.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        thread.join(timeout=5)
