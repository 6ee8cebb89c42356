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

from mgsv_tpu.data.dataset import Batch, BatchMeta, MgsvDataset


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
) -> Iterator[Tuple[Batch, BatchMeta]]:
    """Iterate (device_batch, meta) with `depth` batches in flight."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def producer():
        try:
            for batch, meta in dataset.epoch_batches(
                    batch_size, shuffle=shuffle, seed=seed, epoch=epoch,
                    drop_last=drop_last):
                if stop.is_set():
                    return
                if sharding is not None:
                    batch = {k: jax.device_put(v, sharding)
                             for k, v in batch.items()}
                else:
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                q.put((batch, meta))
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
