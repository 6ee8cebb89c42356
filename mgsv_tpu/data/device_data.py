"""Whole-dataset device residency with on-device batch gather.

For datasets that fit in HBM (MGSV-EC scale easily does: 53k videos x 50 x
512 fp16 ~ 2.6 GB + 4k tracks x 96 x 768 fp16 ~ 0.6 GB on a 16 GB chip),
the fastest input pipeline is NO pipeline: upload the packed stores once in
their storage dtype (fp16 features, uint8 masks), then assemble every batch
ON DEVICE with one jitted fancy-index gather.  Per-step host work collapses
to shipping a [bs] int32 index array.

This matters doubly over a remote-TPU link (this environment: per-batch
uploads of ~100 MB dominated the 55 ms step by >100x), and it is the
idiomatic answer on local hardware too — PCIe traffic per step drops from
O(batch bytes) to O(batch indices).

Duck-types the MgsvDataset iterator surface (epoch_batches / num_batches /
__len__ / index), so the Trainer and evaluator consume it unchanged; the
seeded per-epoch permutation (sampler.set_epoch semantics) is identical to
MgsvDataset.epoch_batches.
"""

from __future__ import annotations

import functools
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mgsv_tpu.data.dataset import (Batch, BatchMeta, MgsvDataset,
                                   epoch_index_batches)


def dataset_device_bytes(dataset: MgsvDataset) -> int:
    """Upload footprint (storage dtypes) of full device residency."""
    total = 0
    for store in (dataset.video_store, dataset.music_store):
        for spec in store.arrays.values():
            shape = getattr(spec, "shape", None)
            if shape is None:
                continue
            itemsize = np.dtype(getattr(spec, "dtype", np.float16)).itemsize
            total += int(np.prod(shape)) * itemsize
    return total


@jax.jit
def gather_batch(data, idx):
    """Pure on-device batch assembly from the resident store tree — also
    callable under an outer jit/scan (eval/evaluator.py single-dispatch
    path)."""
    vr = data["video_rows"][idx]
    mr = data["music_rows"][idx]
    fm = data["vm"][vr].astype(jnp.float32)
    sm = data["mm"][mr].astype(jnp.float32)
    ff = data["vf"][vr].astype(jnp.float32) * fm[..., None]
    sf = data["mf"][mr].astype(jnp.float32) * sm[..., None]
    return {
        "frame_feats": ff, "frame_mask": fm,
        "segment_feats": sf, "segment_mask": sm,
        "spans_target": data["spans"][idx],
        "gt_moment": data["gt"][idx],
        "m_duration": data["mdur"][idx],
        "v_duration": data["vdur"][idx],
    }


class DeviceResidentData:
    def __init__(self, dataset: MgsvDataset):
        self.index = dataset.index
        n_v = len(dataset.video_store)
        n_m = len(dataset.music_store)
        all_v = np.arange(n_v)
        all_m = np.arange(n_m)
        # storage dtypes on device (dtype=None keeps whatever the store
        # holds — fp16 from the packers, f32 if a store was built that way);
        # cast to f32 inside the gather program
        self._vf = jnp.asarray(
            dataset.video_store.gather("feats", all_v, dtype=None))
        self._vm = jnp.asarray(
            dataset.video_store.gather("mask", all_v, dtype=None))
        self._mf = jnp.asarray(
            dataset.music_store.gather("feats", all_m, dtype=None))
        self._mm = jnp.asarray(
            dataset.music_store.gather("mask", all_m, dtype=None))
        self._video_rows = jnp.asarray(dataset.video_rows, jnp.int32)
        self._music_rows = jnp.asarray(dataset.music_rows, jnp.int32)
        self._music_rows_np = np.asarray(dataset.music_rows)
        ix = self.index
        self._spans = jnp.asarray(ix.spans_target, jnp.float32)
        self._gt = jnp.asarray(ix.gt_moment, jnp.float32)
        self._mdur = jnp.asarray(ix.m_duration, jnp.float32)
        self._vdur = jnp.asarray(ix.v_duration, jnp.float32)

        # The resident arrays are jit ARGUMENTS, not closure captures — a
        # captured device array is embedded into the lowered program as a
        # constant (double HBM + a compile payload carrying the whole
        # dataset, which overflows remote-compile transports).
        self.tree = {
            "vf": self._vf, "vm": self._vm, "mf": self._mf, "mm": self._mm,
            "video_rows": self._video_rows, "music_rows": self._music_rows,
            "spans": self._spans, "gt": self._gt,
            "mdur": self._mdur, "vdur": self._vdur,
        }
        self._gather = lambda idx: gather_batch(self.tree, idx)

    def __len__(self) -> int:
        return len(self.index)

    def num_batches(self, batch_size: int, drop_last: bool = True) -> int:
        n = len(self)
        return n // batch_size if drop_last else -(-n // batch_size)

    def epoch_batches(
        self, batch_size: int, *, shuffle: bool, seed: int = 0, epoch: int = 0,
        drop_last: bool = True,
    ) -> Iterator[Tuple[Batch, BatchMeta]]:
        ix = self.index
        for idx, valid in epoch_index_batches(
                len(self), batch_size, shuffle=shuffle, seed=seed,
                epoch=epoch, drop_last=drop_last):
            batch = dict(self._gather(jnp.asarray(idx, jnp.int32)))
            # integer track codes for the ignore_same_music InfoNCE branch
            # (host-side: [bs] ints are a trivial upload)
            batch["music_codes"] = np.unique(
                self._music_rows_np[idx], return_inverse=True)[1].astype(np.int32)
            meta = BatchMeta(
                video_ids=[ix.video_ids[i] for i in idx],
                music_ids=[ix.music_ids[i] for i in idx],
                valid=valid,
            )
            yield batch, meta
