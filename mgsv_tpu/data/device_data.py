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

Multi-device meshes (VERDICT r3 task 2): the feature tables shard over the
dp axis (each device holds rows [i*rows_per : (i+1)*rows_per]) — the
HBM-resident analogue of the reference's DistributedSampler shard
(dataloaders/data_dataloaders.py:11).  Batch assembly runs under shard_map:
every device reads the batch rows it OWNS from its table shard (zeroing the
rest), then one psum_scatter over dp both sums the one-hot contributions
and deals each device its own dp-slice of the batch — a single fused
gather+all-to-all per table, O(batch bytes) over ICI instead of PCIe.
Values are bit-identical to the host pipeline (exactly one shard owns each
row; the others add exact fp zeros) — pinned in tests/test_device_data.py.

Duck-types the MgsvDataset iterator surface (epoch_batches / num_batches /
__len__ / index), so the Trainer and evaluator consume it unchanged; the
seeded per-epoch permutation (sampler.set_epoch semantics) is identical to
MgsvDataset.epoch_batches.
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mgsv_tpu.core.mesh import DATA_AXIS
from mgsv_tpu.data.dataset import (Batch, BatchMeta, MgsvDataset,
                                   epoch_index_batches)


def dataset_device_bytes(dataset: MgsvDataset) -> int:
    """Upload footprint (storage dtypes) of full device residency.

    With a dp-sharded mesh the per-device footprint is this divided by dp.
    """
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


def _make_lookup(mesh, rows_per: int):
    """shard_map table lookup: tables row-sharded over dp, batch rows out
    dp-sharded.  Each device contributes the rows it owns (others add exact
    zeros) and psum_scatter deals out the batch — one collective per table.
    """

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )
    def lookup(tab, msk, rows):
        # tab: [rows_per, L, D] local shard; msk: [rows_per, L]; rows: [B]
        i = jax.lax.axis_index(DATA_AXIS)
        rel = rows - i * rows_per
        own = (rel >= 0) & (rel < rows_per)
        safe = jnp.clip(rel, 0, rows_per - 1)
        f = tab[safe] * own[:, None, None].astype(tab.dtype)
        m = msk[safe].astype(jnp.float32) * own[:, None]
        # scatter in the storage dtype: exactly one nonzero term per row, so
        # the sum is exact at any precision and bytes on ICI stay minimal
        f = jax.lax.psum_scatter(f, DATA_AXIS, scatter_dimension=0,
                                 tiled=True)
        m = jax.lax.psum_scatter(m, DATA_AXIS, scatter_dimension=0,
                                 tiled=True)
        return f, m

    return lookup


@functools.lru_cache(maxsize=8)
def _sharded_gather_program(mesh, rows_v: int, rows_m: int):
    lookup_v = _make_lookup(mesh, rows_v)
    lookup_m = _make_lookup(mesh, rows_m)
    rows_sharding = NamedSharding(mesh, P(DATA_AXIS))

    def gather(data, idx):
        idx = idx.astype(jnp.int32)
        vr = data["video_rows"][idx]
        mr = data["music_rows"][idx]
        ff, fm = lookup_v(data["vf"], data["vm"], vr)
        sf, sm = lookup_m(data["mf"], data["mm"], mr)
        # per-row metadata reads come from replicated tables; constrain them
        # to the same dp layout as the feature tensors so the downstream
        # train/eval step partitions exactly like the host-pipeline batch
        con = lambda x: jax.lax.with_sharding_constraint(x, rows_sharding)
        return {
            "frame_feats": ff.astype(jnp.float32) * fm[..., None],
            "frame_mask": fm,
            "segment_feats": sf.astype(jnp.float32) * sm[..., None],
            "segment_mask": sm,
            "spans_target": con(data["spans"][idx]),
            "gt_moment": con(data["gt"][idx]),
            "m_duration": con(data["mdur"][idx]),
            "v_duration": con(data["vdur"][idx]),
        }

    return gather, jax.jit(gather)


class DeviceResidentData:
    def __init__(self, dataset: MgsvDataset, mesh=None):
        self.index = dataset.index
        self.mesh = (mesh if mesh is not None and mesh.devices.size > 1
                     else None)
        if jax.process_count() > 1 and self.mesh is None:
            raise ValueError(
                "multi-process device residency needs the global mesh: the "
                "resident tables are global dp-sharded arrays (each process "
                "uploads the rows its devices own), so a mesh spanning "
                "every process's devices must be passed")
        n_v = len(dataset.video_store)
        n_m = len(dataset.music_store)
        all_v = np.arange(n_v)
        all_m = np.arange(n_m)
        # storage dtypes on device (dtype=None keeps whatever the store
        # holds — fp16 from the packers, f32 if a store was built that way);
        # cast to f32 inside the gather program
        host = {
            "vf": dataset.video_store.gather("feats", all_v, dtype=None),
            "vm": dataset.video_store.gather("mask", all_v, dtype=None),
            "mf": dataset.music_store.gather("feats", all_m, dtype=None),
            "mm": dataset.music_store.gather("mask", all_m, dtype=None),
        }
        if self.mesh is None:
            put_table = jnp.asarray
            put_meta = jnp.asarray
            self.gather_fn = gather_batch
            gather_jit = gather_batch
        else:
            dp = self.mesh.shape[DATA_AXIS]
            table_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
            replicated = NamedSharding(self.mesh, P())

            def put_table(arr):
                pad = (-arr.shape[0]) % dp
                if pad:
                    arr = np.concatenate(
                        [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
                return jax.device_put(arr, table_sharding)

            put_meta = lambda arr: jax.device_put(np.asarray(arr), replicated)
            rows_v = -(-n_v // dp)
            rows_m = -(-n_m // dp)
            self.gather_fn, gather_jit = _sharded_gather_program(
                self.mesh, rows_v, rows_m)

        self._video_rows_np = np.asarray(dataset.video_rows)
        self._music_rows_np = np.asarray(dataset.music_rows)
        ix = self.index
        self.tree = {
            "vf": put_table(host["vf"]), "vm": put_table(host["vm"]),
            "mf": put_table(host["mf"]), "mm": put_table(host["mm"]),
            "video_rows": put_meta(self._video_rows_np.astype(np.int32)),
            "music_rows": put_meta(self._music_rows_np.astype(np.int32)),
            "spans": put_meta(ix.spans_target.astype(np.float32)),
            "gt": put_meta(ix.gt_moment.astype(np.float32)),
            "mdur": put_meta(ix.m_duration.astype(np.float32)),
            "vdur": put_meta(ix.v_duration.astype(np.float32)),
        }
        # The resident arrays are jit ARGUMENTS, not closure captures — a
        # captured device array is embedded into the lowered program as a
        # constant (double HBM + a compile payload carrying the whole
        # dataset, which overflows remote-compile transports).
        self._gather = lambda idx: gather_jit(self.tree, idx)

    def __len__(self) -> int:
        return len(self.index)

    def num_batches(self, batch_size: int, drop_last: bool = True) -> int:
        n = len(self)
        return n // batch_size if drop_last else -(-n // batch_size)

    def epoch_batches(
        self, batch_size: int, *, shuffle: bool, seed: int = 0, epoch: int = 0,
        drop_last: bool = True, start_batch: int = 0,
    ) -> Iterator[Tuple[Batch, BatchMeta]]:
        if self.mesh is not None:
            dp = self.mesh.shape[DATA_AXIS]
            if batch_size % dp != 0:
                # user-reachable config error: must survive python -O (a bare
                # assert would strip and fail later as an opaque shard_map
                # shape error)
                raise ValueError(
                    f"batch_size {batch_size} must be divisible by the dp "
                    f"axis size {dp} (the sharded gather deals each device "
                    "batch_size/dp rows)")
        ix = self.index
        for idx, valid in epoch_index_batches(
                len(self), batch_size, shuffle=shuffle, seed=seed,
                epoch=epoch, drop_last=drop_last, start_batch=start_batch):
            # idx stays a host numpy array into the jitted gather: an
            # uncommitted input is placed by the program itself, which under
            # a multi-process mesh means replicated over the GLOBAL mesh
            # (a jnp.asarray here would commit it to this process's default
            # device and clash with the global table arrays)
            batch = dict(self._gather(np.asarray(idx, np.int32)))
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
