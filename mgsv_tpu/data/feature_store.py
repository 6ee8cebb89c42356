"""Packed memory-mapped feature store.

The reference reads one torch-pickle `.pt` file per id per __getitem__
(dataloader_MGSV_EC_feature.py:57-67) across 32 dataloader worker processes
— per-sample file opens, pickle parsing, and copies.  TPU-native
replacement: one contiguous `.npy` per tensor (float16 features, uint8
masks), memory-mapped once, with O(1) row gather by id.  Sequential layout
means the OS page cache and readahead do the prefetching; a batch gather is
a single fancy-index copy.

Store layout (directory):
    meta.json       {"ids": [...], "arrays": {name: {"shape": ..., "dtype": ...}}}
    <name>.npy      one per array, shape [N, ...]

Also provides the one-time converter from a reference feature directory
(`vit_feature/{id}.pt` etc.) into a packed store — torch is imported only
inside the converter.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Mapping, Optional, Sequence

import numpy as np


class PackedFeatureStore:
    """Immutable memmapped id -> row feature store.

    Row gathers go through the native C++ runtime (mmap + threaded memcpy
    with fused fp16->fp32 widening, mgsv_tpu/runtime/mgsv_io.cc) when the
    toolchain is available, else a numpy memmap fallback.
    """

    def __init__(self, root: str, use_native: bool = True):
        self.root = root
        with open(os.path.join(root, "meta.json")) as f:
            meta = json.load(f)
        self.ids: List[str] = meta["ids"]
        self.row_of: Dict[str, int] = {i: r for r, i in enumerate(self.ids)}
        self.arrays: Dict[str, object] = {}
        for name, spec in meta["arrays"].items():
            path = os.path.join(root, f"{name}.npy")
            store = None
            if use_native:
                try:
                    from mgsv_tpu.runtime.native import NativeStore
                    store = NativeStore(path, spec["shape"], spec["dtype"])
                except Exception:
                    store = None
            self.arrays[name] = store if store is not None else np.load(
                path, mmap_mode="r")

    def __len__(self) -> int:
        return len(self.ids)

    def rows(self, ids: Sequence[str]) -> np.ndarray:
        return np.asarray([self.row_of[i] for i in ids], dtype=np.int64)

    def gather(self, name: str, row_idx: np.ndarray,
               dtype: Optional[np.dtype] = np.float32) -> np.ndarray:
        arr = self.arrays[name]
        if hasattr(arr, "gather"):
            return arr.gather(row_idx, out_dtype=dtype or None)
        out = arr[row_idx]
        return out.astype(dtype) if dtype is not None else np.asarray(out)

    def prefetch(self, name: str, row_idx: np.ndarray) -> None:
        arr = self.arrays[name]
        if hasattr(arr, "prefetch"):
            arr.prefetch(row_idx)

    @staticmethod
    def build(root: str, ids: Sequence[str],
              arrays: Mapping[str, np.ndarray]) -> "PackedFeatureStore":
        os.makedirs(root, exist_ok=True)
        meta = {"ids": list(ids), "arrays": {}}
        for name, arr in arrays.items():
            assert arr.shape[0] == len(ids), (name, arr.shape, len(ids))
            np.save(os.path.join(root, f"{name}.npy"), arr)
            meta["arrays"][name] = {"shape": list(arr.shape), "dtype": str(arr.dtype)}
        with open(os.path.join(root, "meta.json"), "w") as f:
            json.dump(meta, f)
        return PackedFeatureStore(root)


def convert_reference_features(
    feature_dir: str,
    mask_dir: str,
    ids: Sequence[str],
    out_root: str,
    feature_name: str = "feats",
    mask_name: str = "mask",
    feature_dtype=np.float16,
) -> PackedFeatureStore:
    """One-time packer: reference per-id .pt files -> packed store.

    feature_dir/{id}.pt  (e.g. features/Kuai_feature/vit_feature1/vit_feature)
    mask_dir/{id}.pt     (e.g. .../vit_mask)
    Deduplicates ids (multiple CSV rows share music ids).
    """
    import torch  # converter-only dependency

    uniq = list(dict.fromkeys(ids))
    feats, masks = [], []
    for i in uniq:
        f = torch.load(os.path.join(feature_dir, f"{i}.pt"), map_location="cpu")
        m = torch.load(os.path.join(mask_dir, f"{i}.pt"), map_location="cpu")
        feats.append(f.detach().to(torch.float32).numpy().astype(feature_dtype))
        masks.append(m.detach().to(torch.uint8).numpy())
    return PackedFeatureStore.build(
        out_root, uniq,
        {feature_name: np.stack(feats), mask_name: np.stack(masks)},
    )
