"""MGSV-EC CSV index.

Parses the dataset CSVs (schema at dataset/MGSV-EC/test_data.csv:1) into
columnar numpy arrays once at startup — replacing the reference's per-item
pandas row reads inside Dataset.__getitem__
(dataloader_MGSV_EC_feature.py:29-54, a per-sample host cost in every
epoch).  Targets are precomputed for the whole split in one vectorized pass.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np
import pandas as pd


@dataclasses.dataclass
class CsvIndex:
    video_ids: List[str]
    music_ids: List[str]
    v_duration: np.ndarray       # [N] video_end - video_start (seconds)
    m_duration: np.ndarray       # [N] music_total_duration (seconds)
    gt_moment: np.ndarray        # [N, 1, 2] (music_start, music_end) seconds
    spans_target: np.ndarray     # [N, 1, 2] normalized (center, width)
    video_start: np.ndarray = None   # [N] seconds (raw-frame extraction window)
    video_end: np.ndarray = None     # [N] seconds

    def __len__(self) -> int:
        return len(self.video_ids)


def load_csv_index(csv_path: str, max_m_duration: float = 240.0) -> CsvIndex:
    df = pd.read_csv(csv_path)
    video_ids = [str(x) for x in df["video_id"].tolist()]
    music_ids = [str(x) for x in df["music_id"].tolist()]
    v_dur = (df["video_end"].to_numpy(np.float64)
             - df["video_start"].to_numpy(np.float64)).astype(np.float32)
    m_dur = df["music_total_duration"].to_numpy(np.float64).astype(np.float32)
    start = df["music_start"].to_numpy(np.float64).astype(np.float32)
    end = df["music_end"].to_numpy(np.float64).astype(np.float32)
    gt = np.stack([start, end], axis=-1)[:, None, :]          # [N, 1, 2]

    # get_cw_propotion (dataloader_MGSV_EC_feature.py:18-27): end clamped.
    end_c = np.minimum(end, max_m_duration)
    center = (start + end_c) / 2.0 / max_m_duration
    width = (end_c - start) / max_m_duration
    spans = np.stack([center, width], axis=-1)[:, None, :].astype(np.float32)

    return CsvIndex(video_ids, music_ids, v_dur, m_dur,
                    gt.astype(np.float32), spans,
                    video_start=df["video_start"].to_numpy(np.float64).astype(np.float32),
                    video_end=df["video_end"].to_numpy(np.float64).astype(np.float32))
