"""Corpus-level retrieval / localization / composite metrics.

Host-side (numpy) re-derivation of utils/util_test.py — these run once per
eval epoch on small [val_len, val_len] matrices, so they stay on CPU while
everything upstream (model forward, similarity) is jit-compiled on device.

Faithful semantics, including:
  * music-id deduplicated ranking (util_test.py:44-68) — when several rows
    share a music id, rank of the GT id is counted among *distinct* ids;
  * strict '>' threshold comparisons for IoU@t (util_test.py:108-110);
  * composite R@k ^ IoU>t normalized by val_len, R@k_miou by hit count
    (util_test.py:140-199).

The reference's non-dedup branch is broken (undefined ret_results_list,
util_test.py:69-97) and is intentionally fixed here rather than replicated.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def dedup_rank(sim_matrix: np.ndarray, music_ids: Sequence[str]) -> np.ndarray:
    """Rank (0-based) of each row's GT music id among deduplicated ids.

    sim_matrix: [N, N] similarity, row i's GT is music_ids[i].
    Vectorized equivalent of the reference's per-row python scan
    (util_test.py:44-68).
    """
    n = sim_matrix.shape[0]
    codes = np.unique(np.asarray(music_ids), return_inverse=True)[1]  # [N] int
    order = np.argsort(-sim_matrix, axis=1, kind="stable")            # [N, N]
    sorted_codes = codes[order]                                       # [N, N]
    ranks = np.empty(n, dtype=np.int64)
    for i in range(n):
        row = sorted_codes[i]
        _, first_idx = np.unique(row, return_index=True)
        # dedup position of element j = #distinct codes seen in row[:j+1] - 1
        is_first = np.zeros(n, dtype=bool)
        is_first[first_idx] = True
        dedup_pos = np.cumsum(is_first) - 1
        gt_first = np.flatnonzero(row == codes[i])[0]
        ranks[i] = dedup_pos[gt_first]
    return ranks


def rect_rank(sim_matrix: np.ndarray, col_music_ids: Sequence[str],
              gt_music_ids: Sequence[str]) -> np.ndarray:
    """Rank (0-based) of each row's GT track in a [N_videos, N_tracks]
    similarity over UNIQUE tracks.

    Pod-scale form of `dedup_rank`: columns that share a music id produce
    identical similarity columns (the pooled similarity depends only on
    (video, track)), so scoring each unique track once and ranking is
    exactly the reference's deduplicated ranking (util_test.py:44-68)
    computed without the duplicated columns — [53k, 4k] instead of
    [53k, 53k] at MGSV-EC full scale (SURVEY.md §2.7).  Equivalence with
    dedup_rank is pinned in tests/test_eval_metrics.py.
    """
    sim_matrix = np.asarray(sim_matrix, dtype=np.float64)
    cols = np.asarray(col_music_ids)
    assert len(np.unique(cols)) == len(cols), "columns must be unique tracks"
    col_of = {m: j for j, m in enumerate(cols)}
    gt_col = np.asarray([col_of[m] for m in gt_music_ids])
    gt_sim = sim_matrix[np.arange(len(gt_col)), gt_col]
    # rank = #tracks strictly better + #equal-and-earlier-in-sort-order
    # (matches argsort(kind="stable") + first-occurrence scan semantics)
    better = (sim_matrix > gt_sim[:, None]).sum(axis=1)
    ties = (sim_matrix == gt_sim[:, None])
    tie_before = np.asarray(
        [ties[i, :gt_col[i]].sum() for i in range(len(gt_col))])
    return better + tie_before


def recall_metrics_rect(
    sim_matrix: np.ndarray, col_music_ids: Sequence[str],
    gt_music_ids: Sequence[str],
) -> Tuple[Dict[str, float], np.ndarray]:
    """Recall metrics over a rectangular video x unique-track similarity."""
    ranks = rect_rank(sim_matrix, col_music_ids, gt_music_ids)
    n = len(ranks)
    metrics: Dict[str, float] = {}
    for k in (1, 3, 5, 10, 20, 25, 50, 100):
        metrics[f"R{k}"] = float(np.sum(ranks < k)) * 100.0 / n
    metrics["MedianR"] = float(np.median(ranks) + 1)
    metrics["MeanR"] = float(np.mean(ranks) + 1)
    metrics["MRR"] = float(np.mean(1.0 / (ranks + 1)))
    return metrics, ranks


def recall_metrics(
    sim_matrix: np.ndarray, music_ids: Sequence[str]
) -> Tuple[Dict[str, float], np.ndarray, List[dict]]:
    """Dedup recall metrics — util_test.py:32-97.

    Returns (metrics, ranks, per-sample results).
    """
    sim_matrix = np.asarray(sim_matrix, dtype=np.float64)
    ranks = dedup_rank(sim_matrix, music_ids)
    order = np.argsort(-sim_matrix, axis=1, kind="stable")

    results = []
    ids = list(music_ids)
    for i in range(len(ids)):
        results.append(dict(
            music_id=ids[i],
            rank=int(ranks[i]) + 1,
            topk_music_ids=[ids[order[i, 0]]],
        ))

    n = len(ranks)
    metrics: Dict[str, float] = {}
    for k in (1, 3, 5, 10, 20, 25, 50, 100):
        metrics[f"R{k}"] = float(np.sum(ranks < k)) * 100.0 / n
    metrics["MedianR"] = float(np.median(ranks) + 1)
    metrics["MeanR"] = float(np.mean(ranks) + 1)
    metrics["MRR"] = float(np.mean(1.0 / (ranks + 1)))
    return metrics, ranks, results


def iou_metrics(iou_list: np.ndarray) -> Dict[str, float]:
    """util_test.py:101-111 (strict > thresholds)."""
    iou = np.asarray(iou_list, dtype=np.float64)
    return {
        "mIoU": float(iou.mean()),
        "IoU@0.3": float((iou > 0.3).sum()) * 100.0 / len(iou),
        "IoU@0.5": float((iou > 0.5).sum()) * 100.0 / len(iou),
        "IoU@0.7": float((iou > 0.7).sum()) * 100.0 / len(iou),
    }


def composite_metrics(ranks: np.ndarray, iou_list: np.ndarray) -> Dict[str, float]:
    """Joint retrieval ^ localization — util_test.py:140-199."""
    ranks = np.asarray(ranks)
    iou = np.asarray(iou_list, dtype=np.float64)
    n = len(ranks)
    out: Dict[str, float] = {}
    for k in (1, 10, 50, 100):
        hit = (ranks + 1) <= k
        n_hit = int(hit.sum())
        out[f"R{k}_iou0.5"] = float((hit & (iou > 0.5)).sum()) / n * 100.0
        out[f"R{k}_iou0.7"] = float((hit & (iou > 0.7)).sum()) / n * 100.0
        # NOTE: the reference divides the miou accumulators by val_len AND
        # by the hit count (util_test.py:191-198) — preserved as-is.
        out[f"R{k}_miou"] = (
            float(iou[hit].sum() / n / n_hit) if n_hit > 0 else 0.0)
    return out


def save_results_json(
    ret_results: List[dict],
    loc_results: List[dict],
    iou_list: np.ndarray,
    save_path: str,
    max_m_duration: float = 240.0,
) -> None:
    """Per-sample eval dump — util_test.py:202-226."""
    import json

    rows = []
    for ret, loc, iou in zip(ret_results, loc_results, iou_list):
        assert ret["music_id"] == loc["music_id"]
        rows.append(dict(
            video_id=loc["video_id"],
            music_id=ret["music_id"],
            topk_mids=ret["topk_music_ids"],
            gt_mid_rank=ret["rank"],
            iou=round(float(iou), 4),
            m_duration=loc["m_duration"],
            gt_st=round(float(loc["gt_moment"][0][0]), 3),
            gt_ed=round(float(loc["gt_moment"][0][1]), 3),
            pred_st=round(max(float(loc["pred_st"]), 0.0), 3),
            pred_ed=round(min(float(loc["pred_ed"]), max_m_duration), 3),
        ))
    with open(save_path, "w") as f:
        json.dump(rows, f, indent=4)
