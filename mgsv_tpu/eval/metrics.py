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

import functools
from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


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
    # rank = #tracks strictly better + #exact-ties that sort earlier.
    # In the square matrix's stable argsort the first occurrence of a track
    # is its earliest VIDEO-order column, so a tied track counts before the
    # GT iff its first occurrence in gt_music_ids is earlier — NOT iff its
    # unique-column index is smaller.  Tracks absent from gt_music_ids have
    # no column in the square formulation at all: they never count on a
    # tie (strictly-better absent tracks still count — they are real
    # catalog candidates; the square equivalence is only defined when the
    # catalog equals the split's unique tracks, as at 53k x 4k).
    better = (sim_matrix > gt_sim[:, None]).sum(axis=1)
    ties = (sim_matrix == gt_sim[:, None])
    tie_key = _first_occurrence_keys(cols, col_of, gt_music_ids)
    tie_before = (ties & (tie_key[None, :] < tie_key[gt_col][:, None])).sum(axis=1)
    return better + tie_before


def _first_occurrence_keys(cols: np.ndarray, col_of: Dict,
                           gt_music_ids: Sequence[str]) -> np.ndarray:
    """Per unique-track column: first row index in gt_music_ids whose GT is
    that track (= the track's earliest video-order column in the square
    matrix), or N for tracks no video uses."""
    n = len(gt_music_ids)
    keys = np.full(len(cols), n, dtype=np.int64)
    for i in range(n - 1, -1, -1):
        keys[col_of[gt_music_ids[i]]] = i
    return keys


# ---------------------------------------------------------------------------
# On-device ranking (exact twins of dedup_rank / rect_rank)
#
# At corpus scale the host path is dominated by pulling the full similarity
# matrix over the device link (871 MB at 53k x 4k) and argsorting it; ranks
# are an [N] int vector, so computing them on device and fetching only that
# is exact and ~100x cheaper end-to-end (BASELINE.md 53k table).  Semantics
# match the reference's stable-argsort + first-occurrence scan
# (util_test.py:44-68): the first occurrence of id c in the sorted order is
# its best-similarity column, earliest column index among equal sims; c
# counts before the GT iff (best_c, -earliest_c) beats (best_gt,
# -earliest_gt) lexicographically.  Equivalence vs the numpy paths is
# pinned in tests/test_eval_metrics.py (including forced ties).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2,))
def _dedup_rank_jax(sim, codes, n_ids):
    m = sim.shape[1]
    cols = jnp.arange(m)

    def per_row(row):
        best = jax.ops.segment_max(row, codes, num_segments=n_ids,
                                   indices_are_sorted=False)
        earliest = jax.ops.segment_min(
            jnp.where(row == best[codes], cols, m), codes,
            num_segments=n_ids, indices_are_sorted=False)
        return best, earliest

    best, earliest = jax.vmap(per_row)(sim)              # [N, n_ids] each
    rows = jnp.arange(sim.shape[0])
    gt_best = best[rows, codes[:sim.shape[0]]][:, None]
    gt_earliest = earliest[rows, codes[:sim.shape[0]]][:, None]
    before = (best > gt_best) | ((best == gt_best) & (earliest < gt_earliest))
    return before.sum(axis=1)


def dedup_rank_device(sim, music_ids: Sequence[str]):
    """`dedup_rank` computed on device; returns ([N] ranks, [N] top-1 col)."""
    codes_np = np.unique(np.asarray(music_ids), return_inverse=True)[1]
    codes = jnp.asarray(codes_np)
    ranks = _dedup_rank_jax(sim, codes, int(codes_np.max()) + 1)
    top1 = jnp.argmax(sim, axis=1)       # first occurrence on ties — same
    return np.asarray(ranks), np.asarray(top1)


@jax.jit
def _rect_rank_jax(sim, gt_col, tie_key):
    gt_sim = jnp.take_along_axis(sim, gt_col[:, None], axis=1)
    better = (sim > gt_sim).sum(axis=1)
    # same first-video-occurrence tie order as rect_rank (see its comment)
    tie_before = ((sim == gt_sim)
                  & (tie_key[None, :] < tie_key[gt_col][:, None])).sum(axis=1)
    return better + tie_before


def rect_rank_device(sim, col_music_ids: Sequence[str],
                     gt_music_ids: Sequence[str]) -> np.ndarray:
    """`rect_rank` computed on device from the device-resident sim matrix."""
    cols = np.asarray(col_music_ids)
    assert len(np.unique(cols)) == len(cols), "columns must be unique tracks"
    col_of = {m: j for j, m in enumerate(cols)}
    gt_col = jnp.asarray([col_of[m] for m in gt_music_ids])
    tie_key = jnp.asarray(_first_occurrence_keys(cols, col_of, gt_music_ids))
    return np.asarray(_rect_rank_jax(sim, gt_col, tie_key))


def _recall_from_ranks(ranks: np.ndarray) -> Dict[str, float]:
    n = len(ranks)
    metrics: Dict[str, float] = {}
    for k in (1, 3, 5, 10, 20, 25, 50, 100):
        metrics[f"R{k}"] = float(np.sum(ranks < k)) * 100.0 / n
    metrics["MedianR"] = float(np.median(ranks) + 1)
    metrics["MeanR"] = float(np.mean(ranks) + 1)
    metrics["MRR"] = float(np.mean(1.0 / (ranks + 1)))
    return metrics


def recall_metrics_rect(
    sim_matrix, col_music_ids: Sequence[str],
    gt_music_ids: Sequence[str],
) -> Tuple[Dict[str, float], np.ndarray]:
    """Recall metrics over a rectangular video x unique-track similarity.

    Device-resident `sim_matrix` ranks on device (rect_rank_device) —
    only the [N] rank vector crosses the link."""
    if isinstance(sim_matrix, jax.Array):
        ranks = rect_rank_device(sim_matrix, col_music_ids, gt_music_ids)
    else:
        ranks = rect_rank(sim_matrix, col_music_ids, gt_music_ids)
    return _recall_from_ranks(ranks), ranks


def recall_metrics(
    sim_matrix, music_ids: Sequence[str]
) -> Tuple[Dict[str, float], np.ndarray, List[dict]]:
    """Dedup recall metrics — util_test.py:32-97.

    Returns (metrics, ranks, per-sample results).  A device-resident
    `sim_matrix` ranks on device (dedup_rank_device) — only [N] ints
    cross the link instead of the [N, N] float matrix."""
    ids = list(music_ids)
    if isinstance(sim_matrix, jax.Array):
        ranks, top1 = dedup_rank_device(sim_matrix, music_ids)
    else:
        sim_matrix = np.asarray(sim_matrix, dtype=np.float64)
        ranks = dedup_rank(sim_matrix, music_ids)
        top1 = np.argmax(sim_matrix, axis=1)     # first index on ties, same
    results = []
    for i in range(len(ids)):
        results.append(dict(
            music_id=ids[i],
            rank=int(ranks[i]) + 1,
            topk_music_ids=[ids[int(top1[i])]],
        ))
    return _recall_from_ranks(ranks), ranks, results


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
