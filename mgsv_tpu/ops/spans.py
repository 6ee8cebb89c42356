"""Pure span math: (center,width) <-> (start,end), IoU / gIoU, eval IoU.

Functional JAX re-derivation of the reference semantics in
music_detr/span_utils.py (cw<->se :4-24, pairwise temporal_iou :39-66,
generalized_temporal_iou :86-115, individual_IoU_tensor :119-145,
detr_iou :147-170).  All functions are jit-/vmap-safe: static shapes,
where-guarded divisions (no data-dependent branches), and they operate on
arbitrary leading batch dimensions where noted.
"""

from __future__ import annotations

import jax.numpy as jnp


def span_cw_to_se(cw: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] (center, width) -> (start, end).  span_utils.py:15-24."""
    center, width = cw[..., 0], cw[..., 1]
    return jnp.stack([center - 0.5 * width, center + 0.5 * width], axis=-1)


def span_se_to_cw(se: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] (start, end) -> (center, width).  span_utils.py:4-13."""
    start, end = se[..., 0], se[..., 1]
    return jnp.stack([(start + end) * 0.5, end - start], axis=-1)


def _safe_div(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """num/den with 0 where den <= 0 (guards both value and gradient)."""
    safe_den = jnp.where(den > 0, den, 1.0)
    return jnp.where(den > 0, num / safe_den, 0.0)


def temporal_iou(spans1: jnp.ndarray, spans2: jnp.ndarray):
    """Pairwise IoU between two span sets in (start, end) format.

    spans1: [N, 2], spans2: [M, 2] -> (iou [N, M], union [N, M]).
    Matches span_utils.py:39-66 (doctest values at :48-54).
    """
    areas1 = spans1[:, 1] - spans1[:, 0]
    areas2 = spans2[:, 1] - spans2[:, 0]
    left = jnp.maximum(spans1[:, None, 0], spans2[None, :, 0])
    right = jnp.minimum(spans1[:, None, 1], spans2[None, :, 1])
    inter = jnp.clip(right - left, min=0)
    union = areas1[:, None] + areas2[None, :] - inter
    return _safe_div(inter, union), union


def generalized_temporal_iou(spans1: jnp.ndarray, spans2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 1-D generalized IoU, spans in (start, end) format.

    spans1: [N, 2], spans2: [M, 2] -> [N, M].
    Matches span_utils.py:86-115 (doctest values at :99-103).
    """
    iou, union = temporal_iou(spans1, spans2)
    left = jnp.minimum(spans1[:, None, 0], spans2[None, :, 0])
    right = jnp.maximum(spans1[:, None, 1], spans2[None, :, 1])
    enclosing = jnp.clip(right - left, min=0)
    return iou - _safe_div(enclosing - union, enclosing)


def elementwise_temporal_giou(spans1: jnp.ndarray, spans2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise gIoU for matched pairs: [..., 2] x [..., 2] -> [...].

    Equivalent to diag(generalized_temporal_iou) used by loss_spans
    (loss_detr.py:89) but computed without the N x M blowup.
    """
    inter_l = jnp.maximum(spans1[..., 0], spans2[..., 0])
    inter_r = jnp.minimum(spans1[..., 1], spans2[..., 1])
    inter = jnp.clip(inter_r - inter_l, min=0)
    union = (spans1[..., 1] - spans1[..., 0]) + (spans2[..., 1] - spans2[..., 0]) - inter
    iou = _safe_div(inter, union)
    enc_l = jnp.minimum(spans1[..., 0], spans2[..., 0])
    enc_r = jnp.maximum(spans1[..., 1], spans2[..., 1])
    enclosing = jnp.clip(enc_r - enc_l, min=0)
    return iou - _safe_div(enclosing - union, enclosing)


def individual_iou(
    gt_st: jnp.ndarray,
    gt_ed: jnp.ndarray,
    m_duration: jnp.ndarray,
    pred_st: jnp.ndarray,
    pred_ed: jnp.ndarray,
    discounted: bool = False,
) -> jnp.ndarray:
    """Scalar/batched eval IoU with the reference's clamping rules.

    Matches span_utils.py:119-145: pred_st clamped >= 0, pred_ed clamped
    <= m_duration, IoU = 0 when gt_st >= gt_ed or union <= 0.  All inputs
    broadcastable; fully vectorized (the reference loops per sample).
    """
    pred_st = jnp.clip(pred_st, min=0)
    pred_ed = jnp.minimum(pred_ed, m_duration)
    inter = jnp.clip(jnp.minimum(gt_ed, pred_ed) - jnp.maximum(gt_st, pred_st), min=0)
    union = (pred_ed - pred_st) + (gt_ed - gt_st) - inter
    iou = _safe_div(inter, union)
    if discounted:
        alpha_st = 1 - jnp.abs(gt_st - pred_st) / m_duration
        alpha_ed = 1 - jnp.abs(gt_ed - pred_ed) / m_duration
        iou = iou * alpha_st * alpha_ed
    return jnp.where(gt_st >= gt_ed, 0.0, iou)


def eval_iou_batch(
    gt_moments: jnp.ndarray,
    m_durations: jnp.ndarray,
    pred_spans_sec: jnp.ndarray,
    max_m_duration: float,
) -> jnp.ndarray:
    """Top-1 prediction IoU per sample — vectorized detr_iou.

    gt_moments: [B, 2] ground-truth (start, end) seconds.
    m_durations: [B] true music durations.
    pred_spans_sec: [B, 2] top-ranked predicted (start, end) seconds.
    Matches span_utils.py:147-170: pred clamped to [0, max_m_duration]
    first, then individual_iou's own clamps apply.
    """
    pred_st = jnp.clip(pred_spans_sec[..., 0], min=0)
    pred_ed = jnp.minimum(pred_spans_sec[..., 1], max_m_duration)
    return individual_iou(gt_moments[..., 0], gt_moments[..., 1], m_durations, pred_st, pred_ed)


def get_cw_proportion(gt_spans_sec: jnp.ndarray, max_m_duration: float) -> jnp.ndarray:
    """Seconds (start, end) -> normalized (center, width) targets.

    Matches dataloader_MGSV_EC_feature.py:18-27: end clamped to
    max_m_duration, then center/width divided by max_m_duration.
    gt_spans_sec: [..., 2] -> [..., 2].
    """
    start = gt_spans_sec[..., 0]
    end = jnp.minimum(gt_spans_sec[..., 1], max_m_duration)
    center = (start + end) / 2.0 / max_m_duration
    width = (end - start) / max_m_duration
    return jnp.stack([center, width], axis=-1)
