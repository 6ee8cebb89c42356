"""Retrieval + detection losses, jit-native.

Retrieval: symmetric CLIP/InfoNCE losses over in-batch similarity matrices
(modules/loss.py).  Detection: the DETR set criterion (span L1 + 1-D gIoU +
class-weighted CE + contrastive-align NCE, music_detr/loss_detr.py) with the
Hungarian assignment from mgsv_tpu.ops.matcher.  Auxiliary decoder-layer
losses are computed by vmapping one per-layer criterion over the stacked
layer axis instead of the reference's Python loop (loss_detr.py:159-168).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mgsv_tpu.config import LossConfig
from mgsv_tpu.ops.matcher import hungarian_match
from mgsv_tpu.ops.spans import elementwise_temporal_giou, span_cw_to_se


# ---------------------------------------------------------------------------
# Retrieval losses (modules/loss.py)
# ---------------------------------------------------------------------------

def cosine_sim_matrix(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Row-normalized cosine similarity [Nx, D] x [Ny, D] -> [Nx, Ny].

    cal_distance(..., "COS") — modules/loss.py:52-56.
    """
    x = x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), eps * eps))
    y = y / jnp.sqrt(jnp.maximum(jnp.sum(y * y, -1, keepdims=True), eps * eps))
    return x @ y.T


def clip_loss(sims: jnp.ndarray, logit_scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric diagonal log-softmax CE (modules/loss.py:5-24).

    sims: [N, N] with matched pairs on the diagonal; logit_scale: scalar
    (log-space parameter, exponentiated here as in the reference).
    """
    logits = sims * jnp.exp(logit_scale)
    t2v = -jnp.mean(jnp.diagonal(jax.nn.log_softmax(logits, axis=1)))
    v2t = -jnp.mean(jnp.diagonal(jax.nn.log_softmax(logits, axis=0)))
    return (t2v + v2t) / 2.0


def info_nce_loss(
    sims: jnp.ndarray,
    logit_scale: jnp.ndarray,
    music_codes: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Symmetric InfoNCE with arange labels (modules/loss.py:66-123).

    The shipped config uses ignore_same_music=1 (train-MaDe.py:124), i.e.
    the plain symmetric cross-entropy path (loss.py:115-122), which equals
    clip_loss mathematically.

    With `music_codes` ([N] int ids of each row's music track) the
    ignore_same_music=0 branch (loss.py:90-114) is applied to the
    video->audio direction: off-diagonal columns sharing the row's music id
    are dropped from the negatives (the reference builds [pos; negs] per
    row and CEs against index 0 — equivalent to masking those logits out of
    the softmax).  The audio->video direction stays plain CE (loss.py:120).
    """
    logits = sims * jnp.exp(logit_scale)
    n = logits.shape[0]
    diag = jnp.eye(n, dtype=bool)
    if music_codes is None:
        v2a = -jnp.mean(jnp.diagonal(jax.nn.log_softmax(logits, axis=1)))
    else:
        same = music_codes[:, None] == music_codes[None, :]
        keep = diag | ~same                      # positive + true negatives
        masked = jnp.where(keep, logits, -jnp.inf)
        v2a = -jnp.mean(jnp.diagonal(jax.nn.log_softmax(masked, axis=1)))
    a2v = -jnp.mean(jnp.diagonal(jax.nn.log_softmax(logits, axis=0)))
    return (v2a + a2v) / 2.0


# ---------------------------------------------------------------------------
# DETR set criterion (music_detr/loss_detr.py)
# ---------------------------------------------------------------------------

def _layer_criterion(
    pred_logits: jnp.ndarray,    # [B, Q, 2]
    pred_spans: jnp.ndarray,     # [B, Q, 2] normalized cw
    proj_queries: Optional[jnp.ndarray],  # [B, Q, D] or None
    proj_vid_mem: Optional[jnp.ndarray],  # [B, F, D] or None (shared)
    tgt_spans: jnp.ndarray,      # [B, T, 2] normalized cw
    tgt_mask: jnp.ndarray,       # [B, T] bool (width != 0)
    cfg: LossConfig,
) -> Dict[str, jnp.ndarray]:
    num_queries = pred_logits.shape[1]
    match = hungarian_match(pred_logits, pred_spans, tgt_spans, tgt_mask, cfg)
    w = match.pair_valid.astype(pred_spans.dtype)                  # [B, T]
    n_pairs = jnp.clip(w.sum(), min=1.0)

    losses: Dict[str, jnp.ndarray] = {}

    # --- loss_spans (loss_detr.py:74-91): mean L1 over matched (pair, coord)
    # elements + mean (1 - elementwise gIoU) over matched pairs.
    matched_spans = jnp.take_along_axis(
        pred_spans, match.tgt_to_pred[..., None], axis=1
    )                                                              # [B, T, 2]
    l1 = jnp.abs(matched_spans - tgt_spans)                        # [B, T, 2]
    losses["loss_span"] = (l1 * w[..., None]).sum() / (n_pairs * 2.0)
    giou = elementwise_temporal_giou(
        span_cw_to_se(matched_spans), span_cw_to_se(tgt_spans)
    )                                                              # [B, T]
    losses["loss_giou"] = ((1.0 - giou) * w).sum() / n_pairs

    # --- loss_labels (loss_detr.py:93-109): per-query CE against
    # foreground/background with eos_coef-weighted background, plain mean
    # over B*Q elements (reduction="none" then .mean() in the reference).
    query_matched = jnp.zeros(pred_logits.shape[:2], bool)         # [B, Q]
    query_matched = jax.vmap(
        lambda qm, idx, valid: qm.at[idx].max(valid)
    )(query_matched, match.tgt_to_pred, match.pair_valid)
    target_classes = jnp.where(query_matched, cfg.foreground_label, cfg.background_label)
    empty_weight = jnp.array([1.0, 1.0]).at[cfg.background_label].set(cfg.eos_coef)
    logp = jax.nn.log_softmax(pred_logits, axis=-1)                # [B, Q, 2]
    nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    losses["loss_label"] = (nll * empty_weight[target_classes]).mean()

    # class_error (loss_detr.py:108 via misc.accuracy): 100 - precision@1 of
    # matched queries predicting foreground.
    pred_cls = jnp.argmax(pred_logits, axis=-1)                    # [B, Q]
    qm = query_matched.astype(pred_logits.dtype)
    n_matched = jnp.clip(qm.sum(), min=1.0)
    acc = ((pred_cls == cfg.foreground_label) * qm).sum() / n_matched * 100.0
    losses["class_error"] = 100.0 - acc

    # --- loss_contrastive_align (loss_detr.py:112-128): query-frame dot
    # logits summed over frames / temperature, NCE over the query axis with
    # matched queries as positives.  NOTE: the reference sums over *all*
    # frame tokens including padding (proj_vid_mem is unmasked); replicated.
    if cfg.contrastive_align_loss and proj_queries is not None and proj_vid_mem is not None:
        logits = jnp.einsum("bqd,bfd->bq", proj_queries, proj_vid_mem)
        logits = logits / cfg.align_temperature                    # [B, Q]
        pos_term = (logits * qm).sum(axis=1)                       # [B]
        num_pos = jnp.clip(qm.sum(axis=1), min=1.0)
        neg_term = jax.nn.logsumexp(logits, axis=1)
        losses["loss_contrastive_align"] = jnp.mean(-pos_term / num_pos + neg_term)

    del num_queries
    return losses


def set_criterion(
    pred_logits_layers: jnp.ndarray,   # [L, B, Q, 2] (all decoder layers, final last)
    pred_spans_layers: jnp.ndarray,    # [L, B, Q, 2]
    proj_queries_layers: Optional[jnp.ndarray],  # [L, B, Q, D] or None
    proj_vid_mem: Optional[jnp.ndarray],         # [B, F, D] or None
    tgt_spans: jnp.ndarray,            # [B, T, 2] normalized cw
    cfg: LossConfig,
):
    """Full SetCriterion over final + auxiliary decoder layers.

    Matching is re-run per layer (loss_detr.py:144, :161).  Returns
    (total_localization_loss, log_dict) where log_dict holds the final
    layer's individual losses plus per-layer aux entries, mirroring the
    reference's weight_dict application (model_Uni.py:289).
    """
    tgt_mask = tgt_spans[..., 1] != 0                               # matcher.py:59

    per_layer = jax.vmap(
        lambda lg, sp, pq: _layer_criterion(
            lg, sp, pq, proj_vid_mem, tgt_spans, tgt_mask, cfg
        )
    )
    if proj_queries_layers is None:
        per_layer = jax.vmap(
            lambda lg, sp: _layer_criterion(
                lg, sp, None, proj_vid_mem, tgt_spans, tgt_mask, cfg
            )
        )
        layer_losses = per_layer(pred_logits_layers, pred_spans_layers)
    else:
        layer_losses = per_layer(
            pred_logits_layers, pred_spans_layers, proj_queries_layers
        )

    weights = {
        "loss_span": cfg.weight_span if cfg.l1_loss else 0.0,
        "loss_giou": cfg.weight_giou,
        "loss_label": cfg.weight_label,
    }
    if cfg.contrastive_align_loss and "loss_contrastive_align" in layer_losses:
        weights["loss_contrastive_align"] = cfg.weight_contrastive_align

    num_layers = pred_logits_layers.shape[0]
    total = 0.0
    for name, weight in weights.items():
        vals = layer_losses[name]                                   # [L]
        if cfg.aux_loss:
            total = total + weight * vals.sum()
        else:
            total = total + weight * vals[-1]

    log_dict = {name: vals[-1] for name, vals in layer_losses.items()}
    if cfg.aux_loss and num_layers > 1:
        for name in layer_losses:
            for i in range(num_layers - 1):
                log_dict[f"{name}_{i}"] = layer_losses[name][i]
    return total, log_dict
