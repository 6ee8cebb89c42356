"""Assembles the dual-task training objective from model outputs.

Loss-side equivalent of Uni_model.forward's loss blocks
(model_Uni.py:236-300): every vmr_loss variant plus detr / regression
localization, weighted by ret_loss_weight / loc_loss_weight
(train-MaDe.py:338-340).  Pure function of (outputs, batch, cfg) — jit-safe
and grad-safe.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from mgsv_tpu.config import Config
from mgsv_tpu.models.xpool import (
    sim_matrix_both_pooling,
    sim_matrix_music_pooling,
    sim_matrix_video_pooling,
)
from mgsv_tpu.ops import losses as loss_ops


def retrieval_loss(outputs: Dict[str, Any], cfg: Config,
                   music_codes=None) -> Tuple[jnp.ndarray, Dict]:
    """model_Uni.py:236-275.

    music_codes: optional [B] int track codes enabling the
    ignore_same_music=0 InfoNCE branch (latent in the reference: the only
    InfoNCELoss call site passes audio_id=None, model_Uni.py:256, so the
    branch never fires upstream; here it is wired through the config).
    """
    lc = cfg.loss
    if lc.ignore_same_music != 0:
        music_codes = None
    scale = outputs["logit_scale"]
    video, music = outputs["video_emb"], outputs["music_emb"]
    aux: Dict[str, jnp.ndarray] = {}

    def music_pooled_sim():
        # the fused X-Pool kernel ships the [V, M] similarity directly
        if "single_sim" in outputs:
            return outputs["single_sim"]
        return sim_matrix_music_pooling(video, outputs["music_pooled"])

    if lc.vmr_loss == "dual":
        dual_sim = loss_ops.cosine_sim_matrix(video, music)
        loss = loss_ops.clip_loss(dual_sim, scale) * lc.dual_single_loss_weight
    elif lc.vmr_loss == "single":
        sim = jnp.zeros((video.shape[0], music.shape[0]))
        if "music_pooled" in outputs or "single_sim" in outputs:
            sim = sim + music_pooled_sim()
        if "video_pooled" in outputs:
            sim = sim + sim_matrix_video_pooling(outputs["video_pooled"], music)
        loss = loss_ops.clip_loss(sim, scale) * lc.dual_single_loss_weight
    elif lc.vmr_loss == "dual_single_oneloss":
        sim = sim_matrix_both_pooling(outputs["video_pooled"], outputs["music_pooled"])
        loss = loss_ops.clip_loss(sim, scale) * lc.dual_single_loss_weight
    elif lc.vmr_loss == "dual_single_loss_fuse":      # shipped config :254-262
        dual_sim = loss_ops.cosine_sim_matrix(video, music)
        dual = loss_ops.info_nce_loss(dual_sim, scale, music_codes)
        single = loss_ops.clip_loss(music_pooled_sim(), scale)
        loss = dual * 1.0 + single * 1.0
        aux["dual_loss"], aux["single_loss"] = dual, single
    elif lc.vmr_loss == "dual_single_sim_fuse":
        dual_sim = loss_ops.cosine_sim_matrix(video, music)
        loss = loss_ops.clip_loss(dual_sim + music_pooled_sim(), scale) * lc.dual_single_loss_weight
    elif lc.vmr_loss == "dual_single_feature_fuse":
        fused = (outputs["music_pooled"] + music[:, None, :]) * 0.5
        single_sim = sim_matrix_music_pooling(video, fused)
        loss = loss_ops.clip_loss(single_sim, scale) * lc.dual_single_loss_weight
    else:
        raise ValueError(f"unsupported vmr_loss: {lc.vmr_loss}")
    return loss, aux


def localization_loss(
    outputs: Dict[str, Any], spans_target: jnp.ndarray, cfg: Config
) -> Tuple[jnp.ndarray, Dict]:
    """model_Uni.py:278-300.  spans_target: [B, T, 2] normalized cw."""
    if cfg.model.mml_localization == "detr":
        return loss_ops.set_criterion(
            outputs["pred_logits_layers"],
            outputs["pred_spans_layers"],
            outputs.get("proj_queries_layers"),
            outputs.get("proj_vid_mem"),
            spans_target,
            cfg.loss,
        )
    # regression (model_Uni.py:290-300): L1 * 20 (+ giou * 5, always 0 here).
    pred = outputs["pred_spans_layers"][-1]           # [B, 1, 2]
    l1 = jnp.abs(pred - spans_target).mean()
    log = {"loss_span": l1, "loss_giou": jnp.zeros(()),
           "loss_label": jnp.zeros(()), "class_error": jnp.zeros(())}
    return l1 * 20.0, log


def total_loss(
    outputs: Dict[str, Any], spans_target: jnp.ndarray, cfg: Config,
    music_codes=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """loss = ret_w * retrieval + loc_w * localization (train-MaDe.py:338-370)."""
    ret, ret_aux = retrieval_loss(outputs, cfg, music_codes=music_codes)
    loc, loc_log = localization_loss(outputs, spans_target, cfg)
    total = ret * cfg.loss.ret_loss_weight + loc * cfg.loss.loc_loss_weight
    log = {"loss": total, "retrieval_loss": ret, "localization_loss": loc}
    log.update(ret_aux)
    log.update({k: v for k, v in loc_log.items()})
    return total, log
