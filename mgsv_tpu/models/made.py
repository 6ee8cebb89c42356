"""MaDe: joint video-to-music Matching + music-moment Detection, TPU-native.

The complete trainable head of the reference (Uni_model + Base_model feature
path, model/model_Uni.py + model/model_Base.py) as one pure flax module.
The model is loss-free: it returns every tensor the objectives need and the
loss lives in mgsv_tpu.train.objective — keeping apply() a pure function
that jit/pjit can shard and differentiate cleanly.

Pipeline (shipped config — model_Uni.py:177-322):
  video tower : mask -> vit_proj 512->256 -> (+sin PE) -> temporal TRM ->
                masked mean-pool -> L2 norm
  music tower : same with ast_proj 768->256
  matching    : X-Pool (video queries pool music snippets) -> pooled [M,V,D]
  detection   : concat(frame, snippet tokens) -> sine pos (cumsum-mask) ->
                DETR enc x2 / dec x6 (no decoder SA) with video embedding as
                the decoder content query -> span/class/contrastive heads
                on every decoder layer.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mgsv_tpu.config import Config
from mgsv_tpu.models import layers as L
from mgsv_tpu.models.cross import CrossTransformer
from mgsv_tpu.models.detr import DetrTransformer
from mgsv_tpu.models.temporal import (FusedTemporalTransformer,
                                      TemporalTransformer)
from mgsv_tpu.models.xpool import XPoolTransformer


class Tower(nn.Module):
    """Shared frame/snippet tower — forward_*_encoder_feature
    (model_Base.py:544-617)."""

    dim: int
    pe_len: int
    depth: int
    heads: int
    mlp_dim: int
    dropout: float
    with_cls_token: bool = False
    act_after_proj: bool = False
    agg_module: str = "transf"
    dtype: Optional[jnp.dtype] = None   # compute dtype for the temporal TRM
    fused: bool = False                 # FusedTemporalTransformer twin
    # Optional externally-shared temporal transformer (transformer_is_share,
    # model_Base.py:324-334 — only the transformer is shared, not the
    # projection or positional table).
    temporal_module: Optional[TemporalTransformer] = None

    @nn.compact
    def __call__(self, feats, mask, deterministic: bool = True):
        """feats: [B, L, D_in]; mask: [B, L] 1=valid.

        Returns (tokens [B, L, dim], pooled_emb [B, dim], mask [B, L]).
        """
        mask = mask.astype(feats.dtype)
        x = feats * mask[..., None]                       # masked_fill :556
        x = nn.Dense(self.dim, name="proj")(x)            # vit/ast_proj :559
        if self.act_after_proj:
            x = L.quick_gelu(x)

        if self.with_cls_token:
            cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                             (1, 1, self.dim))
            x = jnp.concatenate([jnp.broadcast_to(cls, (x.shape[0], 1, self.dim)), x], axis=1)
            mask = jnp.concatenate([jnp.ones((mask.shape[0], 1), mask.dtype), mask], axis=1)

        if self.agg_module == "transf" and self.depth > 0:
            pe = jnp.asarray(L.sinusoidal_table(self.pe_len, self.dim))
            x = x + pe[None, : x.shape[1]]                # PE added :533
            trm = self.temporal_module
            if trm is None:
                cls = FusedTemporalTransformer if self.fused else TemporalTransformer
                trm = cls(
                    self.dim, self.depth, self.heads, self.mlp_dim, self.dim,
                    dropout=self.dropout, dtype=self.dtype, name="temporal",
                )
            x = trm(x, mask, deterministic=deterministic)
            x = x * mask[..., None]                       # masked_fill :541
        elif self.agg_module == "mlp":
            # EmbeddingNet aggregator (model_Base.py:357-377, :567-569)
            from mgsv_tpu.models.embedding_net import EmbeddingNet
            x = EmbeddingNet(self.dim, name="embedding_net")(
                x, deterministic=deterministic)
            x = x * mask[..., None]

        if self.with_cls_token:
            emb = x[:, 0]
            x, mask = x[:, 1:], mask[:, 1:]
        else:
            emb = L.masked_mean(x, mask)                  # :579
        emb = L.l2_normalize(emb)                         # :580
        return x, emb, mask


class MaDe(nn.Module):
    """The full dual-task model."""

    cfg: Config
    # Device mesh for kernels that need explicit SPMD handling (the fused
    # X-Pool similarity runs under shard_map when this is a multi-device
    # mesh); None = single-device / XLA-partitioned paths only.
    mesh: Optional[object] = None

    @nn.compact
    def __call__(
        self,
        frame_feats: jnp.ndarray,    # [B, F, vit_dim]
        frame_mask: jnp.ndarray,     # [B, F]
        segment_feats: jnp.ndarray,  # [B, S, ast_dim]
        segment_mask: jnp.ndarray,   # [B, S]
        v_duration: Optional[jnp.ndarray] = None,  # [B] (predict_center only)
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        m = self.cfg.model
        d = m.dim_input
        # compute dtype for the heavy matmuls (params + LN + losses stay f32)
        cdtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else None

        # ------------------------------------------------------------- towers
        # per-tower depth overrides (train-MaDe.py:61-62); 0 = inherit
        v_depth = m.video_temporal_depth or m.temporal_depth
        a_depth = m.audio_temporal_depth or m.temporal_depth
        shared_trm = None
        if m.transformer_is_share:
            assert v_depth == a_depth == m.temporal_depth, (
                "transformer_is_share uses ONE temporal stack; per-tower "
                "depth overrides cannot apply")
            trm_cls = (FusedTemporalTransformer if m.fused_temporal
                       else TemporalTransformer)
            shared_trm = trm_cls(
                d, m.temporal_depth, m.temporal_heads, m.temporal_mlp_dim, d,
                dropout=m.temporal_dropout, dtype=cdtype, name="shared_temporal",
            )
        frame_tokens, video_emb, frame_mask = Tower(
            d, m.video_pe_len, v_depth, m.temporal_heads,
            m.temporal_mlp_dim, m.temporal_dropout,
            with_cls_token=m.with_cls_token, act_after_proj=m.with_act_after_proj,
            agg_module=m.agg_module, dtype=cdtype, fused=m.fused_temporal,
            temporal_module=shared_trm, name="video_tower",
        )(frame_feats, frame_mask, deterministic=deterministic)

        seg_tokens, music_emb, segment_mask = Tower(
            d, m.audio_pe_len, a_depth, m.temporal_heads,
            m.temporal_mlp_dim, m.temporal_dropout,
            with_cls_token=m.with_cls_token, act_after_proj=m.with_act_after_proj,
            agg_module=m.agg_module, dtype=cdtype, fused=m.fused_temporal,
            temporal_module=shared_trm, name="audio_tower",
        )(segment_feats, segment_mask, deterministic=deterministic)

        out: Dict[str, Any] = {
            "frame_tokens": frame_tokens, "video_emb": video_emb,
            "seg_tokens": seg_tokens, "music_emb": music_emb,
            "frame_mask": frame_mask, "segment_mask": segment_mask,
        }

        # logit_scale — model_Uni.py:29
        out["logit_scale"] = self.param(
            "logit_scale",
            lambda key: jnp.asarray(np.log(1.0 / m.temperature_init_value), jnp.float32),
        )

        # -------------------------------------------------------- X-Pool
        if "XA" in m.vmr_fusion:
            # remat: recompute the O(B^2 * D) pooled chain in backward
            # instead of saving it (config.remat_xpool).
            xpool_cls = (nn.remat(XPoolTransformer, static_argnums=(4,))
                         if m.remat_xpool else XPoolTransformer)
            # The fused kernel produces the [V, M] similarity directly —
            # only valid when downstream consumes exactly that (sim-style
            # vmr losses and no pooled-tensor consumer like
            # moment_query_type="xpool" or the feature-fuse loss).
            use_fused_sim = (
                m.fused_xpool_sim and m.vmr_fusion == "XA-music"
                and self.cfg.loss.vmr_loss in
                ("single", "dual_single_loss_fuse", "dual_single_sim_fuse")
                and m.moment_query_type != "xpool")
            if use_fused_sim:
                from mgsv_tpu.models.xpool import FusedXPoolSim
                out["single_sim"] = FusedXPoolSim(
                    d, dropout=m.xpool_dropout, mesh=self.mesh,
                    name="xpool_v2m",
                )(video_emb, seg_tokens,
                  segment_mask if m.fusion_mask else None,
                  deterministic)                          # [V, M]
            elif "music" in m.vmr_fusion:
                out["music_pooled"] = xpool_cls(
                    d, dropout=m.xpool_dropout, name="xpool_v2m",
                )(video_emb, seg_tokens,
                  segment_mask if m.fusion_mask else None,
                  deterministic)                          # [M, V, D]
            if "video" in m.vmr_fusion:
                out["video_pooled"] = xpool_cls(
                    d, dropout=m.xpool_dropout, name="xpool_m2v",
                )(music_emb, frame_tokens,
                  frame_mask if m.fusion_mask else None,
                  deterministic)                          # [V, M, D]

        # ------------------------------------------------- detection fusion
        if m.mml_fusion == "concat":                      # model_Uni.py:206-208
            fused = jnp.concatenate([frame_tokens, seg_tokens], axis=1)
            fused_mask = jnp.concatenate([frame_mask, segment_mask], axis=1)
        elif m.mml_fusion == "CA":                        # model_Uni.py:209-212
            fused, _ = CrossTransformer(
                d, depth=1, heads=m.ca_heads, dim_head=m.ca_dim_head,
                mlp_dim=m.ca_mlp_dim, out_dim=d, dropout=m.ca_dropout,
                name="ca_fusion",
            )(seg_tokens, frame_tokens, q_mask=segment_mask, kv_mask=frame_mask,
              deterministic=deterministic)
            fused = fused * (segment_mask[..., None] != 0)
            fused_mask = segment_mask
        else:
            raise ValueError(f"unsupported mml_fusion: {m.mml_fusion}")

        # TPU sublane alignment (measured faster — see layers.py docstring)
        fused, fused_mask = L.pad_fused_sequence(
            fused, fused_mask, m.detr_seq_pad_multiple)

        pos = L.position_embedding_sine(fused_mask, d)    # model_Uni.py:216

        # Decoder content query — model_Uni.py:217-224.
        nq = m.num_moment_queries
        if m.moment_query_type == "video":
            target = jnp.broadcast_to(video_emb[:, None, :], (video_emb.shape[0], nq, d))
        elif m.moment_query_type == "music":
            target = jnp.broadcast_to(music_emb[:, None, :], (music_emb.shape[0], nq, d))
        elif m.moment_query_type == "xpool":
            mq = out["music_pooled"].mean(axis=1)          # [M, D]
            target = jnp.broadcast_to(mq[:, None, :], (mq.shape[0], nq, d))
        else:                                              # "zero" / "random"
            target = None

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (nq, d))

        hidden, memory = DetrTransformer(
            d, m.detr_heads, m.detr_ffn_dim, m.detr_enc_layers, m.detr_dec_layers,
            dropout=m.detr_dropout, pre_norm=m.detr_pre_norm,
            decoder_self_attn=m.decoder_self_attn, dtype=cdtype,
            remat_layers=m.remat_detr, fused_encoder=m.fused_detr_encoder,
            mesh=self.mesh, name="detr",
        )(fused, fused_mask, pos, query_embed, target, deterministic=deterministic)
        hidden = hidden.astype(jnp.float32)
        memory = memory.astype(jnp.float32)
        out["memory"] = memory

        # ------------------------------------------------------------- heads
        if m.mml_localization == "detr":
            out.update(self._detr_heads(hidden, frame_tokens, music_emb, v_duration))
        elif m.mml_localization == "regression":
            # model_Uni.py:228-232: masked mean-pool memory -> MLP -> sigmoid.
            pooled = (memory * fused_mask[..., None]).sum(1) / fused_mask.sum(
                1, keepdims=True)
            coord = L.DetrMLP(256, 2 if not m.predict_center else 1, 3,
                              name="reg_mlp")(pooled)
            coord = nn.sigmoid(coord)[:, None, :]            # [B, 1, 1 or 2]
            if m.predict_center:
                # width from video duration — model_Uni.py:291-292
                width = (v_duration / self.cfg.data.max_m_duration)
                coord = jnp.concatenate(
                    [coord, jnp.broadcast_to(width[:, None, None],
                                             coord.shape[:-1] + (1,))], axis=-1)
            out["pred_spans_layers"] = coord[None]           # [1, B, 1, 2]
            out["pred_logits_layers"] = jnp.zeros(
                (1, coord.shape[0], 1, 2), coord.dtype)
        return out

    def _detr_heads(self, hidden, frame_tokens, music_emb, v_duration):
        """Span/class/contrastive heads on all decoder layers —
        Uni_model.calc_output (model_Uni.py:117-173)."""
        m = self.cfg.model
        d = m.dim_input
        res: Dict[str, Any] = {}

        res["pred_logits_layers"] = nn.Dense(2, name="class_embed")(hidden)

        span_pred_dim = 1 if m.predict_center else 2
        coord = nn.sigmoid(
            L.DetrMLP(d, span_pred_dim, 3, name="span_embed")(hidden))
        if m.predict_center:
            # width comes from the video duration — model_Uni.py:282-284.
            width = (v_duration / self.cfg.data.max_m_duration)
            width = jnp.broadcast_to(
                width[None, :, None, None],
                coord.shape[:-1] + (1,))
            coord = jnp.concatenate([coord, width], axis=-1)
        res["pred_spans_layers"] = coord                   # [layers, B, Q, 2]

        if self.cfg.loss.contrastive_align_loss:
            contrastive_dim = d if m.audio_short_cut else m.contrastive_dim
            pq = L.l2_normalize(
                nn.Dense(contrastive_dim, name="contrastive_proj_query")(hidden))
            if m.audio_short_cut:                          # model_Uni.py:143-145
                pq = L.l2_normalize(pq + music_emb[None, :, None, :])
            res["proj_queries_layers"] = pq                # [layers, B, Q, Dc]
            res["proj_vid_mem"] = L.l2_normalize(
                nn.Dense(contrastive_dim, name="contrastive_proj_vid")(frame_tokens))

        if m.moment_loss:
            mf = L.l2_normalize(
                L.DetrMLP(d, d, 3, name="moment_embed")(hidden[-1]))
            if m.audio_short_cut:
                mf = L.l2_normalize(mf + music_emb[:, None, :])
            res["moment_feats"] = mf
        return res
