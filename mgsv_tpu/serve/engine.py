"""Serving: music index + retrieval/localization query engine.

Production-facing capability the reference only implies (its eval loop ranks
a closed 2000-row split): build a reusable index over a music collection
(global embeddings + snippet tokens), then answer queries — given a video's
frame features, return the top-k tracks with scores and a localized music
moment *within each candidate track*, in one jitted path.

The similarity fusion matches the eval protocol (dual + pooled X-Pool,
train-MaDe.py:595-599), so engine rankings are consistent with offline
metrics.  The index scales: pooled similarity runs in music blocks (or
sharded over a mesh via eval/similarity.xpool_similarity_sharded).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mgsv_tpu.config import Config
from mgsv_tpu.eval.similarity import dual_similarity, xpool_similarity_blocked
from mgsv_tpu.models.made import MaDe, Tower
from mgsv_tpu.models.xpool import XPoolTransformer
from mgsv_tpu.ops.spans import span_cw_to_se


@dataclasses.dataclass
class MusicIndex:
    music_ids: List[str]
    music_embs: np.ndarray     # [M, D]
    seg_tokens: np.ndarray     # [M, S, D]
    seg_masks: np.ndarray      # [M, S]

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(
            path, music_ids=np.asarray(self.music_ids),
            music_embs=self.music_embs, seg_tokens=self.seg_tokens,
            seg_masks=self.seg_masks)

    @staticmethod
    def load(path: str) -> "MusicIndex":
        z = np.load(path, allow_pickle=False)
        return MusicIndex(
            music_ids=[str(x) for x in z["music_ids"]],
            music_embs=z["music_embs"], seg_tokens=z["seg_tokens"],
            seg_masks=z["seg_masks"])


def build_music_index(
    model: MaDe, params, cfg: Config,
    music_ids: Sequence[str],
    segment_feats: np.ndarray,    # [M, S, ast_dim] raw AST features
    segment_masks: np.ndarray,    # [M, S]
    batch_size: int = 128,
) -> MusicIndex:
    """Run the music tower over a collection once and freeze the results."""
    m = cfg.model
    assert not m.transformer_is_share, (
        "serving engine drives the towers standalone; shared-temporal "
        "configs need the full MaDe forward")

    cdtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else None
    tower = Tower(
        m.dim_input, m.audio_pe_len,
        m.audio_temporal_depth or m.temporal_depth, m.temporal_heads,
        m.temporal_mlp_dim, m.temporal_dropout,
        with_cls_token=m.with_cls_token, act_after_proj=m.with_act_after_proj,
        agg_module=m.agg_module, dtype=cdtype)
    sub = {"params": params["params"]["audio_tower"]}

    @jax.jit
    def encode(feats, masks):
        tokens, emb, masks = tower.apply(sub, feats, masks, deterministic=True)
        return tokens, emb, masks

    tokens_all, embs_all, masks_all = [], [], []
    n = len(music_ids)
    for i in range(0, n, batch_size):
        feats = jnp.asarray(segment_feats[i:i + batch_size], jnp.float32)
        masks = jnp.asarray(segment_masks[i:i + batch_size], jnp.float32)
        if feats.shape[0] < batch_size:   # pad for a single compiled shape
            pad = batch_size - feats.shape[0]
            feats = jnp.pad(feats, ((0, pad), (0, 0), (0, 0)))
            masks = jnp.pad(masks, ((0, pad), (0, 0))).at[
                feats.shape[0] - pad:, 0].set(1)
        tokens, emb, masks_out = encode(feats, masks)
        k = min(batch_size, n - i)
        tokens_all.append(np.asarray(tokens[:k]))
        embs_all.append(np.asarray(emb[:k]))
        masks_all.append(np.asarray(masks_out[:k]))

    return MusicIndex(
        music_ids=list(music_ids),
        music_embs=np.concatenate(embs_all),
        seg_tokens=np.concatenate(tokens_all),
        seg_masks=np.concatenate(masks_all))


class RetrievalEngine:
    """Query-time engine: video features -> top-k tracks + moments."""

    def __init__(self, model: MaDe, params, cfg: Config, index: MusicIndex,
                 sim_block_size: int = 256, use_fused_kernels: bool = False,
                 mesh: Optional["jax.sharding.Mesh"] = None,
                 mesh_axis: str = "dp", index_dtype: str = "float32"):
        # use_fused_kernels: route the localization DETR through the fused
        # Pallas encoder layers (7.9x over the XLA layer on v5e; post-norm
        # configs only) — opt-in because of kernel compile latency.
        # mesh: shard the index over `mesh_axis` (music dimension) and run
        # the query SPMD — the serving analogue of the sharded corpus eval
        # (eval/similarity.py); one engine then serves a catalog larger
        # than a single chip's HBM.
        # index_dtype: "bfloat16" keeps the HBM-resident token store
        # (seg_tokens + music_embs — the O(M*S*D) footprint) in bf16,
        # halving catalog memory (5.2 GB -> 2.6 GB at 53k tracks).  All
        # compute promotes back through the f32 params, so only the
        # stored values are rounded; top-k stability vs the f32 index is
        # pinned in tests/test_serve.py.  Masks stay f32 (tiny).
        self.use_fused_kernels = use_fused_kernels and not cfg.model.detr_pre_norm
        self.model = model
        self.params = params
        self.cfg = cfg
        self.index = index
        self.sim_block_size = sim_block_size
        self._mesh = mesh
        self._mesh_axis = mesh_axis
        m = cfg.model

        cdtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else None
        self._video_tower = Tower(
            m.dim_input, m.video_pe_len,
            m.video_temporal_depth or m.temporal_depth, m.temporal_heads,
            m.temporal_mlp_dim, m.temporal_dropout,
            with_cls_token=m.with_cls_token,
            act_after_proj=m.with_act_after_proj, agg_module=m.agg_module,
            dtype=cdtype)
        self._xpool = XPoolTransformer(m.dim_input, dropout=m.xpool_dropout)

        if index_dtype in ("bf16", "bfloat16"):
            store_dt = jnp.bfloat16
        elif index_dtype in ("f32", "float32"):
            store_dt = jnp.float32
        else:
            raise ValueError(f"unsupported index_dtype: {index_dtype}")

        self._n_valid = len(index.music_ids)
        if mesh is None:
            self._seg_tokens = jnp.asarray(index.seg_tokens, store_dt)
            self._seg_masks = jnp.asarray(index.seg_masks, jnp.float32)
            self._music_embs = jnp.asarray(index.music_embs, store_dt)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = mesh.shape[mesh_axis]
            pad = (-self._n_valid) % n_dev
            seg_tokens, seg_masks = index.seg_tokens, index.seg_masks
            music_embs = index.music_embs
            if pad:
                # mask-safe pad tracks (one valid snippet); their sims are
                # forced to -inf before top_k inside the query
                seg_tokens = np.concatenate(
                    [seg_tokens,
                     np.zeros((pad,) + seg_tokens.shape[1:],
                              seg_tokens.dtype)])
                pm = np.zeros((pad, seg_masks.shape[1]), seg_masks.dtype)
                pm[:, 0] = 1
                seg_masks = np.concatenate([seg_masks, pm])
                music_embs = np.concatenate(
                    [music_embs,
                     np.zeros((pad, music_embs.shape[1]), music_embs.dtype)])
            shard = lambda x, spec, dt: jax.device_put(
                jnp.asarray(x, dt), NamedSharding(mesh, spec))
            self._seg_tokens = shard(seg_tokens, P(mesh_axis), store_dt)
            self._seg_masks = shard(seg_masks, P(mesh_axis), jnp.float32)
            self._music_embs = shard(music_embs, P(mesh_axis), store_dt)

        self._query_jit = self._make_query()

    def _localize_core(self, params, tokens, video_emb, fmask,
                       seg_tokens, seg_masks, v_dur):
        """Localization head over (video, candidate-track) pair rows.

        The DETR fusion consumes the video tower's tokens plus the INDEX's
        music tower tokens directly (the candidates' raw AST features are
        not kept at serving time), so this is the training-time concat
        fusion with the music half read from the index."""
        from mgsv_tpu.models import layers as L
        from mgsv_tpu.models.detr import DetrTransformer

        cfg = self.cfg
        m = cfg.model
        p = params["params"]
        fused = jnp.concatenate([tokens, seg_tokens], axis=1)
        fused_mask = jnp.concatenate([fmask, seg_masks], axis=1)
        # same sublane-alignment padding as MaDe's detection fusion —
        # shared helper so serving cannot drift from training
        fused, fused_mask = L.pad_fused_sequence(
            fused, fused_mask, m.detr_seq_pad_multiple)
        pos = L.position_embedding_sine(fused_mask, m.dim_input)
        nq = m.num_moment_queries
        target = jnp.broadcast_to(
            video_emb[:, None, :], (video_emb.shape[0], nq, m.dim_input))
        if self.use_fused_kernels:
            from mgsv_tpu.ops.pallas.detr_fused import detr_forward_fused
            hidden, _ = detr_forward_fused(
                {"params": p["detr"]}, fused.astype(jnp.float32),
                fused_mask, pos, p["query_embed"], target,
                heads=m.detr_heads, ffn_dim=m.detr_ffn_dim,
                enc_layers=m.detr_enc_layers, dec_layers=m.detr_dec_layers,
                decoder_self_attn=m.decoder_self_attn)
        else:
            detr = DetrTransformer(
                m.dim_input, m.detr_heads, m.detr_ffn_dim, m.detr_enc_layers,
                m.detr_dec_layers, dropout=m.detr_dropout,
                pre_norm=m.detr_pre_norm,
                decoder_self_attn=m.decoder_self_attn,
                dtype=jnp.bfloat16 if m.compute_dtype == "bfloat16" else None)
            hidden, _ = detr.apply(
                {"params": p["detr"]}, fused, fused_mask, pos,
                p["query_embed"], target, deterministic=True)
        hidden = hidden.astype(jnp.float32)
        # Apply the SAME head modules as MaDe._detr_heads so serving
        # cannot drift from training/eval.
        from mgsv_tpu.models.layers import DetrMLP
        import flax.linen as fnn

        logits = fnn.Dense(2).apply(
            {"params": p["class_embed"]}, hidden[-1])
        span_pred_dim = 1 if m.predict_center else 2
        spans_cw = jax.nn.sigmoid(DetrMLP(m.dim_input, span_pred_dim, 3).apply(
            {"params": p["span_embed"]}, hidden[-1]))
        if m.predict_center:
            width = (v_dur / cfg.data.max_m_duration)[:, None, None]
            width = jnp.broadcast_to(width, spans_cw.shape[:-1] + (1,))
            spans_cw = jnp.concatenate([spans_cw, width], axis=-1)
        score = jax.nn.softmax(logits, axis=-1)[..., cfg.loss.foreground_label]
        best = jnp.argmax(score, axis=-1)
        spans_se = span_cw_to_se(spans_cw) * cfg.data.max_m_duration
        take = lambda x: jnp.take_along_axis(
            x, best[:, None, None], axis=1)[:, 0]
        return take(spans_se), jnp.take_along_axis(
            score, best[:, None], axis=1)[:, 0]

    def _make_query(self):
        """The WHOLE query — video tower, dual+pooled similarity against
        the full index, top-k selection, candidate gather, localization —
        as ONE jitted program per (batch, top_k) shape.

        Motivation (measured, scripts/bench_serving_tpu.py): the previous
        host-side flow (encode dispatch -> fetch [B, M] sims -> numpy
        argsort -> localize dispatch) cost ~352 ms p50 at B=1 on the
        remote chip, nearly flat in B — fixed round-trip overhead, not
        compute.  One dispatch also localizes against the tower tokens
        already computed for similarity instead of re-running the video
        tower per (query, candidate) pair."""
        fusion_mask = self.cfg.model.fusion_mask
        block = min(self.sim_block_size, len(self.index.music_ids))
        mesh, ax, n_valid = self._mesh, self._mesh_axis, self._n_valid

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            # Each device scans its music shard against the replicated
            # query embeddings (same shard_map shape as the corpus eval,
            # eval/similarity.py::xpool_similarity_sharded); everything
            # downstream (top_k over the gathered [B, M] row, candidate
            # gather from the sharded token store, localization) is left
            # to GSPMD inside the same jitted program.
            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(P(), P(), P(ax), P(ax)), out_specs=P(None, ax),
                check_vma=False)
            def _xpool_sims_sharded(xp, v_emb, seg_shard, mask_shard):
                return xpool_similarity_blocked(
                    self._xpool.apply, xp, v_emb, seg_shard,
                    mask_shard if fusion_mask else None,
                    block_size=min(block, seg_shard.shape[0]))

        # The index arrays are EXPLICIT jit arguments, not closures: a
        # closed-over [M, S, D] token store (hundreds of MB at catalog
        # scale) would be serialized into the compile payload, which the
        # remote-compile tunnel rejects (HTTP 413) and which bloats the
        # executable even on a local chip.
        @functools.partial(jax.jit, static_argnums=(6,))
        def run(params, music_embs, seg_tokens, seg_masks,
                frame_feats, frame_mask, top_k):
            tokens, video_emb, fmask = self._video_tower.apply(
                {"params": params["params"]["video_tower"]},
                frame_feats, frame_mask, deterministic=True)
            xpool_sub = {"params": params["params"]["xpool_v2m"]}
            sims = dual_similarity(video_emb, music_embs)
            if mesh is None:
                sims = sims + xpool_similarity_blocked(
                    self._xpool.apply, xpool_sub, video_emb,
                    seg_tokens,
                    seg_masks if fusion_mask else None,
                    block_size=block)                           # [B, M]
            else:
                sims = sims + _xpool_sims_sharded(
                    xpool_sub, video_emb, seg_tokens, seg_masks)
                # pad tracks (index padded to the mesh axis size) never rank
                sims = jnp.where(
                    jnp.arange(sims.shape[1])[None, :] < n_valid,
                    sims, -jnp.inf)
            top_sims, order = jax.lax.top_k(sims, top_k)        # [B, k]
            cand = order.reshape(-1)
            rep = lambda t: jnp.repeat(t, top_k, axis=0)
            # video duration approximated from the 1 fps frame mask (the
            # RAW mask — the tower's may carry an extra cls-token column)
            v_dur = frame_mask.sum(axis=-1)
            spans, scores = self._localize_core(
                params, rep(tokens), rep(video_emb), rep(fmask),
                seg_tokens[cand], seg_masks[cand], rep(v_dur))
            b = frame_feats.shape[0]
            return (order, top_sims,
                    spans.reshape(b, top_k, 2), scores.reshape(b, top_k))

        return run

    @staticmethod
    def _bucket(b: int) -> int:
        """Next power-of-two batch bucket — every client batch size maps to
        one of log2(max_b) compiled programs instead of compiling per exact
        B (each compile is minutes over the remote tunnel)."""
        n = 1
        while n < b:
            n *= 2
        return n

    def warmup(self, batch_sizes: Sequence[int] = (1, 2, 4, 8, 16, 32),
               top_k: int = 5) -> None:
        """Pre-compile the query program at the given batch buckets so the
        first real client request doesn't pay compile latency.  The default
        covers every bucket the serving micro-batcher can produce up to its
        max_batch=32.  Note top_k is bucketed too (query() docstring): a
        client's first use of a NEW top_k bucket beyond bucket(top_k) still
        pays one compile — warm the k values you expect."""
        F = self.cfg.data.max_v_frames
        vit = self.cfg.data.vit_dim
        for b in sorted({self._bucket(int(x)) for x in batch_sizes}):
            feats = np.zeros((b, F, vit), np.float32)
            mask = np.zeros((b, F), np.float32)
            mask[:, 0] = 1.0
            self.query(feats, mask, top_k=top_k)

    def query(self, frame_feats: np.ndarray, frame_mask: np.ndarray,
              top_k: int = 5) -> List[Dict]:
        """frame_feats: [B, F, vit_dim]; returns per query a dict with
        ranked music ids/scores and a localized moment per candidate.

        top_k is clamped to the catalog size and bucketed to the next
        power of two before dispatch (results sliced back to the request):
        top_k is a static jit argument, so without bucketing a client
        cycling top_k values could force a fresh multi-minute compile per
        value while holding the serving lock."""
        k_req = max(1, min(int(top_k), self._n_valid))
        k_run = min(self._bucket(k_req), self._n_valid)
        b_real = frame_feats.shape[0]
        b_pad = self._bucket(b_real)
        if b_pad != b_real:
            # mask-safe padding: pad rows keep one valid frame so the
            # attention softmax never sees an all-masked row
            pf = np.zeros((b_pad - b_real,) + tuple(frame_feats.shape[1:]),
                          np.float32)
            pm = np.zeros((b_pad - b_real, frame_feats.shape[1]), np.float32)
            pm[:, 0] = 1.0
            frame_feats = np.concatenate([np.asarray(frame_feats), pf])
            frame_mask = np.concatenate([np.asarray(frame_mask), pm])
        frame_feats = jnp.asarray(frame_feats, jnp.float32)
        frame_mask = jnp.asarray(frame_mask, jnp.float32)
        order_d, top_sims, spans_d, scores_d = self._query_jit(
            self.params, self._music_embs, self._seg_tokens, self._seg_masks,
            frame_feats, frame_mask, k_run)
        order = np.asarray(order_d)[:b_real, :k_req]            # [B, k]
        top_scores = np.asarray(top_sims)[:b_real, :k_req]
        spans = np.asarray(spans_d)[:b_real, :k_req]
        loc_scores = np.asarray(scores_d)[:b_real, :k_req]
        b = order.shape[0]

        results = []
        for i in range(b):
            results.append({
                "music_ids": [self.index.music_ids[j] for j in order[i]],
                "retrieval_scores": top_scores[i].tolist(),
                "moments": spans[i].tolist(),
                "moment_scores": loc_scores[i].tolist(),
            })
        return results
