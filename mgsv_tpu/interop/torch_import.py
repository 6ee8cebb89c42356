"""Import reference PyTorch checkpoints (xxayt/MGSV Uni_model) into MaDe.

Takes a flat ``name -> np.ndarray`` state dict (e.g. ``torch.load(...)
["model_state_dict"]`` converted to numpy — this module itself has no torch
dependency) and produces the flax params pytree for mgsv_tpu.models.made.MaDe.

Name mapping is derived from the reference module structure:
  * projections         — model_Base.py:282,289 (vit_proj / ast_proj)
  * temporal towers     — model_Base.py:64-91   (Transformer_enhancement)
  * X-Pool              — modules/transformer.py:128-180 (Transformer_XA)
  * DETR                — music_detr/transformer.py
  * heads / query embed — model_Uni.py:47-62

torch Linear stores weight [out, in]; flax Dense stores kernel [in, out].
torch nn.MultiheadAttention packs q/k/v into in_proj_weight [3D, D].
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

from mgsv_tpu.config import Config

Array = np.ndarray
State = Mapping[str, Array]


def _linear(state: State, prefix: str) -> Dict[str, Array]:
    return {
        "kernel": np.ascontiguousarray(state[f"{prefix}.weight"].T),
        "bias": state[f"{prefix}.bias"],
    }


def _layernorm(state: State, prefix: str) -> Dict[str, Array]:
    return {"scale": state[f"{prefix}.weight"], "bias": state[f"{prefix}.bias"]}


def _mha(state: State, prefix: str) -> Dict[str, Dict[str, Array]]:
    """Unpack a torch nn.MultiheadAttention into q/k/v/out Dense params."""
    w = state[f"{prefix}.in_proj_weight"]          # [3D, D]
    b = state[f"{prefix}.in_proj_bias"]            # [3D]
    d = w.shape[1]
    parts = {}
    for i, name in enumerate(["q_proj", "k_proj", "v_proj"]):
        parts[name] = {
            "kernel": np.ascontiguousarray(w[i * d:(i + 1) * d].T),
            "bias": b[i * d:(i + 1) * d],
        }
    parts["out_proj"] = _linear(state, f"{prefix}.out_proj")
    return parts


def _temporal(state: State, prefix: str, depth: int) -> Dict[str, Dict]:
    """Transformer_enhancement: ModuleList of [norm1, attn, norm2, ff]."""
    out: Dict[str, Dict] = {}
    for i in range(depth):
        base = f"{prefix}.layers.{i}"
        out[f"norm1_{i}"] = _layernorm(state, f"{base}.0")
        out[f"attn_{i}"] = _mha(state, f"{base}.1")
        out[f"norm2_{i}"] = _layernorm(state, f"{base}.2")
        # ff = Sequential(Linear, GELU, Dropout, Linear, Dropout) -> idx 0, 3
        out[f"ff_fc1_{i}"] = _linear(state, f"{base}.3.0")
        out[f"ff_fc2_{i}"] = _linear(state, f"{base}.3.3")
    out["final_linear"] = _linear(state, f"{prefix}.final_linear")
    return out


def _xpool(state: State, prefix: str) -> Dict[str, Dict]:
    return {
        "layer_norm1": _layernorm(state, f"{prefix}.layer_norm1"),
        "layer_norm2": _layernorm(state, f"{prefix}.layer_norm2"),
        "layer_norm3": _layernorm(state, f"{prefix}.layer_norm3"),
        "linear_proj": _linear(state, f"{prefix}.linear_proj"),
        "cross_attn": {
            name: _linear(state, f"{prefix}.cross_attn.{name}")
            for name in ["q_proj", "k_proj", "v_proj", "out_proj"]
        },
    }


def _cross_transformer(state: State, prefix: str, depth: int = 1) -> Dict[str, Dict]:
    """CrossTransformer (model_Base.py:169-213) -> models/cross.py tree.

    torch layout: layers.{i} = ModuleList[CrossAttention, FeedForward];
    CrossAttention.to_out is Sequential(Linear, Dropout) -> index 0;
    FeedForward.net is Sequential(Linear, GELU, Dropout, Linear, Dropout)
    -> indices 0 and 3.  to_q / to_kv have no bias (model_Base.py:110-111);
    to_kv's first output half is K, second is V (chunk(2, dim=-1)), which
    matches jnp.split on the transposed kernel.
    """
    out: Dict[str, Dict] = {}
    for i in range(depth):
        out[f"q_norm_{i}"] = _layernorm(
            state, f"{prefix}.attention_query_layer_norms.{i}")
        out[f"ctx_norm_{i}"] = _layernorm(
            state, f"{prefix}.attention_context_layer_norms.{i}")
        out[f"ff_norm_{i}"] = _layernorm(state, f"{prefix}.ff_layer_norms.{i}")
        base = f"{prefix}.layers.{i}"
        out[f"cross_attn_{i}"] = {
            "to_q": {"kernel": np.ascontiguousarray(
                state[f"{base}.0.to_q.weight"].T)},
            "to_kv": {"kernel": np.ascontiguousarray(
                state[f"{base}.0.to_kv.weight"].T)},
            "to_out": _linear(state, f"{base}.0.to_out.0"),
        }
        out[f"ff_{i}"] = {
            "fc1": _linear(state, f"{base}.1.net.0"),
            "fc2": _linear(state, f"{base}.1.net.3"),
        }
    out["final_linear"] = _linear(state, f"{prefix}.final_linear")
    return out


def _detr(state: State, prefix: str, cfg: Config) -> Dict[str, Dict]:
    m = cfg.model
    out: Dict[str, Dict] = {}
    for i in range(m.detr_enc_layers):
        base = f"{prefix}.encoder.layers.{i}"
        out[f"enc_{i}"] = {
            "self_attn": _mha(state, f"{base}.self_attn"),
            "linear1": _linear(state, f"{base}.linear1"),
            "linear2": _linear(state, f"{base}.linear2"),
            "norm1": _layernorm(state, f"{base}.norm1"),
            "norm2": _layernorm(state, f"{base}.norm2"),
        }
    if m.detr_pre_norm and m.detr_enc_layers > 0:
        out["encoder_norm"] = _layernorm(state, f"{prefix}.encoder.norm")
    for i in range(m.detr_dec_layers):
        base = f"{prefix}.decoder.layers.{i}"
        layer = {
            "multihead_attn": _mha(state, f"{base}.multihead_attn"),
            "linear1": _linear(state, f"{base}.linear1"),
            "linear2": _linear(state, f"{base}.linear2"),
            "norm2": _layernorm(state, f"{base}.norm2"),
            "norm3": _layernorm(state, f"{base}.norm3"),
        }
        if m.decoder_self_attn or m.detr_pre_norm:
            layer["self_attn"] = _mha(state, f"{base}.self_attn")
            layer["norm1"] = _layernorm(state, f"{base}.norm1")
        out[f"dec_{i}"] = layer
    out["decoder_norm"] = _layernorm(state, f"{prefix}.decoder.norm")
    return out


def import_uni_state_dict(state: State, cfg: Config) -> Dict:
    """Reference Uni_model state dict -> MaDe params pytree ({"params": ...})."""
    m = cfg.model
    params: Dict[str, Dict] = {}

    if m.agg_module not in ("transf", "None") or m.with_cls_token:
        raise NotImplementedError(
            f"torch import not implemented for agg_module={m.agg_module!r} "
            f"/ with_cls_token={m.with_cls_token} — a params tree missing "
            "those entries would fail (or silently drift) downstream")
    params["video_tower"] = {"proj": _linear(state, "vit_proj")}
    params["audio_tower"] = {"proj": _linear(state, "ast_proj")}
    v_depth = m.video_temporal_depth or m.temporal_depth
    a_depth = m.audio_temporal_depth or m.temporal_depth
    if m.agg_module == "transf":
        if m.transformer_is_share:
            if m.temporal_depth > 0:
                params["shared_temporal"] = _temporal(
                    state, "share_transformer", m.temporal_depth)
        else:
            if v_depth > 0:
                params["video_tower"]["temporal"] = _temporal(
                    state, "video_transformer", v_depth)
            if a_depth > 0:
                params["audio_tower"]["temporal"] = _temporal(
                    state, "audio_transformer", a_depth)

    params["logit_scale"] = state["logit_scale"].reshape(())

    if "XA" in m.vmr_fusion:
        if "music" in m.vmr_fusion:
            params["xpool_v2m"] = _xpool(
                state, "video_guided_to_music_pooling_cross_transformer")
        if "video" in m.vmr_fusion:
            params["xpool_m2v"] = _xpool(
                state, "music_guided_to_video_pooling_cross_transformer")

    if m.mml_fusion == "CA":
        params["ca_fusion"] = _cross_transformer(
            state, "video_music_fusion_cross_transformer")

    params["detr"] = _detr(state, "detr_transformer", cfg)
    params["query_embed"] = state["decoder_query_embed.weight"]

    if m.mml_localization == "detr":
        params["span_embed"] = {
            f"layer_{i}": _linear(state, f"span_embed.layers.{i}") for i in range(3)
        }
        params["class_embed"] = _linear(state, "class_embed")
        if cfg.loss.contrastive_align_loss:
            params["contrastive_proj_query"] = _linear(
                state, "contrastive_align_projection_query")
            params["contrastive_proj_vid"] = _linear(
                state, "contrastive_align_projection_vid")
        if m.moment_loss:
            params["moment_embed"] = {
                f"layer_{i}": _linear(state, f"moment_embed.layers.{i}")
                for i in range(3)
            }
    elif m.mml_localization == "regression":
        params["reg_mlp"] = {
            f"layer_{i}": _linear(state, f"reg_mlp.layers.{i}") for i in range(3)
        }

    return {"params": params}


def load_reference_checkpoint(path: str, cfg: Config, map_key: Optional[str] = "model_state_dict"):
    """Convenience loader: torch .bin checkpoint file -> MaDe params.

    Requires torch at call time (kept out of module import so the framework
    itself never depends on it).  Mirrors utils/util_train.py:38-60's
    checkpoint format: {"epoch", "loss", "model_state_dict", ...}.
    """
    import torch  # local import by design

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob[map_key] if map_key and map_key in blob else blob
    np_state = {k: v.detach().cpu().numpy() for k, v in state.items()}
    return import_uni_state_dict(np_state, cfg)
