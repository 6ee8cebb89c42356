"""Shape/jit smoke tests for the full MaDe model + objective."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgsv_tpu.config import Config
from mgsv_tpu.models.made import MaDe
from mgsv_tpu.train.objective import total_loss

pytestmark = pytest.mark.slow


def _tiny_cfg(**model_kw):
    cfg = Config()
    model = dataclasses.replace(
        cfg.model, detr_enc_layers=1, detr_dec_layers=2, **model_kw)
    return dataclasses.replace(cfg, model=model)


def _batch(rng, bs=4, frames=10, segs=12, vit=512, ast=768):
    frame_feats = rng.randn(bs, frames, vit).astype(np.float32)
    frame_mask = np.ones((bs, frames), np.float32)
    frame_mask[:, 7:] = 0
    seg_feats = rng.randn(bs, segs, ast).astype(np.float32)
    seg_mask = np.ones((bs, segs), np.float32)
    seg_mask[:, 9:] = 0
    tgt = np.stack([np.full((bs,), 0.4), np.full((bs,), 0.2)], -1)[:, None, :].astype(np.float32)
    return (jnp.asarray(frame_feats), jnp.asarray(frame_mask),
            jnp.asarray(seg_feats), jnp.asarray(seg_mask), jnp.asarray(tgt))


def test_forward_shapes_and_loss():
    cfg = _tiny_cfg()
    model = MaDe(cfg)
    ff, fm, sf, sm, tgt = _batch(np.random.RandomState(0))
    params = model.init(jax.random.PRNGKey(0), ff, fm, sf, sm, deterministic=True)
    out = model.apply(params, ff, fm, sf, sm, deterministic=True)

    assert out["frame_tokens"].shape == (4, 10, 256)
    assert out["video_emb"].shape == (4, 256)
    assert out["seg_tokens"].shape == (4, 12, 256)
    # fused_xpool_sim (the default) ships the [V, M] similarity directly
    # instead of the [M, V, D] pooled tensor
    assert out["single_sim"].shape == (4, 4)
    assert out["pred_logits_layers"].shape == (2, 4, 1, 2)
    assert out["pred_spans_layers"].shape == (2, 4, 1, 2)
    assert out["proj_queries_layers"].shape == (2, 4, 1, 256)
    assert out["proj_vid_mem"].shape == (4, 10, 256)
    np.testing.assert_allclose(
        np.linalg.norm(out["video_emb"], axis=-1), 1.0, atol=1e-5)

    loss, log = total_loss(out, tgt, cfg)
    assert np.isfinite(float(loss))
    for k in ["retrieval_loss", "localization_loss", "loss_span", "loss_giou", "loss_label"]:
        assert k in log and np.isfinite(float(log[k])), k


def test_jit_grad_and_dropout_rng():
    cfg = _tiny_cfg()
    model = MaDe(cfg)
    ff, fm, sf, sm, tgt = _batch(np.random.RandomState(1))
    params = model.init(jax.random.PRNGKey(0), ff, fm, sf, sm, deterministic=True)

    @jax.jit
    def loss_fn(params, rng):
        out = model.apply(params, ff, fm, sf, sm, deterministic=False,
                          rngs={"dropout": rng})
        return total_loss(out, tgt, cfg)[0]

    g = jax.grad(loss_fn)(params, jax.random.PRNGKey(1))
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(x)) for x in leaves)
    # gradient reaches every trainable tensor group
    flat = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_flatten_with_path(g)[0]}
    touched = [k for k, v in flat.items() if float(jnp.abs(v).sum()) > 0]
    for sub in ["video_tower", "audio_tower", "xpool_v2m", "detr", "span_embed",
                "class_embed", "logit_scale", "query_embed"]:
        assert any(sub in k for k in touched), f"no gradient into {sub}"


@pytest.mark.parametrize("variant", [
    dict(mml_fusion="CA"),
    dict(moment_query_type="zero"),
    dict(moment_query_type="music"),
    dict(decoder_self_attn=True, num_moment_queries=3),
    dict(mml_localization="regression"),
    dict(with_cls_token=True),
    dict(transformer_is_share=True),
    dict(detr_pre_norm=True),
    dict(vmr_fusion="XA-music-video"),
    dict(agg_module="mlp"),
])
def test_config_variants_forward(variant):
    loss_kw = {}
    if variant.get("mml_localization") == "regression":
        loss_kw = {}
    cfg = _tiny_cfg(**variant)
    if variant.get("vmr_fusion") == "XA-music-video":
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, vmr_loss="single"))
    model = MaDe(cfg)
    ff, fm, sf, sm, tgt = _batch(np.random.RandomState(2))
    params = model.init(jax.random.PRNGKey(0), ff, fm, sf, sm, deterministic=True)
    out = model.apply(params, ff, fm, sf, sm, deterministic=True)
    loss, _ = total_loss(out, tgt, cfg)
    assert np.isfinite(float(loss))


def test_per_tower_depth_overrides():
    """video/audio_temporal_depth (reference --video_transformer_depth /
    --audio_transformer_depth, train-MaDe.py:61-62) build towers of
    different depths; param tree shows the extra layers and the forward
    runs."""
    import dataclasses

    from mgsv_tpu.config import Config, DataConfig, ModelConfig

    data = DataConfig(max_v_frames=6, stride=40.0, filter_sec=40.0,
                      vit_dim=16, ast_dim=24)
    model_cfg = ModelConfig(dim_input=16, temporal_mlp_dim=32,
                            detr_ffn_dim=32, detr_enc_layers=1,
                            detr_dec_layers=1, temporal_heads=4,
                            detr_heads=4, contrastive_dim=16,
                            video_pe_len=8, audio_pe_len=8,
                            video_temporal_depth=2, audio_temporal_depth=1)
    cfg = dataclasses.replace(Config(), data=data, model=model_cfg)
    m = MaDe(cfg)
    rng = np.random.RandomState(0)
    B, F, S = 2, 6, cfg.data.max_snippet_num
    ff = jnp.asarray(rng.randn(B, F, 16), jnp.float32)
    fm = jnp.ones((B, F), jnp.float32)
    sf = jnp.asarray(rng.randn(B, S, 24), jnp.float32)
    sm = jnp.ones((B, S), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), ff, fm, sf, sm,
                    deterministic=True)
    vt = params["params"]["video_tower"]["temporal"]
    at = params["params"]["audio_tower"]["temporal"]
    assert "attn_1" in vt and "attn_1" not in at   # depth 2 vs depth 1
    out = m.apply(params, ff, fm, sf, sm, deterministic=True)
    assert out["video_emb"].shape == (B, 16)
