"""FusedDetrEncoderLayer inside the model: param-tree compatibility, forward
equality, and end-to-end training-gradient flow (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mgsv_tpu.config import Config, DataConfig, ModelConfig
from mgsv_tpu.models.detr import DetrTransformer
from mgsv_tpu.models.made import MaDe
from mgsv_tpu.train.objective import total_loss


def test_param_tree_matches_and_forward_equal():
    b, L, d, heads, q = 4, 12, 32, 4, 1
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.3)
    pos = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.3)
    mask = jnp.asarray(np.ones((b, L), np.float32))
    query = jnp.asarray(rng.randn(q, d).astype(np.float32))

    plain = DetrTransformer(d, heads, d * 2, 2, 2, dropout=0.0,
                            decoder_self_attn=True)
    fused = DetrTransformer(d, heads, d * 2, 2, 2, dropout=0.0,
                            decoder_self_attn=True, fused_encoder=True)
    p_plain = plain.init(jax.random.PRNGKey(0), src, mask, pos, query,
                         deterministic=True)
    p_fused = fused.init(jax.random.PRNGKey(0), src, mask, pos, query,
                         deterministic=True)
    keys_a = {jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_flatten_with_path(p_plain)[0]}
    keys_b = {jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_flatten_with_path(p_fused)[0]}
    assert keys_a == keys_b, (
        f"missing {sorted(keys_a - keys_b)[:4]} extra {sorted(keys_b - keys_a)[:4]}")

    # same params, both paths -> same outputs
    h1, m1 = plain.apply(p_plain, src, mask, pos, query, deterministic=True)
    h2, m2 = fused.apply(p_plain, src, mask, pos, query, deterministic=True)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=3e-5)


def test_full_model_trains_with_fused_encoder():
    data = DataConfig(max_v_frames=6, stride=40.0, filter_sec=40.0,
                      vit_dim=32, ast_dim=48)
    model_cfg = ModelConfig(
        dim_input=16, temporal_mlp_dim=32, detr_ffn_dim=32,
        detr_enc_layers=1, detr_dec_layers=2, temporal_heads=4, detr_heads=4,
        contrastive_dim=16, video_pe_len=8, audio_pe_len=8,
        temporal_dropout=0.0, detr_dropout=0.0, fused_detr_encoder=True,
        compute_dtype="float32")
    cfg = dataclasses.replace(Config(), data=data, model=model_cfg)
    model = MaDe(cfg)

    rng = np.random.RandomState(1)
    ff = jnp.asarray(rng.randn(4, 6, 32).astype(np.float32))
    fm = jnp.asarray(np.ones((4, 6), np.float32))
    sf = jnp.asarray(rng.randn(4, 6, 48).astype(np.float32))
    sm = jnp.asarray(np.ones((4, 6), np.float32))
    tgt = jnp.asarray(np.tile([[0.5, 0.2]], (4, 1))[:, None, :].astype(np.float32))

    params = model.init(jax.random.PRNGKey(0), ff, fm, sf, sm,
                        deterministic=True)

    def loss_fn(p, rngkey):
        out = model.apply(p, ff, fm, sf, sm, deterministic=False,
                          rngs={"dropout": rngkey})
        return total_loss(out, tgt, cfg)[0]

    val, grads = jax.value_and_grad(loss_fn)(params, jax.random.PRNGKey(1))
    assert np.isfinite(float(val))
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(grads)[0]}
    enc_grads = [v for k, v in flat.items() if "enc_0" in k]
    assert enc_grads and all(np.all(np.isfinite(g)) for g in enc_grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in enc_grads)
