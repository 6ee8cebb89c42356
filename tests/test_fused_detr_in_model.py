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
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.kernel]


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


def test_fused_encoder_shard_map_matches_single_device():
    """With a multi-device mesh the fused encoder runs under shard_map
    (batch over dp, params replicated); deterministic forward and gradients
    must match the single-device path exactly."""
    from mgsv_tpu.core.mesh import make_mesh

    b, L, d, heads, q = 8, 12, 32, 4, 1
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.3)
    pos = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.3)
    mask = jnp.asarray(np.ones((b, L), np.float32))
    query = jnp.asarray(rng.randn(q, d).astype(np.float32))

    single = DetrTransformer(d, heads, d * 2, 2, 1, dropout=0.0,
                             fused_encoder=True)
    params = single.init(jax.random.PRNGKey(0), src, mask, pos, query,
                         deterministic=True)
    mesh = make_mesh((8, 1))
    sharded = DetrTransformer(d, heads, d * 2, 2, 1, dropout=0.0,
                              fused_encoder=True, mesh=mesh)

    def loss(mod, p, s_, po_):
        h, m = mod.apply(p, s_, mask, po_, query, deterministic=True)
        return (h ** 2).sum() + (m ** 2).sum()

    f1 = float(loss(single, params, src, pos))
    f2 = float(jax.jit(lambda p, s_, po_: loss(sharded, p, s_, po_))(
        params, src, pos))
    np.testing.assert_allclose(f2, f1, rtol=1e-6)

    g1 = jax.grad(lambda p, s_, po_: loss(single, p, s_, po_),
                  argnums=(0, 1, 2))(params, src, pos)
    g2 = jax.jit(jax.grad(lambda p, s_, po_: loss(sharded, p, s_, po_),
                          argnums=(0, 1, 2)))(params, src, pos)
    for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b_ = np.asarray(a), np.asarray(b_)
        # Per-leaf tolerance: the psum-tree reduction reorders f32 sums vs
        # the single-device sequential accumulation, so near-cancelling
        # leaves (bias grads) carry absolute noise scaled by the summand
        # magnitude, not the leaf max.  A semantic error (e.g. a missing
        # replicated-cotangent psum) is O(dp)=8x, far above this.
        np.testing.assert_allclose(
            b_, a, atol=5e-5 + 1e-6 * float(np.abs(a).max()), rtol=1e-4)


def test_fused_encoder_dropout_decorrelated_across_dp():
    """Dropout seeds fold in axis_index under shard_map: identical input
    rows living on DIFFERENT dp shards must draw different keep masks (the
    pre-fix replicated seed + local row tags made every shard's mask stream
    bit-identical)."""
    from mgsv_tpu.core.mesh import make_mesh
    from mgsv_tpu.models.detr import FusedDetrEncoderLayer

    b, L, d, heads = 16, 12, 32, 4   # dp=8 -> 2 rows per shard
    rng = np.random.RandomState(3)
    row = rng.randn(1, L, d).astype(np.float32) * 0.3
    src = jnp.asarray(np.tile(row, (b, 1, 1)))
    pos = jnp.asarray(np.tile(rng.randn(1, L, d).astype(np.float32) * 0.3,
                              (b, 1, 1)))
    mask = jnp.asarray(np.ones((b, L), np.float32))

    mesh = make_mesh((8, 1))
    layer = FusedDetrEncoderLayer(d, heads, d * 2, dropout=0.5, mesh=mesh)
    params = layer.init(jax.random.PRNGKey(0), src, mask, pos,
                        deterministic=True)
    out = jax.jit(lambda p, s_: layer.apply(
        p, s_, mask, pos, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(7)}))(params, src)
    out = np.asarray(out)
    # shard 0 row 0 vs shard 1 row 0 (= global rows 0 and 2): same input,
    # same local row tag — outputs may only differ through the seed fold.
    assert np.abs(out[0] - out[2]).max() > 1e-4, (
        "dp shards drew identical dropout masks")
    assert np.abs(out[0] - out[4]).max() > 1e-4


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
