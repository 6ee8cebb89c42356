"""Fused temporal-tower layer: parity with the standard flax module.

The kernel math itself is validated against a pure-JAX oracle here (CPU
interpret path) and on-chip by scripts/validate_fused_temporal_tpu.py
(hardware PRNG masks emitted and fed to the oracle).  These tests pin:
param-tree/checkpoint compatibility, forward+grad parity at rate=0, and
the mask-fixed CPU fallback contract at rate>0.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mgsv_tpu.models.temporal import FusedTemporalTransformer, TemporalTransformer

pytestmark = [pytest.mark.slow, pytest.mark.kernel]


def _setup(depth=1, b=4, L=10, d=32, heads=4, f=64, dropout=0.0):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.5)
    mask = np.ones((b, L), np.float32)
    mask[0, L // 2:] = 0
    std = TemporalTransformer(d, depth, heads, f, d, dropout=dropout)
    fused = FusedTemporalTransformer(d, depth, heads, f, d, dropout=dropout)
    params = std.init(jax.random.PRNGKey(0), x, mask, deterministic=True)
    return std, fused, params, x, jnp.asarray(mask)


def test_param_tree_identical():
    std, fused, params, x, mask = _setup(depth=2)
    pf = fused.init(jax.random.PRNGKey(0), x, mask, deterministic=True)
    flat_s = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(pf)[0]
    paths_s = [jax.tree_util.keystr(p) for p, _ in flat_s]
    paths_f = [jax.tree_util.keystr(p) for p, _ in flat_f]
    assert paths_s == paths_f
    for (_, a), (_, b) in zip(flat_s, flat_f):
        assert a.shape == b.shape


def test_forward_and_grad_parity_deterministic():
    std, fused, params, x, mask = _setup(depth=2)
    out_s = std.apply(params, x, mask, deterministic=True)
    out_f = fused.apply(params, x, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               atol=2e-5)

    g = jnp.asarray(np.random.RandomState(1).randn(*out_s.shape)
                    .astype(np.float32))

    def loss(mod):
        return lambda p, xx: (mod.apply(p, xx, mask, deterministic=True)
                              * g).sum()

    gs = jax.grad(loss(std), argnums=(0, 1))(params, x)
    gf = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    err = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), gf, gs)
    assert max(jax.tree.leaves(err)) < 5e-4, jax.tree.leaves(err)


def test_dropout_fallback_deterministic_and_sensitive():
    std, fused, params, x, mask = _setup(dropout=0.5)
    out1 = fused.apply(params, x, mask, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(7)})
    out2 = fused.apply(params, x, mask, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(7)})
    out3 = fused.apply(params, x, mask, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(8)})
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert float(jnp.abs(out1 - out3).max()) > 0.0

    # grads flow and are finite through the fallback
    def loss(p):
        return fused.apply(p, x, mask, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(7)}).sum()
    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(grads))


def test_model_with_fused_temporal_matches_standard():
    """MaDe with fused_temporal on/off gives identical deterministic
    outputs for the same params (the config flag only swaps compute)."""
    import dataclasses

    from mgsv_tpu.config import Config
    from mgsv_tpu.models.made import MaDe

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, vit_dim=16, ast_dim=24,
                                 max_v_frames=4, stride=60.0, filter_sec=60.0),
        model=dataclasses.replace(
            cfg.model, dim_input=8, temporal_mlp_dim=16, detr_ffn_dim=16,
            temporal_heads=2, detr_heads=2, detr_enc_layers=1,
            detr_dec_layers=1, contrastive_dim=8, video_pe_len=8,
            audio_pe_len=8, compute_dtype="float32",
            fused_detr_encoder=False),
    )
    cfg_fused = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fused_temporal=True))
    cfg_std = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fused_temporal=False))

    rng = np.random.RandomState(0)
    ff = jnp.asarray(rng.randn(2, 4, 16).astype(np.float32))
    fm = jnp.ones((2, 4))
    sf = jnp.asarray(rng.randn(2, 4, 24).astype(np.float32))
    sm = jnp.ones((2, 4))

    m_std = MaDe(cfg_std)
    params = m_std.init(jax.random.PRNGKey(0), ff, fm, sf, sm,
                        deterministic=True)
    out_s = m_std.apply(params, ff, fm, sf, sm, deterministic=True)
    out_f = MaDe(cfg_fused).apply(params, ff, fm, sf, sm, deterministic=True)
    for key in ("video_emb", "music_emb", "pred_spans_layers"):
        np.testing.assert_allclose(np.asarray(out_f[key]),
                                   np.asarray(out_s[key]), atol=5e-5)
