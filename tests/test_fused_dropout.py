"""In-kernel dropout for the fused DETR encoder layer — CPU-testable parts.

The hardware-PRNG kernel path is TPU-only (validated by
scripts/validate_fused_dropout_tpu.py on the real chip: forward matches the
mask-fixed JAX reference to 2e-6, backward-regenerated masks give grads
within 4e-6, keep-rates within 4 sigma).  On the CPU platform the rate>0
path runs the mask-fixed pure-JAX fallback with jax.random(seed) masks;
these tests pin the contract that fallback shares with the kernel:
seed-determinism of fwd AND bwd, seed sensitivity, torch inverted-dropout
semantics, and end-to-end trainability through the flax module / train step.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mgsv_tpu.models.detr import DetrTransformer, FusedDetrEncoderLayer
from mgsv_tpu.ops.pallas.fused_encoder_layer import jax_dropout_masks
from mgsv_tpu.ops.pallas.fused_encoder_layer_vjp import fused_encoder_layer_train

pytestmark = pytest.mark.kernel


def _setup(b=4, L=10, d=32, heads=4, ffn=64, rate=0.2):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.5)
    pos = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.5)
    mask = np.ones((b, L), np.float32)
    mask[0, L // 2:] = 0
    lay = FusedDetrEncoderLayer(d, heads, ffn, dropout=rate)
    params = lay.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, jnp.asarray(mask), pos, False)
    return lay, params, x, jnp.asarray(mask), pos


def test_seed_determinism_and_sensitivity():
    lay, params, x, mask, pos = _setup()
    run = jax.jit(lambda key: lay.apply(params, x, mask, pos, False,
                                        rngs={"dropout": key}))
    a = run(jax.random.PRNGKey(7))
    b = run(jax.random.PRNGKey(7))
    c = run(jax.random.PRNGKey(8))
    det = jax.jit(lambda: lay.apply(params, x, mask, pos, True))()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a - c).max()) > 1e-4, "different rng must change output"
    assert float(jnp.abs(a - det).max()) > 1e-4, "dropout must change output"
    assert np.isfinite(np.asarray(a)).all()


@pytest.mark.slow
def test_bwd_regenerates_fwd_masks():
    """grad of sum(out * cot) must be computed under the SAME masks the
    forward used — checked by comparing against jax.grad of the mask-fixed
    reference (this is exactly the contract the TPU kernel implements by
    re-seeding its PRNG in backward)."""
    from mgsv_tpu.ops.pallas.fused_encoder_layer import layer_fwd_with_masks

    rng = np.random.RandomState(1)
    b, L, d, heads, ffn, rate = 3, 8, 32, 4, 64, 0.25
    x = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.5)
    pos = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.5)
    mask = jnp.ones((b, L), jnp.float32)
    cot = jnp.asarray(rng.randn(b, L, d).astype(np.float32))
    seed = jnp.asarray([99], jnp.int32)

    from mgsv_tpu.models.detr import DetrEncoderLayer
    lay = DetrEncoderLayer(d, heads, ffn, dropout=rate)
    p = lay.init(jax.random.PRNGKey(0), x, mask, pos)["params"]

    def loss_fused(p_, x_):
        out = fused_encoder_layer_train(p_, x_, mask, pos, seed,
                                        heads, 2, True, rate)
        return jnp.sum(out * cot)

    masks = jax_dropout_masks(seed, b, L, d, ffn, heads, rate)

    def loss_ref(p_, x_):
        return jnp.sum(layer_fwd_with_masks(p_, x_, mask, pos, masks, heads) * cot)

    gv, gg = jax.value_and_grad(loss_fused, argnums=(0, 1))(p, x)
    rv, rg = jax.value_and_grad(loss_ref, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(float(gv), float(rv), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5),
        (gg[0], gg[1]), (rg[0], rg[1]))


def test_mask_semantics():
    masks = jax_dropout_masks(jnp.asarray([3], jnp.int32), 2, 8, 16, 32, 4, 0.25)
    for name, m in masks.items():
        vals = np.unique(np.asarray(m))
        np.testing.assert_allclose(vals[vals > 0], 1 / 0.75, rtol=1e-6,
                                   err_msg=name)
        assert (vals >= 0).all()


def test_detr_transformer_trains_with_fused_dropout():
    """Full DETR stack: fused encoder layers WITH dropout + XLA decoders,
    grads flow and are finite; deterministic apply needs no dropout rng."""
    rng = np.random.RandomState(0)
    b, L, d, q = 4, 12, 32, 1
    src = jnp.asarray(rng.randn(b, L, d).astype(np.float32))
    mask = jnp.ones((b, L), jnp.float32)
    pos = jnp.asarray(rng.randn(b, L, d).astype(np.float32))
    qe = jnp.asarray(rng.randn(q, d).astype(np.float32))

    tr = DetrTransformer(d, 4, 64, enc_layers=2, dec_layers=2, dropout=0.1,
                         fused_encoder=True)
    params = tr.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        src, mask, pos, qe, None, False)

    def loss(p):
        hs, mem = tr.apply(p, src, mask, pos, qe, None, False,
                           rngs={"dropout": jax.random.PRNGKey(5)})
        return jnp.sum(hs ** 2) + jnp.sum(mem ** 2)

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert float(val) > 0
    # encoder params get nonzero grads through the fused path
    enc = grads["params"]["enc_0"]
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(enc))
    assert total > 0
    # eval path runs without a dropout rng
    tr.apply(params, src, mask, pos, qe, None, True)


@pytest.mark.slow
def test_train_step_fused_dropout_integration():
    """One jitted train step of the full MaDe model with
    fused_detr_encoder=True AND detr_dropout>0 on the CPU mesh."""
    from mgsv_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from mgsv_tpu.core import mesh as mesh_lib
    from mgsv_tpu.models.made import MaDe
    from mgsv_tpu.train.optimizer import make_optimizer
    from mgsv_tpu.train.step import create_state, make_train_step
    import __graft_entry__ as ge

    cfg = Config(
        data=DataConfig(max_v_frames=8, stride=30.0, filter_sec=30.0,
                        vit_dim=32, ast_dim=48),
        model=ModelConfig(dim_input=16, temporal_mlp_dim=32, detr_ffn_dim=32,
                          detr_enc_layers=1, detr_dec_layers=2,
                          temporal_heads=4, detr_heads=4, contrastive_dim=16,
                          video_pe_len=16, audio_pe_len=16,
                          fused_detr_encoder=True, detr_dropout=0.1),
        train=TrainConfig(batch_size_train=16),
    )
    model = MaDe(cfg)
    rng = np.random.RandomState(0)
    batch = ge._example_batch(rng, cfg, bs=16)
    mesh = mesh_lib.make_mesh((4, 2))
    tx = make_optimizer(cfg, total_steps=10)
    sharded = mesh_lib.shard_batch(mesh, batch)
    step = make_train_step(model, cfg)

    def fresh_state():
        s = create_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
        return mesh_lib.replicate(mesh, s)

    # (train_step donates its state, so each call gets a fresh one)
    _, log1 = step(fresh_state(), sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(log1["loss"]))
    # same rng reproduces; different rng gives a different loss
    _, log1b = step(fresh_state(), sharded, jax.random.PRNGKey(1))
    assert float(log1["loss"]) == float(log1b["loss"])
    _, log2 = step(fresh_state(), sharded, jax.random.PRNGKey(2))
    assert float(log2["loss"]) != float(log1["loss"])


def test_fallback_mask_statistics():
    """Keep-rate and independence of the CPU fallback dropout masks across
    the (site, row, seed) tag space — the statistical contract the TPU
    hardware-PRNG masks are held to on-chip by
    scripts/validate_prng_stats_tpu.py (pltpu.prng_* has no CPU interpret
    lowering, so the hardware stream itself can only be checked there)."""
    from mgsv_tpu.ops.pallas.xpool_sim_vjp import _jax_dropout_mask

    def pearson(a, b):
        a = a.reshape(-1).astype(np.float64) - a.mean()
        b = b.reshape(-1).astype(np.float64) - b.mean()
        den = np.sqrt((a * a).sum() * (b * b).sum())
        return float((a * b).sum() / den)

    b, L, d, f, heads = 8, 24, 64, 128, 4
    for rate in (0.1, 0.3, 0.8):
        keep = 1.0 - rate
        masks = jax_dropout_masks(jnp.asarray([3], jnp.int32).reshape(()),
                                  b, L, d, f, heads, rate)
        pooled = np.concatenate([np.asarray(m).reshape(-1) > 0
                                 for m in masks.values()])
        n = pooled.size
        assert abs(pooled.mean() - keep) <= 5 * np.sqrt(keep * rate / n)
        # per-site rates within their own CI
        for name, m in masks.items():
            mm = np.asarray(m) > 0
            assert abs(mm.mean() - keep) <= 5 * np.sqrt(keep * rate / mm.size), name
        # independence between sites (same seed, different draw)
        a = np.asarray(masks["ffn2"]) > 0
        bb = np.asarray(masks["attn_out"]) > 0
        n2 = min(a.size, bb.size)
        assert abs(pearson(a.reshape(-1)[:n2], bb.reshape(-1)[:n2])) <= 5 / np.sqrt(n2)
        # independence between seeds at the same site
        masks2 = jax_dropout_masks(jnp.asarray([4], jnp.int32).reshape(()),
                                   b, L, d, f, heads, rate)
        a2 = np.asarray(masks2["ffn2"]) > 0
        assert abs(pearson(a.reshape(-1), a2.reshape(-1))) <= 5 / np.sqrt(a.size)

        # xpool fallback mask: rate + row/seed independence
        xm = np.asarray(_jax_dropout_mask(
            jnp.asarray([9], jnp.int32), 16, 32, d, rate)) > 0
        assert abs(xm.mean() - keep) <= 5 * np.sqrt(keep * rate / xm.size)
        assert abs(pearson(xm[0], xm[1])) <= 5 / np.sqrt(xm[0].size)
