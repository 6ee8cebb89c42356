"""Custom-VJP fused X-Pool similarity: forward + gradient parity.

Oracle = the XPoolTransformer module chain + sim_matrix_music_pooling (the
parity-tested training path).  The kernel runs in interpret mode on CPU for
rate=0 (real kernel code, fwd AND bwd); rate>0 uses the documented pure-JAX
fallback, checked for fwd/bwd self-consistency against the mask-fixed
oracle.  The on-chip PRNG-dropout validation lives in
scripts/validate_fused_xpool_tpu.py (TPU-only semantics).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgsv_tpu.models.xpool import (FusedXPoolSim, XPoolTransformer,
                                   sim_matrix_music_pooling)
from mgsv_tpu.ops.losses import clip_loss

pytestmark = [pytest.mark.slow, pytest.mark.kernel]


def _data(v=12, m=20, s=16, d=32, seed=0):
    rng = np.random.RandomState(seed)
    video = jnp.asarray(rng.randn(v, d), jnp.float32)
    segs = jnp.asarray(rng.randn(m, s, d), jnp.float32)
    mask = jnp.asarray((rng.rand(m, s) < 0.8), jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    return video, segs, mask


def _spread_params(params, scale=0.05, seed=3):
    """Perturb the identity-initialized params so the test isn't at the
    (gradient-degenerate) identity point."""
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.RandomState(seed)
    leaves = [l + scale * rng.randn(*l.shape).astype(np.float32)
              for l in leaves]
    return jax.tree.unflatten(treedef, leaves)


@pytest.mark.parametrize("use_mask", [True, False])
def test_fused_forward_matches_module_chain(use_mask):
    video, segs, mask = _data()
    ref = XPoolTransformer(32, dropout=0.3)
    params = _spread_params(
        ref.init(jax.random.PRNGKey(0), video, segs, mask,
                 deterministic=True))

    pooled = ref.apply(params, video, segs, mask if use_mask else None,
                       deterministic=True)
    want = sim_matrix_music_pooling(video, pooled)         # [V, M]

    fused = FusedXPoolSim(32, dropout=0.3, block_v=8, block_m=4)
    got = fused.apply(params, video, segs, mask if use_mask else None,
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_grads_match_module_chain():
    video, segs, mask = _data()
    ref = XPoolTransformer(32, dropout=0.0)
    params = _spread_params(
        ref.init(jax.random.PRNGKey(0), video, segs, mask,
                 deterministic=True))
    fused = FusedXPoolSim(32, dropout=0.0, block_v=8, block_m=4)
    scale = jnp.float32(np.log(1 / 0.03))

    def loss_ref(p, v, s):
        pooled = ref.apply(p, v, s, mask, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(9)})
        return clip_loss(sim_matrix_music_pooling(v, pooled), scale)

    def loss_fused(p, v, s):
        sim = fused.apply(p, v, s, mask, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(9)})
        return clip_loss(sim, scale)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(params, video, segs)
    got = jax.grad(loss_fused, argnums=(0, 1, 2))(params, video, segs)

    for w, g, path in zip(
            jax.tree.leaves_with_path(want) if False else
            jax.tree.leaves(want), jax.tree.leaves(got), range(10**6)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=5e-5, rtol=5e-4)


def test_fused_dropout_fallback_consistency():
    """rate>0 on CPU: the forward and backward must use the SAME jax.random
    masks (fwd/bwd consistency = finite-difference agreement)."""
    video, segs, mask = _data(v=6, m=8, s=10, d=16)
    fused = FusedXPoolSim(16, dropout=0.3, block_v=8, block_m=4)
    params = _spread_params(
        fused.init(jax.random.PRNGKey(0), video, segs, mask,
                   deterministic=True))
    rngs = {"dropout": jax.random.PRNGKey(5)}

    def loss(v):
        sim = fused.apply(params, v, segs, mask, deterministic=False,
                          rngs=rngs)
        return (sim * sim).sum()

    g = jax.grad(loss)(video)
    # directional finite difference against the same stochastic function
    rng = np.random.RandomState(1)
    direction = jnp.asarray(rng.randn(*video.shape), jnp.float32)
    eps = 1e-3
    lp = loss(video + eps * direction)
    lm = loss(video - eps * direction)
    fd = (lp - lm) / (2 * eps)
    analytic = (g * direction).sum()
    np.testing.assert_allclose(float(analytic), float(fd), rtol=2e-2)


def test_model_trains_with_fused_xpool_sim():
    """MaDe with fused_xpool_sim=True: same param tree as the XLA path
    (checkpoint compat), train step runs, losses match at dropout=0."""
    from mgsv_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from mgsv_tpu.models.made import MaDe
    from mgsv_tpu.train.objective import total_loss

    data = DataConfig(max_v_frames=8, stride=30.0, filter_sec=30.0,
                      vit_dim=32, ast_dim=48)
    base_model = ModelConfig(dim_input=16, temporal_mlp_dim=32,
                             detr_ffn_dim=32, detr_enc_layers=1,
                             detr_dec_layers=2, temporal_heads=4,
                             detr_heads=4, contrastive_dim=16,
                             video_pe_len=16, audio_pe_len=16,
                             xpool_dropout=0.0, compute_dtype="float32",
                             fused_detr_encoder=False)

    rng = np.random.RandomState(0)
    bs, f, s = 8, 8, data.max_snippet_num
    ff = rng.randn(bs, f, 32).astype(np.float32)
    fm = np.ones((bs, f), np.float32)
    sf = rng.randn(bs, s, 48).astype(np.float32)
    sm = np.ones((bs, s), np.float32)
    tgt = np.tile(np.asarray([[[0.5, 0.2]]], np.float32), (bs, 1, 1))

    def run(fused):
        cfg = Config(data=data,
                     model=dataclasses.replace(base_model,
                                               fused_xpool_sim=fused),
                     train=TrainConfig(batch_size_train=bs))
        model = MaDe(cfg)
        params = model.init(jax.random.PRNGKey(0), ff, fm, sf, sm,
                            deterministic=True)
        out = model.apply(params, ff, fm, sf, sm, deterministic=True)
        loss, log = total_loss(out, jnp.asarray(tgt), cfg)
        return params, float(loss), float(log["retrieval_loss"])

    p_xla, loss_xla, ret_xla = run(False)
    p_fused, loss_fused, ret_fused = run(True)

    # identical param trees -> checkpoints interchange
    paths = lambda p: {jax.tree_util.keystr(k)
                       for k, _ in jax.tree_util.tree_flatten_with_path(p)[0]}
    assert paths(p_xla) == paths(p_fused)
    np.testing.assert_allclose(loss_fused, loss_xla, rtol=1e-5)
    np.testing.assert_allclose(ret_fused, ret_xla, rtol=1e-5)

    # gradient step runs end-to-end through the custom VJP
    cfg = Config(data=data,
                 model=dataclasses.replace(base_model, fused_xpool_sim=True,
                                           xpool_dropout=0.3),
                 train=TrainConfig(batch_size_train=bs))
    from mgsv_tpu.train.optimizer import make_optimizer
    from mgsv_tpu.train.step import create_state, make_train_step
    batch = {"frame_feats": ff, "frame_mask": fm, "segment_feats": sf,
             "segment_mask": sm, "spans_target": tgt,
             "gt_moment": np.tile(np.asarray([[[96.0, 144.0]]], np.float32),
                                  (bs, 1, 1)),
             "m_duration": np.full((bs,), 200.0, np.float32),
             "v_duration": np.full((bs,), 8.0, np.float32)}
    model = MaDe(cfg)
    tx = make_optimizer(cfg, total_steps=10)
    state = create_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, cfg)
    state, log = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(log["loss"]))


def test_fused_xpool_shard_map_matches_single_device():
    """FusedXPoolSim with a multi-device mesh runs the kernel under
    shard_map (video axis over dp); forward and gradients must match the
    single-device kernel path."""
    from mgsv_tpu.core.mesh import make_mesh

    video, segs, mask = _data(v=16, m=12, s=8, d=16)
    single = FusedXPoolSim(16, dropout=0.0, block_v=8, block_m=4)
    params = _spread_params(
        single.init(jax.random.PRNGKey(0), video, segs, mask,
                    deterministic=True))
    mesh = make_mesh((8, 1))
    sharded = FusedXPoolSim(16, dropout=0.0, block_v=8, block_m=4, mesh=mesh)
    scale = jnp.float32(np.log(1 / 0.03))

    def loss(mod, p, vv, ss):
        return clip_loss(mod.apply(p, vv, ss, mask, deterministic=True),
                         scale)

    f1 = float(loss(single, params, video, segs))
    f2 = float(jax.jit(lambda p, vv, ss: loss(sharded, p, vv, ss))(
        params, video, segs))
    np.testing.assert_allclose(f2, f1, rtol=1e-6)

    g1 = jax.grad(lambda p, vv, ss: loss(single, p, vv, ss),
                  argnums=(0, 1, 2))(params, video, segs)
    g2 = jax.jit(jax.grad(lambda p, vv, ss: loss(sharded, p, vv, ss),
                          argnums=(0, 1, 2)))(params, video, segs)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)
