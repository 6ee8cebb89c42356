"""EmbeddingNet (agg_module="mlp") parity vs the reference torch module.

Covers the round-1 gap (VERDICT missing #5): BatchNorm running averages are
now maintained with torch semantics and used at eval.  The reference module
(model_Base.py:216-249) is imported directly and driven through train-mode
updates and an eval-mode forward; ours must match both phases.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

# stub the frozen-encoder deps the reference imports at module scope
# (same recipe as tests/test_made_parity.py)
for name in ["clip", "wget"]:
    sys.modules.setdefault(name, types.ModuleType(name))
if "timm" not in sys.modules:
    timm = types.ModuleType("timm")
    timm.__version__ = "0.4.5"
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.to_2tuple = lambda x: (x, x)
    timm_layers.trunc_normal_ = lambda *a, **k: None
    timm_vit = types.ModuleType("timm.models.vision_transformer")
    timm_vit.PatchEmbed = object
    timm_models.layers = timm_layers
    timm_models.vision_transformer = timm_vit
    timm.models = timm_models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers
    sys.modules["timm.models.vision_transformer"] = timm_vit

sys.path.insert(0, "/root/reference")

from mgsv_tpu.models.embedding_net import EmbeddingNet  # noqa: E402

pytestmark = pytest.mark.torch_oracle


def _ref_embedding_net(dim=32, hidden=64, channel=6):
    from model.model_Base import EmbeddingNet as RefEmbeddingNet

    torch.manual_seed(0)
    return RefEmbeddingNet(
        input_size=dim, hidden_size=hidden, output_size=dim,
        channel=channel, dropout=0.5, use_bn=True, init_method="xavier")


def _import_params(ref):
    """Map the torch Sequential's weights onto our flax param tree."""
    # .copy(): torch updates running buffers in place and .numpy() shares
    # memory — without the copy, torch's update would leak into our stats
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    # Sequential: 0 Linear, 1 BN1, 2 ReLU, 3 Linear, 4 BN2, 5 ReLU, 6 Linear
    params = {
        "fc1": {"kernel": sd["net.0.weight"].T, "bias": sd["net.0.bias"]},
        "bn1_scale": sd["net.1.weight"][:, None],
        "bn1_bias": sd["net.1.bias"][:, None],
        "fc2": {"kernel": sd["net.3.weight"].T, "bias": sd["net.3.bias"]},
        "bn2_scale": sd["net.4.weight"][:, None],
        "bn2_bias": sd["net.4.bias"][:, None],
        "fc3": {"kernel": sd["net.6.weight"].T, "bias": sd["net.6.bias"]},
    }
    stats = {
        "bn1_mean": sd["net.1.running_mean"][:, None],
        "bn1_var": sd["net.1.running_var"][:, None],
        "bn2_mean": sd["net.4.running_mean"][:, None],
        "bn2_var": sd["net.4.running_var"][:, None],
    }
    return params, stats


@pytest.mark.parametrize("steps", [1, 3])
def test_embedding_net_parity_train_and_eval(steps):
    dim, hidden, channel, bs = 32, 64, 6, 8
    ref = _ref_embedding_net(dim, hidden, channel)
    model = EmbeddingNet(dim, hidden=hidden)

    rng = np.random.RandomState(0)
    params, stats = _import_params(ref)
    variables = {"params": params, "batch_stats": stats}

    # train mode: batch statistics normalize, running buffers update
    ref.train()
    for step in range(steps):
        x = rng.randn(bs, channel, dim).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x)).numpy()
        ours, mutated = model.apply(variables, jnp.asarray(x),
                                    deterministic=False,
                                    mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ours), ref_out,
                                   atol=2e-5, rtol=1e-4)
        variables = {"params": params, "batch_stats": mutated["batch_stats"]}

    # running buffers must have tracked torch's exactly
    for ours_key, ref_key in [("bn1_mean", "net.1.running_mean"),
                              ("bn1_var", "net.1.running_var"),
                              ("bn2_mean", "net.4.running_mean"),
                              ("bn2_var", "net.4.running_var")]:
        np.testing.assert_allclose(
            np.asarray(variables["batch_stats"][ours_key])[:, 0],
            ref.state_dict()[ref_key].numpy(), atol=2e-5, rtol=1e-4)

    # eval mode: running averages normalize (the round-1 build used batch
    # stats here — the divergence this test pins down)
    ref.eval()
    x = rng.randn(bs, channel, dim).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    ours = model.apply(variables, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_mlp_agg_trains_end_to_end():
    """A tiny MaDe with agg_module="mlp" must train (batch_stats threaded
    through the jitted step) and evaluate with running averages."""
    import dataclasses

    from mgsv_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from mgsv_tpu.models.made import MaDe
    from mgsv_tpu.train.optimizer import make_optimizer
    from mgsv_tpu.train.step import create_state, make_eval_step, make_train_step

    data = DataConfig(max_v_frames=8, stride=30.0, filter_sec=30.0,
                      vit_dim=32, ast_dim=48)
    model_cfg = ModelConfig(dim_input=16, temporal_mlp_dim=32, detr_ffn_dim=32,
                            detr_enc_layers=1, detr_dec_layers=2,
                            temporal_heads=4, detr_heads=4, contrastive_dim=16,
                            video_pe_len=16, audio_pe_len=16,
                            agg_module="mlp")
    cfg = Config(data=data, model=model_cfg,
                 train=TrainConfig(batch_size_train=8))

    rng = np.random.RandomState(0)
    bs, f, s = 8, data.max_v_frames, data.max_snippet_num
    batch = {
        "frame_feats": rng.randn(bs, f, data.vit_dim).astype(np.float32),
        "frame_mask": np.ones((bs, f), np.float32),
        "segment_feats": rng.randn(bs, s, data.ast_dim).astype(np.float32),
        "segment_mask": np.ones((bs, s), np.float32),
        "spans_target": np.tile(np.asarray([[[0.5, 0.2]]], np.float32),
                                (bs, 1, 1)),
        "gt_moment": np.tile(np.asarray([[[96.0, 144.0]]], np.float32),
                             (bs, 1, 1)),
        "m_duration": np.full((bs,), 200.0, np.float32),
        "v_duration": np.full((bs,), 8.0, np.float32),
    }

    model = MaDe(cfg)
    tx = make_optimizer(cfg, total_steps=10)
    state = create_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    assert "batch_stats" in state.params

    before = jax.tree.map(np.asarray, state.params["batch_stats"])
    train_step = make_train_step(model, cfg)
    for _ in range(2):
        state, log = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(log["loss"]))
    after = state.params["batch_stats"]
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, after))
    assert max(changed) > 0, "running BN buffers did not update"

    eval_step = make_eval_step(model, cfg)
    out = eval_step(state.params, batch)
    assert np.isfinite(float(out["loss"]))
