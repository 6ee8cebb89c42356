"""Full-model golden parity: MaDe (JAX) vs the reference Uni_model (torch).

The reference model is instantiated directly from /root/reference with
`clip`/`timm`/`wget` stubbed out (those imports only matter for the frozen
encoder branches, which are disabled via encoder_type flags).  Its trained
parameters are exported through mgsv_tpu.interop.torch_import and the two
models are compared end to end on the precomputed-feature path — embeddings,
DETR head outputs, and both task losses.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import torch

# ---- stub the frozen-encoder deps before importing the reference model ----
for name in ["clip", "wget"]:
    sys.modules.setdefault(name, types.ModuleType(name))
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
sys.modules.setdefault("timm", timm)
sys.modules.setdefault("timm.models", timm_models)
sys.modules.setdefault("timm.models.layers", timm_layers)
sys.modules.setdefault("timm.models.vision_transformer", timm_vit)

sys.path.insert(0, "/root/reference")
from model.model_Uni import Uni_model  # noqa: E402

from mgsv_tpu.config import Config  # noqa: E402
from mgsv_tpu.interop.torch_import import import_uni_state_dict  # noqa: E402
from mgsv_tpu.models.made import MaDe  # noqa: E402
from mgsv_tpu.train.objective import total_loss  # noqa: E402


def _ref_args():
    return types.SimpleNamespace(
        name="parity-test",
        local_rank=1,  # silences reference-side logging branches
        hidden_dim=256, dim_input=256,
        music_frozen_feature_path="ast_feature2p5",
        frame_frozen_feature_path="vit_feature1",
        audio_encoder_type="none", video_encoder_type="none",
        video_attention_seqlen=250,
        transformer_is_share=0, video_transformer_depth=1, audio_transformer_depth=1,
        agg_module="transf", SA_temporal_heads=8,
        with_cls_token=0, with_act_after_proj=0, with_last_token=0,
        max_v_frames=10, max_snippet_num=12, max_m_duration=240,
        vmr_fusion="XA-music", fusion_mask=1, vmr_loss="dual_single_loss_fuse",
        dual_single_loss_weight=1.0, ignore_same_music=1,
        temperature_init_value=0.03,
        mml_fusion="concat", mml_localization="detr",
        num_moment_queries=1, moment_query_type="video", predict_center=0,
        moment_loss=0, contrastive_align_loss=1, audio_short_cut=0,
        contrastive_dim=256, aux_loss=1, l1_loss=1,
        detr_hidden_dim=256, detr_dropout=0.1, detr_nheads=8,
        detr_dim_feedforward=1024, detr_enc_layers=2, detr_dec_layers=6,
        detr_pre_norm=False, decoder_SA=0,
        span_loss_type="l1", fb_label="01",
        position_embedding="sine", input_dropout=0.5,
    )


def test_full_model_parity():
    torch.manual_seed(0)
    args = _ref_args()
    ref = Uni_model(args, device=torch.device("cpu"), logger=None)
    # Attach the feature projections the reference only creates together with
    # the frozen encoders (model_Base.py:282,289).
    ref.vit_proj = torch.nn.Linear(512, 256)
    ref.ast_proj = torch.nn.Linear(768, 256)
    ref.eval()

    bs, frames, segs = 6, 10, 12
    rng = np.random.RandomState(7)
    frame_feats = rng.randn(bs, frames, 512).astype(np.float32)
    seg_feats = rng.randn(bs, segs, 768).astype(np.float32)
    frame_mask = np.ones((bs, frames), np.float32)
    frame_mask[:, 8:] = 0
    frame_mask[0, 5:] = 0
    seg_mask = np.ones((bs, segs), np.float32)
    seg_mask[:, 10:] = 0
    seg_mask[1, 4:] = 0
    spans = np.stack([
        rng.uniform(0.3, 0.7, bs), rng.uniform(0.1, 0.3, bs)
    ], -1).astype(np.float32)[:, None, :]  # [B, 1, 2] normalized cw

    with torch.no_grad():
        output_map, loss_map, feat_map, mask_map, _ = ref(
            torch.tensor(frame_feats), torch.tensor(seg_feats),
            torch.tensor(frame_mask), torch.tensor(seg_mask),
            torch.tensor(spans), v_duration=None,
            video_ids=None, music_ids=None, is_train=False,
        )

    # Export weights -> our params.
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    import dataclasses
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="float32"))
    params = import_uni_state_dict(state, cfg)

    model = MaDe(cfg)
    init_params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(frame_feats), jnp.asarray(frame_mask),
        jnp.asarray(seg_feats), jnp.asarray(seg_mask), deterministic=True)
    # Structural check: imported tree must match the model's own init tree.
    ref_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(init_params)[0]}
    got_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths, (
        f"missing: {sorted(ref_paths - got_paths)[:5]} "
        f"extra: {sorted(got_paths - ref_paths)[:5]}")

    out = model.apply(
        params,
        jnp.asarray(frame_feats), jnp.asarray(frame_mask),
        jnp.asarray(seg_feats), jnp.asarray(seg_mask), deterministic=True)

    atol = 2e-4
    np.testing.assert_allclose(
        np.asarray(out["video_emb"]), feat_map["video_feats"].numpy(), atol=atol)
    np.testing.assert_allclose(
        np.asarray(out["music_emb"]), feat_map["music_feats"].numpy(), atol=atol)
    np.testing.assert_allclose(
        np.asarray(out["frame_tokens"]), feat_map["frame_feats"].numpy(), atol=atol)
    np.testing.assert_allclose(
        np.asarray(out["seg_tokens"]), feat_map["segment_feats"].numpy(), atol=atol)
    np.testing.assert_allclose(
        np.asarray(out["pred_logits_layers"][-1]), output_map["pred_logits"].numpy(),
        atol=atol)
    np.testing.assert_allclose(
        np.asarray(out["pred_spans_layers"][-1]), output_map["pred_spans"].numpy(),
        atol=atol)
    np.testing.assert_allclose(
        np.asarray(out["proj_queries_layers"][-1]), output_map["proj_queries"].numpy(),
        atol=atol)
    np.testing.assert_allclose(
        np.asarray(out["proj_vid_mem"]), output_map["proj_vid_mem"].numpy(), atol=atol)

    _, log = total_loss(out, jnp.asarray(spans), cfg)
    np.testing.assert_allclose(
        float(log["retrieval_loss"]), float(loss_map["retrieval_loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(log["localization_loss"]), float(loss_map["localization_loss"]),
        rtol=2e-4)
