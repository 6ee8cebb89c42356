"""Typed configuration for the MGSV-TPU framework.

One config object replaces the reference's ~100 argparse flags duplicated
across train-MaDe.py:27-173 and test-MaDe.py:27-175.  Canonical defaults are
the *paper configuration* from scripts/train_kuai_all_feature.sh (which
differs from the reference's argparse defaults in several places — see
SURVEY.md §5 "Config/flag system"): stride 2.5, filter 10, max_v_frames 50,
max_m_duration 240, dim 256, temporal depth 1, vmr_fusion XA-music,
vmr_loss dual_single_loss_fuse, mml_fusion concat, DETR 2 enc / 6 dec,
decoder self-attention off, moment query "video", 1 moment query,
contrastive-align on, audio shortcut off, temperature 3e-2, lr 3e-4 for both
groups, retrieval/localization weights 1.0/1.0, batch 512, 100 epochs,
warmup 0.02.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset / input-geometry config (reference: train-MaDe.py:35-50,146)."""

    train_csv: str = "dataset/MGSV-EC/train_data.csv"
    val_csv: str = "dataset/MGSV-EC/val_data.csv"
    test_csv: str = "dataset/MGSV-EC/test_data.csv"
    feature_root: str = "features/Kuai_feature"

    image_resolution: int = 224
    max_v_frames: int = 50           # ≤50 frames at 1 fps (script: --max_v_frames 50)
    max_m_duration: float = 240.0    # seconds
    stride: float = 2.5              # snippet hop (s); feature dir ast_feature2p5
    filter_sec: float = 10.0         # snippet window (s) (script FILTER=10)
    padding_sec: float = 0.0
    mel_bins: int = 128
    target_length: int = 1024        # AST spectrogram frames per snippet
    sample_rate: int = 16000

    vit_dim: int = 512               # CLIP ViT-B/32 embed dim (model_Base.py:287)
    ast_dim: int = 768               # AST embed dim (model_Base.py:275)

    @property
    def max_snippet_num(self) -> int:
        # train-MaDe.py:146  max_snippet_num = max_m_duration / stride = 96
        return int(self.max_m_duration / self.stride)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """MaDe model architecture (reference: model_Base.py / model_Uni.py)."""

    dim_input: int = 256             # shared hidden dim (== hidden_dim == detr_hidden_dim)

    # Temporal ("enhancement") transformers — model_Base.py:64-91, 312-355
    temporal_depth: int = 1
    # Per-tower depth overrides (reference --video_transformer_depth /
    # --audio_transformer_depth, train-MaDe.py:61-62; both default to the
    # same value, which temporal_depth covers).  0 = inherit
    # temporal_depth.  Unsupported with transformer_is_share (the shared
    # module is one stack).
    video_temporal_depth: int = 0
    audio_temporal_depth: int = 0
    temporal_heads: int = 8
    temporal_mlp_dim: int = 1024     # encoder_attention_hidden_dim (model_Base.py:294)
    temporal_dropout: float = 0.8    # r_enc (model_Base.py:296)
    # Fused Pallas temporal-tower layers (ops/pallas/fused_temporal_layer):
    # checkpoint-compatible twin with in-kernel PRNG dropout.  Default OFF
    # by measurement: XLA with rbg mask bits runs the tower layer fwd+bwd
    # 2x faster than the fused kernel at the paper shapes (6.0 vs 15.1 ms
    # video, 10.2 vs 19.1 ms audio at bs=512 — ROADMAP.md null, BASELINE.md
    # round-3 table).  The per-row [L<=96, 256] GEMMs are too small for the
    # kernel to beat XLA's batched layout.
    fused_temporal: bool = False
    video_pe_len: int = 250          # video_attention_seqlen buffer (train-MaDe.py:61)
    audio_pe_len: int = 300          # audio_attention_seqlen (model_Base.py:293)
    with_cls_token: bool = False
    with_act_after_proj: bool = False
    transformer_is_share: bool = False
    agg_module: str = "transf"       # "transf" | "mlp"

    # Matching / X-Pool — modules/transformer.py
    vmr_fusion: str = "XA-music"     # "NO" | "XA-music" | "XA-video" | "XA-music-video"
    fusion_mask: bool = True
    xpool_dropout: float = 0.3       # modules/transformer.py:133
    # Rematerialize the X-Pool chain in backward: the O(bs^2 * dim) pooled
    # activations dominate train-step HBM traffic; recomputing them cuts the
    # isolated chain grad 64.7 -> 24.7 ms at bs=512 on v5e (measured).
    remat_xpool: bool = True
    # Same idea for the DETR stack's [B, H, L, L] attention matrices.
    remat_detr: bool = False
    # Route DETR encoder layers through the fused Pallas fwd+bwd kernels
    # (~4.8x per layer on v5e); post-norm configs only.  Training dropout
    # (detr_dropout>0) runs on the in-kernel TPU PRNG, masks regenerated in
    # backward (ops/pallas/fused_encoder_layer*.py); on CPU the rate>0 path
    # uses an equivalent mask-fixed JAX fallback.
    fused_detr_encoder: bool = True
    # Compute the training pooled similarity with the custom-VJP fused
    # X-Pool kernel (ops/pallas/xpool_sim_vjp.py): the [B, B, D] pooled
    # tensor never reaches HBM in either direction.  Applies to the
    # XA-music fusion with sim-only vmr losses; other variants keep the
    # XLA pooled path.  Measured on v5e at bs=512: full train step
    # 69.1 -> 59.1 ms (7.4k -> 8.7k clips/s; 54.9 ms with block tuning).
    # On multi-device meshes the kernel runs per-device under shard_map
    # (video axis over dp; models/xpool.py).
    fused_xpool_sim: bool = True
    temperature_init_value: float = 3e-2  # script TEMP=3e-2 (logit_scale init, model_Uni.py:29)

    # Moment-detection fusion + DETR — model_Uni.py:206-227, music_detr/transformer.py:325-335
    mml_fusion: str = "concat"       # "concat" | "CA"
    mml_localization: str = "detr"   # "detr" | "regression"
    detr_enc_layers: int = 2
    detr_dec_layers: int = 6
    detr_heads: int = 8
    detr_ffn_dim: int = 1024
    detr_dropout: float = 0.1
    detr_pre_norm: bool = False
    # Pad the fused (video+music) detection sequence up to a multiple of
    # this many tokens (mask-zero pads) before the DETR stack.  The paper
    # shape is L=146 (50 frames + 96 snippets), a misaligned sublane count
    # on TPU: padding to 152 makes the fused encoder layer FASTER in
    # absolute time (8.62 -> 7.94 ms fwd+bwd, 4.31 -> 3.78 fwd at bs=512
    # on v5e, scripts/exp_seq_pad_tpu.py) despite +4% masked tokens.
    # 1 disables.  Math is unchanged for valid tokens (pad keys are
    # masked out of every softmax; pad rows never leave the stack).
    detr_seq_pad_multiple: int = 8
    # NOTE: the reference's decoder_SA=0 flag is *inert*: build_transformer
    # (music_detr/transformer.py:325-335) never forwards `args`, so the
    # skip-branch guard `self.args is not None and self.args.decoder_SA == 0`
    # (transformer.py:281) is always False and decoder self-attention RUNS.
    # True here reproduces the reference's actual behavior; False gives the
    # skip the flag intended.
    decoder_self_attn: bool = True
    num_moment_queries: int = 1
    moment_query_type: str = "video" # "video" | "music" | "xpool" | "zero"
    predict_center: bool = False
    # Only "l1" exists end-to-end.  The reference's "ce" choice
    # (train-MaDe.py:85) is dead upstream: span_embed always outputs 1-2
    # sigmoid dims (model_Uni.py:52-53,135), so the matcher's ce branch
    # (matcher.py:79-85) would crash on `view(bs*#Q, 2, snippet_num)` and
    # on float-tensor indexing before ever computing a cost.  Rejected
    # loudly in __post_init__ instead of being a silent no-op knob.
    span_loss_type: str = "l1"

    # Heads — model_Uni.py:50-62
    contrastive_dim: int = 256
    audio_short_cut: bool = False
    moment_loss: bool = False

    # CA-fusion cross transformer (mml_fusion == "CA") — model_Uni.py:32-43
    ca_heads: int = 8
    ca_dim_head: int = 128
    ca_mlp_dim: int = 1024
    ca_dropout: float = 0.8

    # Numerics: matmul/activation compute dtype for the trainable head
    # (params, LayerNorms, softmax, and losses always run float32).
    # bfloat16 trains identically on synthetic A/B (loss curves within 1e-2)
    # and is ~11% faster end-to-end on v5e; float32 is the parity-test mode.
    compute_dtype: str = "bfloat16"  # "float32" | "bfloat16"

    def __post_init__(self) -> None:
        if self.span_loss_type != "l1":
            raise ValueError(
                f"span_loss_type={self.span_loss_type!r}: only 'l1' is "
                "implemented — the reference's 'ce' branch is dead upstream "
                "(span_embed never emits snippet logits; matcher.py:79-85 "
                "would crash). See MIGRATION.md.")
        if self.ca_heads == 1 and self.ca_dim_head == self.dim_input:
            # project_out=False in CrossAttention (models/cross.py:43, mirror
            # of model_Base.py:107-118): to_out doesn't exist in that shape,
            # so the torch import/export key maps (interop/torch_import.py
            # _cross_transformer) would KeyError. Reject the config up front
            # rather than failing deep inside interop.
            raise ValueError(
                "ca_heads=1 with ca_dim_head == dim_input selects the "
                "project_out=False CrossAttention shape (no to_out layer), "
                "which the torch interop maps do not support; use >1 heads "
                "or a different ca_dim_head.")


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights & settings (model_Uni.py / music_detr/loss_detr.py / matcher.py)."""

    vmr_loss: str = "dual_single_loss_fuse"
    dual_single_loss_weight: float = 1.0
    ignore_same_music: int = 1       # 1 => plain InfoNCE (train-MaDe.py:124; loss.py:90)

    l1_loss: bool = True
    aux_loss: bool = True
    contrastive_align_loss: bool = True

    # SetCriterion weight_dict (loss_detr.py:36-40)
    weight_span: float = 4.0
    weight_giou: float = 1.0
    weight_label: float = 0.8
    weight_contrastive_align: float = 0.2

    # HungarianMatcher costs (matcher.py:95-103)
    cost_span: float = 10.0
    cost_giou: float = 1.0
    cost_class: float = 4.0

    fb_label: str = "01"             # foreground=0, background=1 (matcher.py:33)
    eos_coef: float = 0.1            # background CE down-weight (model_Uni.py:65)
    align_temperature: float = 0.07  # contrastive-align NCE temperature (model_Uni.py:65)

    ret_loss_weight: float = 1.0     # script RET_WEIGHT
    loc_loss_weight: float = 1.0     # script LOC_WEIGHT

    gt_moment_num: int = 1
    toph_moment: int = 1

    @property
    def foreground_label(self) -> int:
        return 0 if self.fb_label == "01" else 1

    @property
    def background_label(self) -> int:
        return 1 if self.fb_label == "01" else 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization / loop config (train-MaDe.py:252-286, script)."""

    seed: int = 42
    epochs: int = 100
    batch_size_train: int = 512
    batch_size_val: int = 40
    matching_lr: float = 3e-4
    detection_lr: float = 3e-4
    scheduler: str = "warmupcosine"  # warmupcosine|warmuplinear|warmupconstant|constant|exponential
    warmup_rate: float = 0.02
    # exponential-scheduler knobs (train-MaDe.py:130,134,285): gamma and
    # the every-N-steps gating — the one scheduler where lr_update_rate is
    # not forced to 1 (train-MaDe.py:274-275)
    decay_rate: float = 0.9
    lr_update_rate: int = 50
    max_grad_norm: float = 1.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    early_stop_min_epochs: int = 60  # train-MaDe.py:735-736
    early_stop_patience: int = 20
    # Gradient accumulation: the reference parses this flag but never gates
    # backward/step with it (train-MaDe.py:126, SURVEY.md §3.2 note);
    # implemented properly here via optax.MultiSteps.
    gradient_accumulation_steps: int = 1
    # Save a per-epoch checkpoint ("epoch_{n}") in addition to best tags.
    save_every_epoch: bool = False
    # Whole-dataset device residency (data/device_data.py): upload the
    # packed stores to HBM once and gather batches on device — per-step
    # host->device traffic drops to a [bs] index array.  "auto" turns it on
    # for single-accelerator training when the stores fit (< ~6 GB).
    device_data: str = "auto"        # "auto" | "on" | "off" 
    output_dir: str = "runs"
    name: str = "made"
    log_every: int = 10              # num_display
    save_checkpoints: bool = True

    # Mesh axes: data parallel × model parallel. Defaults to pure DP.
    mesh_shape: tuple = (1, 1)       # (dp, mp); (-1, 1) = all devices on dp
    donate_state: bool = True

    # PRNG impl for dropout mask BITS inside the train step: "rbg" (XLA
    # RngBitGenerator — measured 5.6 ms/step faster than threefry at the
    # paper dropout rates on v5e) or "threefry" (jax default).  Key
    # derivation (fold_in per step) is threefry in both cases.
    dropout_rng: str = "rbg"

    # Reference quirk #7 (SURVEY.md): decoder_query_embed belongs to no
    # optimizer param group upstream and never updates.  False reproduces
    # that; True routes it to the detection group and actually trains it.
    train_query_embed: bool = False

    # Profiling: trace a 5-step window of epoch 1 into run_dir/profile.
    profile: bool = False
    # Resume: checkpoint tag to restore before training (e.g. "last").
    resume: str = ""
    # Step-granular, preemption-safe checkpointing: every N completed steps
    # save {params, opt_state, step, epoch, step_in_epoch} as "last" (after
    # verifying the loss window is finite — a poisoned state is never
    # saved).  The seeded per-epoch permutation makes the batch stream
    # replayable from (seed, epoch, offset), so resume fast-forwards the
    # index stream and continues MID-epoch with a bit-identical trajectory;
    # lost work on a kill is bounded by N steps (the reference is
    # epoch-granular at best and its train loop never calls its own resume
    # helper, utils/util_train.py:38-60).  0 = epoch-granular only.
    checkpoint_every_steps: int = 0
    # Fault injection for preemption tests: abort the run (Preempted is
    # raised) once the GLOBAL optimizer step count reaches this value.
    # 0 = off.  Checked after the step's periodic checkpoint, so an
    # aligned abort dies right after a save — the worst case is an abort
    # just before one (N-1 steps of lost work).
    abort_at_step: int = 0


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def replace(self, **sections: Any) -> "Config":
        return dataclasses.replace(self, **sections)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @staticmethod
    def from_overrides(overrides: Optional[dict] = None) -> "Config":
        """Build a Config from a flat dict of `section.key` overrides."""
        cfg = Config()
        if not overrides:
            return cfg
        sections = {"data": {}, "model": {}, "loss": {}, "train": {}}
        for key, value in overrides.items():
            section, _, field = key.partition(".")
            if section not in sections or not field:
                raise KeyError(f"Unknown config override: {key}")
            sections[section][field] = value
        return Config(
            data=dataclasses.replace(cfg.data, **sections["data"]),
            model=dataclasses.replace(cfg.model, **sections["model"]),
            loss=dataclasses.replace(cfg.loss, **sections["loss"]),
            train=dataclasses.replace(cfg.train, **sections["train"]),
        )
