"""Benchmark: MaDe training throughput (clips/sec) at the paper config.

Runs the real jit-compiled train step (forward both tasks, Hungarian
matching, backward, 3-group clipped Adam) at the reference's shipped
training shape — batch 512, 50 frame tokens x 512, 96 snippet tokens x 768,
dim 256 — on whatever accelerator JAX sees (one TPU chip under the driver).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "clips/s", "vs_baseline": N}

vs_baseline: ratio against the reference PyTorch implementation's
throughput measured once on this host's CPU (the only hardware the
reference can use here — it has no TPU backend), persisted in
bench_baseline.json.  If the reference is unavailable the ratio falls back
against this repo's own first recorded value.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")

# Perf regression guard (VERDICT r3 weak #2 / task 8): per-device-kind
# floors = 95% of the last committed BENCH number at this config
# (BENCH_r03.json: 10,527 clips/s on TPU v5 lite).  If the measured value
# falls below the floor for a known device kind, the JSON line still prints
# (with "regression_below_floor") and the process exits nonzero so the
# regression cannot land silently.  Update the floor when a deliberate
# model-shape change moves the baseline.
FLOORS_CLIPS_PER_SEC = {
    "TPU v5 lite": 10_000.0,
}


def bench_ours(batch_size: int = 512, steps: int = 20, warmup: int = 2) -> float:
    import jax

    from mgsv_tpu.config import Config
    from mgsv_tpu.core.cache import enable as enable_cache
    from mgsv_tpu.models.made import MaDe
    from mgsv_tpu.train.optimizer import make_optimizer
    from mgsv_tpu.train.step import create_state, make_train_step
    from __graft_entry__ import _example_batch

    enable_cache()
    cfg = Config()
    model = MaDe(cfg)
    rng = np.random.RandomState(0)
    batch = {k: jax.device_put(v)
             for k, v in _example_batch(rng, cfg, bs=batch_size).items()}
    tx = make_optimizer(cfg, total_steps=10_000)
    state = create_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(model, cfg)

    # NOTE: timing must fetch a value to the host — on remote-TPU platforms
    # block_until_ready returns before execution completes, and the first
    # execution of a program can take minutes (program load); pay it in
    # warmup, then time a chained run ended by one scalar fetch.
    key = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, log = train_step(state, batch, key)
        float(log["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, log = train_step(state, batch, key)
    float(log["loss"])  # every step chains into this fetch
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def bench_reference_torch(batch_size: int = 32, steps: int = 3) -> float:
    """Reference Uni_model full train step (fwd+bwd+Adam) on host CPU."""
    import sys
    import types

    import torch

    for name in ["clip", "wget"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    timm = types.ModuleType("timm"); timm.__version__ = "0.4.5"
    tm = types.ModuleType("timm.models")
    tl = types.ModuleType("timm.models.layers")
    tl.to_2tuple = lambda x: (x, x); tl.trunc_normal_ = lambda *a, **k: None
    tv = types.ModuleType("timm.models.vision_transformer"); tv.PatchEmbed = object
    tm.layers, tm.vision_transformer, timm.models = tl, tv, tm
    for k, v in [("timm", timm), ("timm.models", tm),
                 ("timm.models.layers", tl), ("timm.models.vision_transformer", tv)]:
        sys.modules.setdefault(k, v)
    sys.path.insert(0, "/root/reference")
    from model.model_Uni import Uni_model

    args = types.SimpleNamespace(
        name="bench", local_rank=1, hidden_dim=256, dim_input=256,
        music_frozen_feature_path="ast_feature2p5",
        frame_frozen_feature_path="vit_feature1",
        audio_encoder_type="none", video_encoder_type="none",
        video_attention_seqlen=250, transformer_is_share=0,
        video_transformer_depth=1, audio_transformer_depth=1,
        agg_module="transf", SA_temporal_heads=8, with_cls_token=0,
        with_act_after_proj=0, with_last_token=0,
        max_v_frames=50, max_snippet_num=96, max_m_duration=240,
        vmr_fusion="XA-music", fusion_mask=1, vmr_loss="dual_single_loss_fuse",
        dual_single_loss_weight=1.0, ignore_same_music=1,
        temperature_init_value=0.03, mml_fusion="concat",
        mml_localization="detr", num_moment_queries=1,
        moment_query_type="video", predict_center=0, moment_loss=0,
        contrastive_align_loss=1, audio_short_cut=0, contrastive_dim=256,
        aux_loss=1, l1_loss=1, detr_hidden_dim=256, detr_dropout=0.1,
        detr_nheads=8, detr_dim_feedforward=1024, detr_enc_layers=2,
        detr_dec_layers=6, detr_pre_norm=False, decoder_SA=0,
        span_loss_type="l1", fb_label="01", position_embedding="sine",
        input_dropout=0.5,
    )
    model = Uni_model(args, device=torch.device("cpu"), logger=None)
    model.vit_proj = torch.nn.Linear(512, 256)
    model.ast_proj = torch.nn.Linear(768, 256)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=3e-4)

    rng = np.random.RandomState(0)
    ff = torch.tensor(rng.randn(batch_size, 50, 512).astype(np.float32))
    sf = torch.tensor(rng.randn(batch_size, 96, 768).astype(np.float32))
    fm = torch.ones(batch_size, 50); sm = torch.ones(batch_size, 96)
    tgt = torch.tensor(
        np.stack([np.full((batch_size, 1), 0.5), np.full((batch_size, 1), 0.2)],
                 -1).astype(np.float32))

    def step():
        _, loss_map, _, _, _ = model(ff, sf, fm, sm, tgt, is_train=True)
        loss = loss_map["retrieval_loss"] + loss_map["localization_loss"]
        opt.zero_grad(); loss.backward(); opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def step_efficiency(clips_per_sec: float, batch_size: int = 512):
    """Achieved model TFLOP/s and MFU from the analytic FLOP count
    (mgsv_tpu/core/flops.py — a constant of the config)."""
    import jax

    from mgsv_tpu.config import Config
    from mgsv_tpu.core.flops import peak_tflops, train_step_flops

    flops = train_step_flops(Config(), batch_size)["train_step"]
    step_time = batch_size / clips_per_sec
    tflops = flops / step_time / 1e12
    kind = jax.devices()[0].device_kind
    peak = peak_tflops(kind)
    return {
        "tflops": round(tflops, 2),
        "mfu": round(tflops / peak, 4) if peak else None,
        "device_kind": kind,
    }


def main():
    value = bench_ours()

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)
    else:
        try:
            ref_cps = bench_reference_torch()
            baseline = {"clips_per_sec": ref_cps,
                        "source": "reference torch CPU (host), bs=32"}
        except Exception as e:  # pragma: no cover
            baseline = {"clips_per_sec": value, "source": f"self (ref bench failed: {e})"}
        with open(BASELINE_FILE, "w") as f:
            json.dump(baseline, f, indent=2)

    record = {
        "metric": "made_train_clips_per_sec_bs512",
        "value": round(value, 2),
        "unit": "clips/s",
        "vs_baseline": round(value / baseline["clips_per_sec"], 3),
    }
    try:
        record.update(step_efficiency(value))
    except Exception:  # efficiency fields are best-effort extras
        pass
    if "device_kind" not in record:
        # the floor check must NOT depend on the best-effort block above —
        # if step_efficiency ever fails, the regression guard still fires
        try:
            import jax
            record["device_kind"] = jax.devices()[0].device_kind
        except Exception:  # pragma: no cover
            pass
    floor = FLOORS_CLIPS_PER_SEC.get(record.get("device_kind", ""))
    if floor is not None and value < floor:
        record["regression_below_floor"] = floor
        print(json.dumps(record))
        print(f"PERF REGRESSION: {value:.1f} clips/s is below the committed "
              f"floor {floor:.1f} for {record['device_kind']}", file=sys.stderr)
        sys.exit(1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
