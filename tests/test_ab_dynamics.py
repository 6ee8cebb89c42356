"""Learning-dynamics A/B tests.

1. vs the torch reference: identical init (exported through interop),
   identical batches, dropout off — per-step losses must track to float
   precision over multiple optimizer updates.  This is the trained-behavior
   check VERDICT round 1 asked for (one-batch loss parity does not prove the
   optimizer/schedule/clipping/epoch loop match); the full 20-epoch run with
   metric trajectories is scripts/ab_trained_behavior.py -> AB_REPORT.md.
2. f32 vs bf16 compute dtype on our own model: the bf16 default must not
   change convergence on synthetic data beyond float tolerance.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.torch_oracle]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_trained_behavior_matches_torch_reference(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ab_trained_behavior.py"),
         "--rows", "32", "--epochs", "2", "--bs", "16",
         "--workdir", str(tmp_path),
         "--report", str(tmp_path / "AB_REPORT.md")],
        capture_output=True, text=True, cwd=REPO, timeout=560)
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    # identical init + identical batches + no dropout => float-level tracking
    assert summary["max_rel_loss_dev"] < 1e-4, summary
    final = summary["final"]
    assert final["ref_R1"] == final["our_R1"]
    assert abs(final["ref_mIoU"] - final["our_mIoU"]) < 1e-3
    assert (tmp_path / "AB_REPORT.md").exists()


def test_bf16_head_convergence_matches_f32(tmp_path):
    """VERDICT #9: evidence for the bf16 compute default — same synthetic
    training run under f32 vs bf16 heads must produce matching loss
    trajectories (params/LN/softmax/losses stay f32 in both)."""
    import dataclasses

    import jax

    from mgsv_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from mgsv_tpu.data import synthetic
    from mgsv_tpu.models.made import MaDe
    from mgsv_tpu.train.optimizer import make_optimizer
    from mgsv_tpu.train.step import create_state, make_train_step

    data = DataConfig(max_v_frames=10, stride=20.0, filter_sec=20.0,
                      vit_dim=64, ast_dim=96)
    train = TrainConfig(epochs=3, batch_size_train=16)

    def run(compute_dtype):
        model_cfg = ModelConfig(
            dim_input=32, temporal_mlp_dim=64, detr_ffn_dim=64,
            detr_enc_layers=1, detr_dec_layers=2, contrastive_dim=32,
            video_pe_len=40, audio_pe_len=40,
            temporal_dropout=0.0, xpool_dropout=0.0, detr_dropout=0.0,
            compute_dtype=compute_dtype, fused_detr_encoder=False)
        cfg = Config(data=data, model=model_cfg, train=train)
        root = str(tmp_path / "synth")
        synthetic.generate(root, n_rows=32, n_unique_music=16,
                           data_cfg=cfg.data, seed=0)
        ds = synthetic.open_synthetic(root, cfg.data)
        model = MaDe(cfg)
        steps = ds.num_batches(16) * 3
        tx = make_optimizer(cfg, total_steps=steps)
        first = next(iter(ds.epoch_batches(16, shuffle=False)))[0]
        state = create_state(model, cfg, tx, jax.random.PRNGKey(0), first)
        step = make_train_step(model, cfg)
        losses = []
        for epoch in range(1, 4):
            rng = jax.random.PRNGKey(42 + 977 * epoch)
            for batch, _ in ds.epoch_batches(16, shuffle=True, seed=42,
                                             epoch=epoch):
                state, log = step(state, batch, rng)
                losses.append(float(log["loss"]))
        return np.asarray(losses)

    f32 = run("float32")
    bf16 = run("bfloat16")
    assert np.isfinite(f32).all() and np.isfinite(bf16).all()
    # both runs must learn, and the bf16 trajectory must track f32 closely
    assert f32[-1] < f32[0] and bf16[-1] < bf16[0]
    rel = np.abs(f32 - bf16) / np.abs(f32)
    assert rel.max() < 0.02, f"bf16 diverged from f32: max rel dev {rel.max():.4f}"
