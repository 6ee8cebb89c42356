"""CLI surface tests: train --synthetic end-to-end, evaluate sweep modes.

Covers the all-epoch checkpoint sweep (test-MaDe.py:502-528) for both
checkpoint formats, and the shared override parser.
"""

import os

import numpy as np

TINY = [
    "--data.max_v_frames", "12", "--data.stride", "20.0",
    "--data.filter_sec", "20.0", "--data.vit_dim", "64",
    "--data.ast_dim", "96",
    "--model.dim_input", "32", "--model.temporal_mlp_dim", "64",
    "--model.detr_ffn_dim", "64", "--model.detr_enc_layers", "1",
    "--model.detr_dec_layers", "2", "--model.contrastive_dim", "32",
    "--model.video_pe_len", "40", "--model.audio_pe_len", "40",
]


def test_epoch_sweep_tag_discovery(tmp_path):
    from mgsv_tpu.cli.evaluate import _epoch_sweep_tags

    # orbax layout: ckpt_epoch_{N} dirs under the run dir, numeric order
    run = tmp_path / "run"
    for e in (3, 1, 2, 10):
        (run / f"ckpt_epoch_{e}").mkdir(parents=True)
    (run / "ckpt_best_r1").mkdir()
    assert _epoch_sweep_tags(None, str(run)) == [
        "epoch_1", "epoch_2", "epoch_3", "epoch_10"]

    # reference layout: pytorch_model.bin.{N} files in a directory
    ref = tmp_path / "ref"
    ref.mkdir()
    for e in (0, 2, 7):
        (ref / f"pytorch_model.bin.{e}").write_bytes(b"")
    (ref / "pytorch_model.bin.best_r1").write_bytes(b"")
    tags = _epoch_sweep_tags(str(ref), None)
    assert [os.path.basename(t) for t in tags] == [
        "pytorch_model.bin.0", "pytorch_model.bin.2", "pytorch_model.bin.7"]

    assert _epoch_sweep_tags(None, str(tmp_path / "missing")) == []


def test_train_cli_then_epoch_sweep(tmp_path):
    """Train 2 epochs with per-epoch checkpoints via the CLI, then sweep them
    with `evaluate --sweep-epochs` — the reference's all-epoch scan."""
    from mgsv_tpu.cli import evaluate as cli_eval
    from mgsv_tpu.cli import train as cli_train

    out = str(tmp_path)
    cli_train.main([
        "--synthetic", "32", *TINY,
        "--train.epochs", "2", "--train.batch_size_train", "16",
        "--train.batch_size_val", "16", "--train.save_every_epoch", "true",
        "--train.log_every", "1", "--train.output_dir", out,
    ])
    run_dir = os.path.join(out, "made")
    assert os.path.isdir(os.path.join(run_dir, "ckpt_epoch_1"))
    assert os.path.isdir(os.path.join(run_dir, "ckpt_epoch_2"))

    results = cli_eval.main([
        "--sweep-epochs", "--run-dir", run_dir, "--split", "val",
        "--data.val_csv", os.path.join(out, "synthetic_data", "data.csv"),
        "--data.feature_root", os.path.join(out, "synthetic_data"),
        *TINY, "--train.batch_size_val", "16",
    ])
    assert set(results) == {"epoch_1", "epoch_2"}
    for summary in results.values():
        for key in ("R1", "R10", "mIoU"):
            assert np.isfinite(summary[key]), key
