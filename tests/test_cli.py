"""CLI surface tests: train --synthetic end-to-end, evaluate sweep modes.

Covers the all-epoch checkpoint sweep (test-MaDe.py:502-528) for both
checkpoint formats, and the shared override parser.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.torch_oracle

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


@pytest.mark.slow
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

    # --export-torch: convert a trained checkpoint to the reference .bin
    # format and reload it through the import path (full interop cycle)
    export_path = os.path.join(out, "export.bin")
    res = cli_eval.main([
        "--ckpt", "last", "--run-dir", run_dir, "--split", "val",
        "--export-torch", export_path,
        "--data.val_csv", os.path.join(out, "synthetic_data", "data.csv"),
        "--data.feature_root", os.path.join(out, "synthetic_data"),
        *TINY, "--train.batch_size_val", "16",
    ])
    assert res == {"last": {"exported": export_path}}
    import json

    from mgsv_tpu.config import Config
    from mgsv_tpu.interop.torch_import import load_reference_checkpoint
    cfg = Config.from_overrides(
        {TINY[i][2:]: json.loads(TINY[i + 1])
         for i in range(0, len(TINY), 2)})
    back = load_reference_checkpoint(export_path, cfg)
    assert "params" in back


def test_convert_reference_features_cli(tmp_path):
    """`extract_features --convert-from`: a reference-layout feature tree of
    per-id .pt files becomes packed stores that MgsvDataset reads back
    bit-exactly (fp16 features, uint8 masks)."""
    import pandas as pd
    import torch

    from mgsv_tpu.cli import extract_features as cli_x
    from mgsv_tpu.data.dataset import MgsvDataset

    rng = np.random.RandomState(0)
    f, s = 10, 12
    video_ids = [f"v{i}" for i in range(5)]
    music_ids = ["m0", "m1", "m0", "m2", "m1"]     # shared tracks dedup
    src = tmp_path / "Kuai_feature"
    for sub in ("vit_feature1/vit_feature", "vit_feature1/vit_mask",
                "ast_feature2p5/ast_feature", "ast_feature2p5/ast_mask"):
        (src / sub).mkdir(parents=True)
    vit_ref = {}
    for v in video_ids:
        feat = torch.from_numpy(rng.randn(f, 512).astype(np.float32))
        mask = torch.ones(f)
        vit_ref[v] = feat
        torch.save(feat, src / "vit_feature1/vit_feature" / f"{v}.pt")
        torch.save(mask, src / "vit_feature1/vit_mask" / f"{v}.pt")
    for m in set(music_ids):
        torch.save(torch.from_numpy(rng.randn(s, 768).astype(np.float32)),
                   src / "ast_feature2p5/ast_feature" / f"{m}.pt")
        torch.save(torch.ones(s), src / "ast_feature2p5/ast_mask" / f"{m}.pt")

    csv = tmp_path / "data.csv"
    pd.DataFrame({
        "video_id": video_ids, "music_id": music_ids,
        "video_start": 0.0, "video_end": 8.0,
        "music_start": 10.0, "music_end": 30.0,
        "music_total_duration": 120.0, "video_segment_duration": 8.0,
        "music_segment_duration": 20.0, "music_path": "/x",
        "video_total_duration": 8.0, "video_width": 720, "video_height": 1280,
        "video_total_frames": 240, "video_frame_rate": 30,
        "video_category": "t",
    }).to_csv(csv, index=False)

    out = tmp_path / "packed"
    cli_x.main(["--csv", str(csv), "--out", str(out),
                "--convert-from", str(src)])

    ds = MgsvDataset.open(str(csv), str(out / "video_store"),
                          str(out / "music_store"), 240.0)
    batch, meta = next(iter(ds.epoch_batches(5, shuffle=False,
                                             drop_last=False)))
    assert batch["frame_feats"].shape == (5, f, 512)
    assert batch["segment_feats"].shape == (5, s, 768)
    # bit-exact fp16 interop with the reference's stored features
    np.testing.assert_array_equal(
        batch["frame_feats"][0],
        vit_ref["v0"].numpy().astype(np.float16).astype(np.float32))
    # shared music ids map to the same deduped store row
    assert meta.music_ids == music_ids
    np.testing.assert_array_equal(batch["segment_feats"][0],
                                  batch["segment_feats"][2])


@pytest.mark.slow
def test_index_cli_build_query_serve(tmp_path, capsys):
    """`index build` -> `index query` -> `index serve` end-to-end: packed
    stores in, ranked JSON out, HTTP round trip with --warmup pre-compile."""
    import http.client
    import json
    import socket
    import threading
    import time

    import jax

    from mgsv_tpu.cli import index as cli_index
    from mgsv_tpu.cli.train import parse_overrides
    from mgsv_tpu.config import Config
    from mgsv_tpu.core.checkpoint import CheckpointManager
    from mgsv_tpu.data.feature_store import PackedFeatureStore
    from mgsv_tpu.models.made import MaDe

    _, overrides = parse_overrides(TINY)
    cfg = Config.from_overrides(overrides)
    model = MaDe(cfg)
    rng = np.random.RandomState(0)
    s, f = cfg.data.max_snippet_num, cfg.data.max_v_frames

    music_root = str(tmp_path / "music_store")
    PackedFeatureStore.build(
        music_root, [f"m{i}" for i in range(6)],
        {"feats": rng.randn(6, s, cfg.data.ast_dim).astype(np.float32),
         "mask": np.ones((6, s), np.float32)})
    video_root = str(tmp_path / "video_store")
    vf = rng.randn(2, f, cfg.data.vit_dim).astype(np.float32)
    PackedFeatureStore.build(
        video_root, ["v0", "v1"],
        {"feats": vf, "mask": np.ones((2, f), np.float32)})

    params = model.init(
        jax.random.PRNGKey(0), vf[:1], np.ones((1, f), np.float32),
        rng.randn(1, s, cfg.data.ast_dim).astype(np.float32),
        np.ones((1, s), np.float32), deterministic=True)
    run_dir = str(tmp_path / "run")
    mgr = CheckpointManager(run_dir)
    mgr.save("best_r1", {"params": params})
    mgr.wait()

    common = ["--ckpt", "best_r1", "--run-dir", run_dir, *TINY]
    index_path = str(tmp_path / "index.npz")

    cli_index.main(["build", *common, "--music-store", music_root,
                    "--out", index_path])
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built == {"tracks": 6, "path": index_path}

    cli_index.main(["query", *common, "--index", index_path,
                    "--video-store", video_root, "--video-id", "v1",
                    "--top-k", "3"])
    q = json.loads(capsys.readouterr().out)
    assert q["video_id"] == "v1" and len(q["music_ids"]) == 3
    assert len(q["moments"]) == 3 and len(q["moments"][0]) == 2

    with socket.socket() as sock:        # find a free port
        sock.bind(("127.0.0.1", 0))
        port = sock.getsockname()[1]
    threading.Thread(
        target=cli_index.main,
        args=(["serve", *common, "--index", index_path, "--warmup", "1",
               "--top-k", "3", "--host", "127.0.0.1",
               "--port", str(port)],),
        daemon=True).start()
    deadline = time.time() + 300
    while time.time() < deadline:        # warmup compiles first
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
            conn.request("GET", "/healthz")
            assert json.loads(conn.getresponse().read())["index_size"] == 6
            break
        except (ConnectionRefusedError, OSError):
            time.sleep(1.0)
    else:
        raise AssertionError("server did not come up")

    body = json.dumps({"frame_feats": vf[1].tolist(), "top_k": 3})
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", "/query", body,
                 {"Content-Type": "application/json"})
    served = json.loads(conn.getresponse().read())["results"][0]
    # the served single-video result must equal the CLI query for v1
    assert served["music_ids"] == q["music_ids"]
    np.testing.assert_allclose(served["retrieval_scores"],
                               q["retrieval_scores"], atol=1e-5)
