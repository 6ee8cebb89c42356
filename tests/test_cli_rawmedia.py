"""Raw-media extraction, proven as a CHAIN (VERDICT r3 #4).

Synthetic per-second JPEG frame dirs + WAV tracks + reference-format tower
checkpoints -> `extract_features --csv --frames-root --audio-root` -> packed
stores -> 1 training epoch -> `evaluate --ckpt last`.  Every piece is
unit-tested elsewhere (frames/audio/towers/stores); this drives the
reference's second input modality (the raw-data write-through cache,
model_Base.py:406-516 + dataloader_MGSV_EC_rawdata.py:41-158) end-to-end
through OUR explicit batched extraction pass instead.

The tower checkpoints are minted in the reference's on-disk formats —
CLIP `visual.*` keys (ViT-B-32.pt layout) and the audioset AST blob with a
`model_state_dict` wrapper + DDP `module.` prefixes — so the CLI's
geometry-inference path (depth/width/patch/grid from the state dict) is
exercised, not bypassed.
"""

import json
import os
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow

# tiny geometry: 4 frames @ 16px, 2 audio snippets of 10 s @ 8 kHz, 16 mel
# bins x 16 spectrogram frames, CLIP out 12, AST embed 24
DATA = [
    "--data.image_resolution", "16", "--data.max_v_frames", "4",
    "--data.max_m_duration", "20.0", "--data.stride", "10.0",
    "--data.filter_sec", "10.0", "--data.mel_bins", "16",
    "--data.target_length", "16", "--data.sample_rate", "8000",
    "--data.vit_dim", "12", "--data.ast_dim", "24",
]
MODEL = [
    "--model.dim_input", "16", "--model.temporal_mlp_dim", "32",
    "--model.detr_ffn_dim", "32", "--model.detr_enc_layers", "1",
    "--model.detr_dec_layers", "2", "--model.temporal_heads", "2",
    "--model.detr_heads", "2", "--model.contrastive_dim", "16",
    "--model.video_pe_len", "8", "--model.audio_pe_len", "8",
    "--model.compute_dtype", "float32",
]

N_VIDEOS = 16
N_TRACKS = 8


def _r(rng, *shape):
    return rng.randn(*shape).astype(np.float32) * 0.2


def _mint_clip_ckpt(path, rng, width=16, patch=8, grid=2, out_dim=12):
    """ViT-B-32.pt layout: `visual.*` keys, depth inferred from resblocks,
    image grid from the positional embedding (clip_vit.py importer)."""
    import torch

    s = {
        "conv1.weight": _r(rng, width, 3, patch, patch),
        "class_embedding": _r(rng, width),
        "positional_embedding": _r(rng, grid * grid + 1, width),
        "ln_pre.weight": np.ones(width, np.float32),
        "ln_pre.bias": _r(rng, width),
        "ln_post.weight": np.ones(width, np.float32),
        "ln_post.bias": _r(rng, width),
        "proj": _r(rng, width, out_dim),
    }
    b = "transformer.resblocks.0"
    s.update({
        f"{b}.ln_1.weight": np.ones(width, np.float32),
        f"{b}.ln_1.bias": _r(rng, width),
        f"{b}.attn.in_proj_weight": _r(rng, 3 * width, width),
        f"{b}.attn.in_proj_bias": _r(rng, 3 * width),
        f"{b}.attn.out_proj.weight": _r(rng, width, width),
        f"{b}.attn.out_proj.bias": _r(rng, width),
        f"{b}.ln_2.weight": np.ones(width, np.float32),
        f"{b}.ln_2.bias": _r(rng, width),
        f"{b}.mlp.c_fc.weight": _r(rng, 4 * width, width),
        f"{b}.mlp.c_fc.bias": _r(rng, 4 * width),
        f"{b}.mlp.c_proj.weight": _r(rng, width, 4 * width),
        f"{b}.mlp.c_proj.bias": _r(rng, width),
    })
    torch.save({f"visual.{k}": torch.tensor(v) for k, v in s.items()}, path)


def _mint_ast_ckpt(path, rng, d=24, label=5, f_dim=1, t_dim=1):
    """audioset_0.4593.pth layout: model_state_dict wrapper + DDP `module.`
    prefixes; pos_embed already sized for the audio grid (ast.py importer)."""
    import torch

    s = {
        "v.patch_embed.proj.weight": _r(rng, d, 1, 16, 16),
        "v.patch_embed.proj.bias": _r(rng, d),
        "v.cls_token": _r(rng, 1, 1, d),
        "v.dist_token": _r(rng, 1, 1, d),
        "v.pos_embed": _r(rng, 1, f_dim * t_dim + 2, d),
        "v.norm.weight": np.ones(d, np.float32),
        "v.norm.bias": _r(rng, d),
        "mlp_head.0.weight": np.ones(d, np.float32),
        "mlp_head.0.bias": _r(rng, d),
        "mlp_head.1.weight": _r(rng, label, d),
        "mlp_head.1.bias": _r(rng, label),
    }
    b = "v.blocks.0"
    s.update({
        f"{b}.norm1.weight": np.ones(d, np.float32),
        f"{b}.norm1.bias": _r(rng, d),
        f"{b}.attn.qkv.weight": _r(rng, 3 * d, d),
        f"{b}.attn.qkv.bias": _r(rng, 3 * d),
        f"{b}.attn.proj.weight": _r(rng, d, d),
        f"{b}.attn.proj.bias": _r(rng, d),
        f"{b}.norm2.weight": np.ones(d, np.float32),
        f"{b}.norm2.bias": _r(rng, d),
        f"{b}.mlp.fc1.weight": _r(rng, 4 * d, d),
        f"{b}.mlp.fc1.bias": _r(rng, 4 * d),
        f"{b}.mlp.fc2.weight": _r(rng, d, 4 * d),
        f"{b}.mlp.fc2.bias": _r(rng, d),
    })
    torch.save({"model_state_dict":
                {f"module.{k}": torch.tensor(v) for k, v in s.items()}}, path)


def _write_media(root, rng):
    """Per-second JPEG frame dirs (one per video) + 20 s WAV per track —
    the on-disk layout dataloader_MGSV_EC_rawdata.py:41-158 consumes."""
    from PIL import Image

    frames = root / "frames"
    audio = root / "audio"
    frames.mkdir()
    audio.mkdir()
    for i in range(N_VIDEOS):
        d = frames / f"v{i}"
        d.mkdir()
        for sec in range(4):
            img = (rng.rand(20, 20, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"{sec}.jpg")
    for j in range(N_TRACKS):
        pcm = (rng.randn(20 * 8000) * 3000).astype(np.int16)
        with wave.open(str(audio / f"m{j}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(pcm.tobytes())
    return str(frames), str(audio)


def _write_csv(path, rng):
    import pandas as pd

    video_ids = [f"v{i}" for i in range(N_VIDEOS)]
    music_ids = [f"m{i % N_TRACKS}" for i in range(N_VIDEOS)]  # tracks shared
    start = rng.uniform(0.0, 8.0, N_VIDEOS).round(1)
    pd.DataFrame({
        "video_id": video_ids, "music_id": music_ids,
        "video_start": 0.0, "video_end": 3.2,
        "music_start": start, "music_end": start + 6.0,
        "music_total_duration": 20.0, "video_segment_duration": 3.2,
        "music_segment_duration": 6.0, "music_path": "/x",
        "video_total_duration": 4.0, "video_width": 20, "video_height": 20,
        "video_total_frames": 120, "video_frame_rate": 30,
        "video_category": "t",
    }).to_csv(path, index=False)
    return video_ids, music_ids


def test_extract_then_train_then_evaluate(tmp_path):
    from mgsv_tpu.cli import evaluate as cli_eval
    from mgsv_tpu.cli import extract_features as cli_x
    from mgsv_tpu.cli import train as cli_train
    from mgsv_tpu.data.dataset import MgsvDataset

    rng = np.random.RandomState(7)
    frames_root, audio_root = _write_media(tmp_path, rng)
    csv = str(tmp_path / "data.csv")
    video_ids, music_ids = _write_csv(csv, rng)
    clip_ckpt = str(tmp_path / "ViT-tiny.pt")
    ast_ckpt = str(tmp_path / "ast-tiny.pth")
    _mint_clip_ckpt(clip_ckpt, rng)
    _mint_ast_ckpt(ast_ckpt, rng)

    # ---- 1. extraction CLI: raw media -> packed stores
    out = str(tmp_path / "packed")
    cli_x.main([
        "--csv", csv, "--frames-root", frames_root, "--audio-root",
        audio_root, "--clip-ckpt", clip_ckpt, "--ast-ckpt", ast_ckpt,
        "--out", out, "--batch", "8", *DATA,
    ])

    ds = MgsvDataset.open(csv, os.path.join(out, "video_store"),
                          os.path.join(out, "music_store"), 20.0)
    batch, meta = next(iter(ds.epoch_batches(N_VIDEOS, shuffle=False,
                                             drop_last=False)))
    assert batch["frame_feats"].shape == (N_VIDEOS, 4, 12)
    assert batch["segment_feats"].shape == (N_VIDEOS, 2, 24)
    assert np.isfinite(batch["frame_feats"]).all()
    assert np.isfinite(batch["segment_feats"]).all()
    # every frame slot 0..3 is real (video_end=3.2 covers 4 seconds) and
    # both snippet centers (5 s, 15 s) sit inside the 20 s track
    np.testing.assert_array_equal(batch["frame_mask"],
                                  np.ones((N_VIDEOS, 4), np.float32))
    np.testing.assert_array_equal(batch["segment_mask"],
                                  np.ones((N_VIDEOS, 2), np.float32))
    # shared tracks resolve to the same deduped store row
    i0, i8 = music_ids.index("m0"), 8 + music_ids[8:].index("m0")
    np.testing.assert_array_equal(batch["segment_feats"][i0],
                                  batch["segment_feats"][i8])
    # distinct videos produced distinct features (the towers actually ran)
    assert np.abs(batch["frame_feats"][0] - batch["frame_feats"][1]).max() > 0

    # ---- 2. train 1 epoch from the produced stores
    run_out = str(tmp_path / "run")
    cli_train.main([
        "--data.train_csv", csv, "--data.val_csv", csv,
        "--data.feature_root", out, *DATA, *MODEL,
        "--train.epochs", "1", "--train.batch_size_train", "8",
        "--train.batch_size_val", "8", "--train.log_every", "1",
        "--train.device_data", "off", "--train.output_dir", run_out,
    ])
    run_dir = os.path.join(run_out, "made")
    with open(os.path.join(run_dir, "history.json")) as f:
        history = json.load(f)
    assert len(history) == 1
    assert np.isfinite(history[0]["train"]["loss"])

    # ---- 3. evaluate the trained checkpoint on the same split
    results = cli_eval.main([
        "--ckpt", "last", "--run-dir", run_dir, "--split", "val",
        "--data.val_csv", csv, "--data.feature_root", out,
        *DATA, *MODEL, "--train.batch_size_val", "8",
    ])
    summary = results["last"]
    for key in ("R1", "R10", "mIoU"):
        assert np.isfinite(summary[key]), key


def test_sharded_extraction_matches_single_process(tmp_path):
    """Rank-partitioned extraction (VERDICT r4 #6): two `--num-shards 2`
    invocations + `--merge-shards 2` produce stores BYTE-identical to one
    single-process extraction — same .npy bytes, same meta.json id order.
    Sharding is chunk-aligned, so batched-encoder numerics cannot differ."""
    from mgsv_tpu.cli import extract_features as cli_x

    rng = np.random.RandomState(7)
    frames_root, audio_root = _write_media(tmp_path, rng)
    csv = str(tmp_path / "data.csv")
    _write_csv(csv, rng)
    clip_ckpt = str(tmp_path / "ViT-tiny.pt")
    ast_ckpt = str(tmp_path / "ast-tiny.pth")
    _mint_clip_ckpt(clip_ckpt, rng)
    _mint_ast_ckpt(ast_ckpt, rng)

    common = ["--csv", csv, "--frames-root", frames_root,
              "--audio-root", audio_root, "--clip-ckpt", clip_ckpt,
              "--ast-ckpt", ast_ckpt, "--batch", "8", *DATA]

    full = str(tmp_path / "full")
    cli_x.main([*common, "--out", full])

    sharded = str(tmp_path / "sharded")
    for k in range(2):
        cli_x.main([*common, "--out", sharded,
                    "--num-shards", "2", "--shard-index", str(k)])
    assert os.path.isdir(os.path.join(sharded, "shard_0", "video_store"))
    assert os.path.isdir(os.path.join(sharded, "shard_1", "video_store"))
    cli_x.main([*common, "--out", sharded, "--merge-shards", "2"])

    for store in ("video_store", "music_store"):
        for fname in ("feats.npy", "mask.npy"):
            with open(os.path.join(full, store, fname), "rb") as a, \
                 open(os.path.join(sharded, store, fname), "rb") as b:
                assert a.read() == b.read(), (store, fname)
        with open(os.path.join(full, store, "meta.json")) as a, \
             open(os.path.join(sharded, store, "meta.json")) as b:
            assert json.load(a) == json.load(b), store
