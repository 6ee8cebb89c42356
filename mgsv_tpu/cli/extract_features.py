"""Feature extraction: raw media -> packed feature stores, on TPU.

The materialization pass replacing the reference's per-item write-through
cache (model_Base.py:418-438, 476-492 — which computed missing features
one id at a time during training, torch.save'ing each to its own .pt).
Here extraction is an explicit batched pass: decode on host, encode with
the frozen CLIP/AST towers on TPU at large batch, write packed memmap
stores that the training pipeline gathers from.

Usage:
  python -m mgsv_tpu.cli.extract_features \
    --csv dataset/MGSV-EC/val_data.csv \
    --frames-root /data/frames --audio-root /data/music \
    --clip-ckpt ViT-B-32.pt --ast-ckpt audioset_0.4593.pth \
    --out features/packed

Also supports converting an existing reference feature directory
(--convert-from features/Kuai_feature) without any model forward.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

logger = logging.getLogger("mgsv_tpu.extract")


def _load_clip_params(path: str):
    """Returns (tower, params) with the tower geometry INFERRED from the
    checkpoint (width/patch from conv1, depth from resblock count, out_dim
    from proj, image grid from the positional embedding, heads via CLIP's
    64-dim-head convention — ViT-B/32 resolves to the canonical 768/12/12).
    """
    import math

    import torch

    from mgsv_tpu.models.clip_vit import (ClipVisionTower,
                                          import_clip_visual_state_dict)

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.state_dict() if hasattr(blob, "state_dict") else blob
    np_state = {k: v.float().numpy() for k, v in state.items()
                if hasattr(v, "numpy")}
    s = {k[len("visual."):]: v for k, v in np_state.items()
         if k.startswith("visual.")} or np_state
    depth = 1 + max(int(k.split(".")[2]) for k in s
                    if k.startswith("transformer.resblocks."))
    width, _, patch, _ = s["conv1.weight"].shape
    grid = int(math.isqrt(s["positional_embedding"].shape[0] - 1))
    tower = ClipVisionTower(
        width=width, depth=depth, heads=max(1, width // 64), patch=patch,
        out_dim=s["proj"].shape[1], image_size=grid * patch)
    return tower, import_clip_visual_state_dict(np_state, depth=depth)


def _load_ast_params(path: str, dcfg):
    """Returns (encoder, params); embed dim / depth / label dim inferred
    from the checkpoint (heads via timm's 64-dim-head rule — the audioset
    AST resolves to 768/12/12), input geometry from the data config."""
    import torch

    from mgsv_tpu.models.ast import (ASTEncoder, import_ast_state_dict,
                                     patch_grid)

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    np_state = {k: v.float().numpy() for k, v in state.items()}
    stripped = {k.split("module.", 1)[-1]: v for k, v in np_state.items()}
    depth = 1 + max(int(k.split(".")[2]) for k in stripped
                    if k.startswith("v.blocks."))
    embed_dim = stripped["v.patch_embed.proj.weight"].shape[0]
    label_dim = (stripped["mlp_head.1.weight"].shape[0]
                 if "mlp_head.1.weight" in stripped else 527)
    enc = ASTEncoder(embed_dim=embed_dim, depth=depth,
                     heads=max(1, embed_dim // 64), label_dim=label_dim,
                     input_fdim=dcfg.mel_bins, input_tdim=dcfg.target_length)
    # The checkpoint's pos_embed grid is fixed while the encoder geometry
    # comes from --data.* overrides; a disagreement would otherwise surface
    # as an opaque broadcast-shape error deep inside apply.
    f_dim, t_dim = patch_grid(enc.fstride, enc.tstride,
                              dcfg.mel_bins, dcfg.target_length)
    want = f_dim * t_dim + 2
    have = stripped["v.pos_embed"].shape[1]
    if have != want:
        raise ValueError(
            f"AST geometry mismatch: --data.mel_bins={dcfg.mel_bins} / "
            f"--data.target_length={dcfg.target_length} imply a "
            f"{f_dim}x{t_dim} patch grid ({want} pos-embed tokens incl. "
            f"cls/dist), but the checkpoint {path!r} carries {have}; use the "
            "geometry the checkpoint was trained at (reference default: "
            "128 mel bins x 1024 frames -> 12x101 grid, 1214 tokens)")
    return enc, import_ast_state_dict(np_state, depth=depth)


def _audio_path(root: str, mid: str) -> str:
    """Resolve a track id to its on-disk audio file by extension, so
    compressed formats reach the pluggable decoder hook
    (data/media.py::register_audio_decoder) instead of a hardcoded .wav."""
    import glob

    wav = os.path.join(root, f"{mid}.wav")
    if os.path.exists(wav):
        return wav
    hits = sorted(glob.glob(os.path.join(glob.escape(root),
                                         glob.escape(mid) + ".*")))
    if not hits:
        raise FileNotFoundError(f"no audio file for track {mid!r} in {root}")
    return hits[0]


def _shard_chunks(items, chunk_size: int, shard_index: int, num_shards: int):
    """Contiguous CHUNK-aligned shard of a work list.

    Sharding is by encode-batch chunks (not raw items) so every chunk a
    shard encodes has exactly the same composition as in a single-process
    run — the byte-identity guarantee of the 2-process extraction test
    does not depend on batched-encoder numerics being batch-size
    invariant.  Returns the shard's items, preserving global order.
    """
    chunks = [items[i:i + chunk_size]
              for i in range(0, len(items), chunk_size)]
    lo = shard_index * len(chunks) // num_shards
    hi = (shard_index + 1) * len(chunks) // num_shards
    return [x for c in chunks[lo:hi] for x in c]


def extract(args, dcfg) -> None:
    from mgsv_tpu.data.audio import extract_snippets, resample_sinc
    from mgsv_tpu.data.csv_index import load_csv_index
    from mgsv_tpu.data.feature_store import PackedFeatureStore
    from mgsv_tpu.data.frames import load_clip_frames
    from mgsv_tpu.data.media import load_audio
    from mgsv_tpu.models.frozen import FrozenEncoders

    index = load_csv_index(args.csv, dcfg.max_m_duration)
    clip_tower, clip_params = _load_clip_params(args.clip_ckpt)
    ast_enc, ast_params = _load_ast_params(args.ast_ckpt, dcfg)
    enc = FrozenEncoders(clip_params, ast_params, clip_tower=clip_tower,
                         ast_encoder=ast_enc)

    # Rank-partitioned extraction (VERDICT r4 #6): each shard takes a
    # contiguous chunk-aligned slice of the unique-id work lists and writes
    # its own store tree under {out}/shard_{i}; `--merge-shards N` then
    # concatenates them into stores byte-identical to a single-process run
    # (the one-time 53k extraction drops from ~100 min on one host to
    # ~100/N).  A pod launcher passes --shard-index $PROCESS_INDEX.
    shards = max(1, args.num_shards)
    shard = args.shard_index or 0
    if not 0 <= shard < shards:
        raise SystemExit(f"--shard-index {shard} out of range for "
                         f"--num-shards {shards}")
    out_root = (args.out if shards == 1
                else os.path.join(args.out, f"shard_{shard}"))

    # ---- video frames (per-row CSV windows — get_clip_frame extracts
    # exactly [video_start, video_end], rawdata.py:41-92)
    window_of = {}
    for vid, s, e in zip(index.video_ids, index.video_start, index.video_end):
        window_of.setdefault(vid, (float(s), float(e)))
    uniq_videos = list(dict.fromkeys(index.video_ids))
    my_videos = _shard_chunks(uniq_videos, args.batch, shard, shards)
    feats, masks = [], []
    for i in range(0, len(my_videos), args.batch):
        chunk = my_videos[i:i + args.batch]
        frames, fmask = [], []
        for vid in chunk:
            start_s, end_s = window_of[vid]
            fr, mk = load_clip_frames(
                os.path.join(args.frames_root, vid), start_s, end_s,
                dcfg.max_v_frames, dcfg.image_resolution)
            frames.append(fr); fmask.append(mk)
        emb = np.asarray(enc.encode_frames(np.stack(frames)))
        feats.append(emb.astype(np.float16))
        masks.append(np.stack(fmask).astype(np.uint8))
        logger.info("video %d/%d", i + len(chunk), len(my_videos))
    if my_videos:
        PackedFeatureStore.build(
            os.path.join(out_root, "video_store"), my_videos,
            {"feats": np.concatenate(feats), "mask": np.concatenate(masks)})

    # ---- audio snippets
    music_chunk = max(1, args.batch // 8)
    uniq_music = list(dict.fromkeys(index.music_ids))
    my_music = _shard_chunks(uniq_music, music_chunk, shard, shards)
    feats, masks = [], []
    for i in range(0, len(my_music), music_chunk):
        chunk = my_music[i:i + music_chunk]
        specs, smask = [], []
        for mid in chunk:
            wav, sr = load_audio(_audio_path(args.audio_root, mid))
            wav = resample_sinc(wav, sr, dcfg.sample_rate)
            sp, mk = extract_snippets(
                wav, dcfg.sample_rate, dcfg.max_m_duration, dcfg.stride,
                dcfg.filter_sec, dcfg.padding_sec, dcfg.mel_bins,
                dcfg.target_length)
            specs.append(sp); smask.append(mk)
        emb = np.asarray(enc.encode_snippets(np.stack(specs)))
        feats.append(emb.astype(np.float16))
        masks.append(np.stack(smask).astype(np.uint8))
        logger.info("music %d/%d", i + len(chunk), len(my_music))
    if my_music:
        PackedFeatureStore.build(
            os.path.join(out_root, "music_store"), my_music,
            {"feats": np.concatenate(feats), "mask": np.concatenate(masks)})


def merge_shards(args) -> None:
    """Concatenate {out}/shard_{0..N-1} stores into {out}/{video,music}_store.

    Shards hold contiguous chunk-aligned slices in global order, so plain
    concatenation reproduces the single-process store byte-for-byte
    (asserted by tests/test_cli_rawmedia.py's 2-shard extraction test).
    A shard directory may lack a store entirely when there were fewer work
    chunks than shards — skipped, not an error.
    """
    from mgsv_tpu.data.feature_store import PackedFeatureStore

    for store_name in ("video_store", "music_store"):
        ids, feats, masks = [], [], []
        for k in range(args.merge_shards):
            root = os.path.join(args.out, f"shard_{k}", store_name)
            if not os.path.isdir(root):
                continue
            st = PackedFeatureStore(root, use_native=False)
            rows = np.arange(len(st))
            ids.extend(st.ids)
            feats.append(st.gather("feats", rows, dtype=None))
            masks.append(st.gather("mask", rows, dtype=None))
        if not ids:
            raise SystemExit(f"--merge-shards found no {store_name} under "
                             f"{args.out}/shard_*")
        if len(set(ids)) != len(ids):
            raise SystemExit(f"duplicate ids across {store_name} shards — "
                             "shards must come from the same CSV and "
                             "disjoint --shard-index values")
        PackedFeatureStore.build(
            os.path.join(args.out, store_name), ids,
            {"feats": np.concatenate(feats), "mask": np.concatenate(masks)})
        logger.info("merged %d shard stores -> %s (%d ids)",
                    args.merge_shards, store_name, len(ids))


def convert(args, dcfg) -> None:
    """Reference .pt feature dirs -> packed stores (no model forward)."""
    from mgsv_tpu.data.csv_index import load_csv_index
    from mgsv_tpu.data.feature_store import convert_reference_features

    index = load_csv_index(args.csv, dcfg.max_m_duration)
    src = args.convert_from
    convert_reference_features(
        os.path.join(src, "vit_feature1", "vit_feature"),
        os.path.join(src, "vit_feature1", "vit_mask"),
        index.video_ids, os.path.join(args.out, "video_store"))
    convert_reference_features(
        os.path.join(src, "ast_feature2p5", "ast_feature"),
        os.path.join(src, "ast_feature2p5", "ast_mask"),
        index.music_ids, os.path.join(args.out, "music_store"))


def main(argv=None):
    from mgsv_tpu.core.cache import enable as _enable_cache
    _enable_cache()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    p = argparse.ArgumentParser("mgsv-tpu-extract-features")
    p.add_argument("--csv", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--frames-root", default=None)
    p.add_argument("--audio-root", default=None)
    p.add_argument("--clip-ckpt", default=None)
    p.add_argument("--ast-ckpt", default=None)
    p.add_argument("--convert-from", default=None,
                   help="reference feature root (e.g. features/Kuai_feature)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--num-shards", type=int, default=1,
                   help="rank-partitioned extraction: this invocation "
                        "processes 1/N of the work and writes to "
                        "{out}/shard_{i} (see --shard-index)")
    p.add_argument("--shard-index", type=int, default=None,
                   help="which shard this invocation is (a pod launcher "
                        "passes its process index)")
    p.add_argument("--merge-shards", type=int, default=0,
                   help="merge {out}/shard_{0..N-1} stores into {out} "
                        "(byte-identical to a single-process extraction) "
                        "and exit")
    # shared flags: --platform/--cpu-devices (forced in-process before the
    # backend exists) + --data.key [=]value geometry overrides.  Parsed
    # HERE rather than via the train CLI's parser — routing through
    # parse_overrides would silently swallow train-only flags (--synthetic,
    # --config-json) and --coordinator would initialize jax.distributed.
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu", "axon"])
    p.add_argument("--cpu-devices", type=int, default=None)
    args, rest = p.parse_known_args(argv)
    from mgsv_tpu.cli.train import parse_kv_overrides
    from mgsv_tpu.config import Config
    from mgsv_tpu.core.platform import force_platform
    force_platform(args.platform, args.cpu_devices)
    overrides = parse_kv_overrides(rest)
    bad = [k for k in overrides if not k.startswith("data.")]
    if bad:
        raise SystemExit(f"extract_features only takes --data.* overrides "
                         f"(plus --platform/--cpu-devices), got {bad}")
    dcfg = Config.from_overrides(overrides).data
    if args.merge_shards:
        merge_shards(args)
    elif args.convert_from:
        convert(args, dcfg)
    else:
        if not all([args.frames_root, args.audio_root, args.clip_ckpt, args.ast_ckpt]):
            raise SystemExit(
                "need --frames-root --audio-root --clip-ckpt --ast-ckpt "
                "(or --convert-from)")
        extract(args, dcfg)


if __name__ == "__main__":
    main()
