"""Pod-scale retrieval at full MGSV-EC scale: 53k videos x 4k tracks.

VERDICT r2 missing #2: the one place the survey says multi-chip genuinely
matters is corpus-scale retrieval (SURVEY.md §2.7) — the reference falls
back to CPU at 2000^2 (train-MaDe.py:588-591) and has never been run at
dataset scale (53k videos, 4k unique tracks, README.md:39).  This script
runs the COMPLETE eval flow at that scale on one chip:

  1. catalog pass    4,096 tracks through the audio tower in ONE jitted
                     lax.scan dispatch -> music embs + seg tokens
                     [4k, 96, 256]
  2. video pass      53,248 videos through the full model (video tower +
                     DETR localization against each row's GT track,
                     gathered on device from the f16 catalog; synthetic
                     frame features generated on device inside the scan)
                     -> video embs + per-row IoU, one dispatch
  3. rect similarity fused X-Pool pooled cosine [53k, 4k] + dual cosine
                     (dual_single fusion, train-MaDe.py:595-599)
  4. metrics         rect-rank dedup recall computed ON DEVICE
                     (eval/metrics.py::rect_rank_device; exact equivalence
                     with the reference's ranking pinned in
                     tests/test_eval_metrics.py), IoU, composite

Features are synthetic (random) — quality numbers are meaningless by
construction and recorded only to show the pipeline runs; the ARTIFACT is
throughput + peak memory at dataset scale, committed to BASELINE.md.

The scaled-down sharded equivalence (8-dev CPU mesh) lives in
tests/test_xpool_sim_kernel.py::test_fused_sharded_matches_single_device.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    return float(jnp.sum(x))       # chained-dispatch sync (bench.py note)


def main():
    from mgsv_tpu.config import Config
    from mgsv_tpu.core.cache import enable as enable_cache
    from mgsv_tpu.eval.metrics import (composite_metrics, iou_metrics,
                                       recall_metrics_rect)
    from mgsv_tpu.models.made import MaDe
    from mgsv_tpu.ops.pallas.xpool_sim import xpool_sim_fused
    from mgsv_tpu.train.step import make_eval_step

    enable_cache()
    cfg = Config()
    model = MaDe(cfg)
    bs = 512
    n_videos = 104 * bs            # 53,248
    n_tracks = 8 * bs              # 4,096
    d = cfg.model.dim_input
    S, F = cfg.data.max_snippet_num, cfg.data.max_v_frames
    rng = np.random.RandomState(0)
    results = {"n_videos": n_videos, "n_tracks": n_tracks}

    # init params on one example batch
    exb = {
        "frame_feats": rng.randn(bs, F, 512).astype(np.float32),
        "frame_mask": np.ones((bs, F), np.float32),
        "segment_feats": rng.randn(bs, S, 768).astype(np.float32),
        "segment_mask": (rng.rand(bs, S) < 0.8).astype(np.float32),
    }
    params = jax.jit(lambda k, b: model.init(
        k, b["frame_feats"], b["frame_mask"], b["segment_feats"],
        b["segment_mask"], deterministic=True))(jax.random.PRNGKey(0), exb)
    eval_step = make_eval_step(model, cfg)

    dev = jax.devices()[0]

    # ---------------- 1. catalog pass: audio tower over 4k tracks ----------
    # Device-resident synthetic catalog (the device-data path's role).
    seg_feats_cat = jax.device_put(
        rng.randn(n_tracks, S, 768).astype(np.float16))
    seg_mask_cat = jax.device_put(
        (rng.rand(n_tracks, S) < 0.8).astype(np.float32))

    # The audio tower output is independent of the video inputs, so the
    # catalog pass reuses eval_step with a zero dummy video side (one
    # compiled program for both passes).
    dummy_video = {
        "frame_feats": jnp.zeros((bs, F, 512), jnp.float32),
        "frame_mask": jnp.ones((bs, F), jnp.float32),
        "spans_target": jnp.tile(jnp.asarray([[0.5, 0.2]], jnp.float32),
                                 (bs, 1))[:, None, :],
        "gt_moment": jnp.tile(jnp.asarray([[96.0, 144.0]], jnp.float32),
                              (bs, 1))[:, None, :],
        "m_duration": jnp.full((bs,), 200.0, jnp.float32),
        "v_duration": jnp.full((bs,), 30.0, jnp.float32),
    }

    # Single-dispatch device-resident pass: one jitted lax.scan over the
    # catalog chunks.  The per-batch host loop this replaces measured
    # 90-123 s wall for 8 batches whose device compute is 8 x 136 ms —
    # pure remote-link dispatch overhead (BASELINE.md 53k table).
    @jax.jit
    def catalog_scan(params, sf_cat, sm_cat):
        def body(_, chunk):
            sf, sm = chunk
            b = dict(dummy_video, segment_feats=sf.astype(jnp.float32),
                     segment_mask=sm)
            out = eval_step(params, b)
            return None, (out["music_emb"], out["seg_tokens"])
        _, (me, st) = jax.lax.scan(
            body, None,
            (sf_cat.reshape(n_tracks // bs, bs, S, -1),
             sm_cat.reshape(n_tracks // bs, bs, S)))
        return me.reshape(n_tracks, -1), st.reshape(n_tracks, S, -1)

    music_embs, seg_tokens = catalog_scan(params, seg_feats_cat, seg_mask_cat)
    fetch(music_embs)     # warm-up (compile excluded from the timed run)
    t0 = time.perf_counter()
    music_embs, seg_tokens = catalog_scan(params, seg_feats_cat, seg_mask_cat)
    fetch(music_embs)
    results["catalog_pass_s"] = round(time.perf_counter() - t0, 3)

    # ---------------- 2. video pass: full model, one dispatch --------------
    gt_track = rng.randint(n_tracks, size=n_videos)   # each video's GT track
    gt_track_dev = jax.device_put(gt_track)

    # Frame features are generated ON DEVICE inside the scan (synthetic by
    # construction — no 53k x 50 x 512 buffer exists anywhere); the GT
    # track's raw features are gathered on device from the f16 catalog.
    @jax.jit
    def video_scan(params, gt_idx_chunks, sf_cat, sm_cat):
        def body(_, gt_idx):
            key = jax.random.fold_in(jax.random.PRNGKey(42), gt_idx[0])
            ff = jax.random.normal(key, (bs, F, 512), jnp.float32)
            fm = (jax.random.uniform(jax.random.fold_in(key, 1), (bs, F))
                  < 0.8).astype(jnp.float32).at[:, 0].set(1.0)
            b = dict(dummy_video, frame_feats=ff, frame_mask=fm,
                     segment_feats=sf_cat[gt_idx].astype(jnp.float32),
                     segment_mask=sm_cat[gt_idx])
            out = eval_step(params, b)
            return None, (out["video_emb"], out["iou"])
        _, (ve, io) = jax.lax.scan(body, None, gt_idx_chunks)
        return ve.reshape(n_videos, -1), io.reshape(n_videos)

    gt_chunks = gt_track_dev.reshape(n_videos // bs, bs)
    video_embs, ious_dev = video_scan(params, gt_chunks, seg_feats_cat,
                                      seg_mask_cat)
    fetch(video_embs)     # warm-up
    t0 = time.perf_counter()
    video_embs, ious_dev = video_scan(params, gt_chunks, seg_feats_cat,
                                      seg_mask_cat)
    fetch(video_embs)
    results["video_pass_s"] = round(time.perf_counter() - t0, 3)

    # ---------------- 3. rect similarity [53k, 4k] -------------------------
    sub = {"params": params["params"]["xpool_v2m"]}

    @jax.jit
    def rect_sim(video, segs, mask, music):
        single = xpool_sim_fused(video, segs, mask, sub,
                                 block_v=512, block_m=8)
        vn = video * jax.lax.rsqrt(
            jnp.maximum((video * video).sum(-1, keepdims=True), 1e-24))
        mn = music * jax.lax.rsqrt(
            jnp.maximum((music * music).sum(-1, keepdims=True), 1e-24))
        return single + vn @ mn.T                      # [53k, 4k]

    # warm-up compile (not counted), then timed run
    sim = rect_sim(video_embs, seg_tokens, seg_mask_cat, music_embs)
    fetch(sim)
    t0 = time.perf_counter()
    sim = rect_sim(video_embs, seg_tokens, seg_mask_cat, music_embs)
    fetch(sim)
    results["rect_sim_s"] = round(time.perf_counter() - t0, 3)
    pair_flops = 2 * (2 * S * d) + 2 * (2 * d * d)
    results["rect_sim_tflops"] = round(
        n_videos * n_tracks * pair_flops / results["rect_sim_s"] / 1e12, 1)

    try:
        stats = dev.memory_stats()
        results["peak_bytes_in_use_gb"] = round(
            stats.get("peak_bytes_in_use", 0) / 2 ** 30, 2)
    except Exception:
        pass

    # ---------------- 4. metrics (device ranks + host reductions) ----------
    t0 = time.perf_counter()
    track_ids = [f"m{j:05d}" for j in range(n_tracks)]
    gt_ids = [track_ids[t] for t in gt_track]
    # device-resident sim -> rect_rank_device: only [53k] ranks cross the
    # link instead of the 871 MB matrix (eval/metrics.py)
    ret, ranks = recall_metrics_rect(sim, track_ids, gt_ids)
    loc = iou_metrics(np.asarray(ious_dev))
    com = composite_metrics(ranks, np.asarray(ious_dev))
    results["metrics_s"] = round(time.perf_counter() - t0, 3)
    results["total_eval_s"] = round(
        results["catalog_pass_s"] + results["video_pass_s"]
        + results["rect_sim_s"] + results["metrics_s"], 3)
    results["R1_random_features"] = ret["R1"]
    results["MeanR_random_features"] = ret["MeanR"]
    results["mIoU_random_features"] = loc["mIoU"]
    results["R1_iou0.5_random_features"] = com["R1_iou0.5"]

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
