"""Serving-path latency/throughput on one chip at production scale.

The serving subsystem (serve/engine.py + serve/server.py) is the one
production surface without an on-chip number in BASELINE.md.  This script
builds a MusicIndex over a full-size catalog (4,096 tracks — the MGSV-EC
unique-track count, README.md:39) at the paper shapes (96 snippets x 256,
50 frames x 512) and measures end-to-end `RetrievalEngine.query` latency:
video-tower encode + dual+pooled similarity against all 4,096 tracks +
top-k localization (DETR) per candidate — including every host<->device
round-trip a real client would pay over this remote-tunnel chip.

Synthetic features (random); the artifact is latency, not quality.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    from mgsv_tpu.config import Config
    from mgsv_tpu.core.cache import enable as enable_cache
    from mgsv_tpu.models.made import MaDe
    from mgsv_tpu.serve.engine import RetrievalEngine, build_music_index

    enable_cache()
    cfg = Config()
    model = MaDe(cfg)
    rng = np.random.RandomState(0)
    S, F = cfg.data.max_snippet_num, cfg.data.max_v_frames
    # catalog size from argv (default: MGSV-EC's 4,096 unique tracks;
    # pass 53248 for the beyond-dataset single-chip scale artifact —
    # seg_tokens alone are then [53k, 96, 256] f32 = 5.2 GB of HBM)
    n_tracks = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    top_k = 5
    results = {"n_tracks": n_tracks, "top_k": top_k}

    exb = {
        "frame_feats": rng.randn(8, F, 512).astype(np.float32),
        "frame_mask": np.ones((8, F), np.float32),
        "segment_feats": rng.randn(8, S, 768).astype(np.float32),
        "segment_mask": (rng.rand(8, S) < 0.8).astype(np.float32),
    }
    params = jax.jit(lambda k, b: model.init(
        k, b["frame_feats"], b["frame_mask"], b["segment_feats"],
        b["segment_mask"], deterministic=True))(jax.random.PRNGKey(0), exb)

    seg_feats = rng.randn(n_tracks, S, 768).astype(np.float32)
    seg_masks = (rng.rand(n_tracks, S) < 0.8).astype(np.float32)
    ids = [f"m{j:05d}" for j in range(n_tracks)]

    t0 = time.perf_counter()
    index = build_music_index(model, params, cfg, ids, seg_feats, seg_masks,
                              batch_size=512)
    results["index_build_s"] = round(time.perf_counter() - t0, 2)

    engine = RetrievalEngine(model, params, cfg, index, sim_block_size=512)

    for b in (1, 8, 32):
        feats = rng.randn(b, F, 512).astype(np.float32)
        mask = np.ones((b, F), np.float32)
        for _ in range(3):                                   # warm-up/compile
            engine.query(feats, mask, top_k=top_k)
        lat = []
        for _ in range(10):
            t0 = time.perf_counter()
            engine.query(feats, mask, top_k=top_k)
            lat.append(time.perf_counter() - t0)
        p50 = sorted(lat)[len(lat) // 2]
        results[f"query_b{b}_p50_ms"] = round(p50 * 1e3, 1)
        results[f"query_b{b}_qps"] = round(b / p50, 1)

    # concurrent single-video clients through the HTTP front's
    # micro-batcher (serve/server.py): dispatch-bound queries coalesce
    # into few device dispatches, so sustained qps under load should
    # approach the B=32 batched number, not the B=1 one
    import threading

    from mgsv_tpu.serve.server import MicroBatcher

    batcher = MicroBatcher(engine, max_batch=32, max_wait_ms=3.0)
    n_req, n_workers = 256, 32
    reqs = [(rng.randn(1, F, 512).astype(np.float32),
             np.ones((1, F), np.float32)) for _ in range(n_workers)]
    # pre-compile EVERY bucket the coalescer can produce (the serve CLI's
    # default warmup) — otherwise the measurement pays first-touch program
    # loads for ragged buckets (2/4/16) instead of steady-state latency
    engine.warmup(top_k=top_k)
    batcher.query(*reqs[0], top_k=top_k)                 # warm the path
    done = threading.Semaphore(0)
    counter = {"left": n_req}
    lock = threading.Lock()

    def worker(i):
        while True:
            with lock:
                if counter["left"] <= 0:
                    break
                counter["left"] -= 1
            batcher.query(*reqs[i], top_k=top_k)
        done.release()

    d0 = batcher.dispatches
    t0 = time.perf_counter()
    for i in range(n_workers):
        threading.Thread(target=worker, args=(i,), daemon=True).start()
    for _ in range(n_workers):
        done.acquire()
    dt = time.perf_counter() - t0
    results["concurrent_clients"] = n_workers
    results["concurrent_qps"] = round(n_req / dt, 1)
    results["concurrent_dispatches"] = batcher.dispatches - d0

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
