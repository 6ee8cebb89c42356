"""Index CLI: build a music index from a feature store + checkpoint, query
it, or serve it over HTTP/JSON.

    # build
    python -m mgsv_tpu.cli.index build --ckpt best_r1 --run-dir runs/made \
        --music-store features/packed/music_store --out index.npz

    # query with a video from a store (sanity / demo path)
    python -m mgsv_tpu.cli.index query --ckpt best_r1 --run-dir runs/made \
        --index index.npz --video-store features/packed/video_store \
        --video-id 113722188340 --top-k 5

    # serve the index over HTTP (GET /healthz, POST /query)
    python -m mgsv_tpu.cli.index serve --ckpt best_r1 --run-dir runs/made \
        --index index.npz --port 8008
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import jax
import numpy as np

from mgsv_tpu.cli.train import parse_overrides
from mgsv_tpu.config import Config


def _load_params(args, cfg, example):
    from mgsv_tpu.cli.evaluate import _load_params as load
    return load(args.ckpt, args.run_dir or ".", cfg, example)


def main(argv=None):
    from mgsv_tpu.core.cache import enable as _enable_cache
    _enable_cache()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    argv = argv if argv is not None else sys.argv[1:]
    parser = argparse.ArgumentParser("mgsv-tpu-index")
    parser.add_argument("command", choices=["build", "query", "serve"])
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--run-dir", default=None)
    parser.add_argument("--music-store", default=None)
    parser.add_argument("--video-store", default=None)
    parser.add_argument("--index", default="index.npz")
    parser.add_argument("--out", default="index.npz")
    parser.add_argument("--video-id", default=None)
    parser.add_argument("--top-k", type=int, default=5)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8008)
    parser.add_argument(
        "--index-dtype", default="float32", choices=["float32", "bfloat16"],
        help="query/serve: HBM dtype of the resident token store — "
             "bfloat16 halves catalog memory (engine docstring)")
    parser.add_argument(
        "--warmup", default="1,2,4,8,16,32",
        help="serve: comma-separated batch buckets to pre-compile before "
             "accepting traffic ('' disables).  The default covers every "
             "power-of-two bucket the micro-batcher can produce up to its "
             "max_batch=32, so no client burst pays a compile; trim the "
             "list to start faster at the cost of cold buckets")
    known, rest = parser.parse_known_args(argv)
    _, overrides = parse_overrides(rest)
    cfg = Config.from_overrides(overrides)

    from mgsv_tpu.data.feature_store import PackedFeatureStore
    from mgsv_tpu.models.made import MaDe
    from mgsv_tpu.serve.engine import MusicIndex, RetrievalEngine, build_music_index

    model = MaDe(cfg)
    params = _load_params(known, cfg, None)

    if known.command == "build":
        store = PackedFeatureStore(known.music_store)
        rows = np.arange(len(store))
        index = build_music_index(
            model, params, cfg, store.ids,
            store.gather("feats", rows), store.gather("mask", rows))
        index.save(known.out)
        print(json.dumps({"tracks": len(index.music_ids), "path": known.out}))
        return

    index = MusicIndex.load(known.index)
    engine = RetrievalEngine(model, params, cfg, index,
                             index_dtype=known.index_dtype)

    if known.command == "serve":
        from mgsv_tpu.serve.server import RetrievalServer
        if known.warmup:
            sizes = [int(x) for x in known.warmup.split(",") if x]
            engine.warmup(batch_sizes=sizes, top_k=known.top_k)
        RetrievalServer(engine, host=known.host, port=known.port,
                        model_name=cfg.train.name).serve_forever()
        return

    store = PackedFeatureStore(known.video_store)
    vid = known.video_id or store.ids[0]
    row = store.rows([vid])
    results = engine.query(store.gather("feats", row),
                           store.gather("mask", row), top_k=known.top_k)
    print(json.dumps({"video_id": vid, **results[0]}, indent=2))


if __name__ == "__main__":
    main()
