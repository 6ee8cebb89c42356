"""HTTP/JSON serving front over the RetrievalEngine.

Minimal stdlib RPC surface (no extra dependencies — the environment bakes
no web framework) exposing the production capability the engine provides:

    GET  /healthz   -> {"status": "ok", "index_size": M, "model": ...}
    POST /query     -> body {"frame_feats": [[...frame vectors...] per video],
                             "frame_mask":  [[...0/1 per frame...]],
                             "top_k": 5}
                       reply: the engine's per-query result dicts
                       (ranked music_ids, retrieval_scores, moments in
                       seconds, moment_scores)

Queries are served from a single background lock — device dispatch is
serialized (one jitted program per (B, top_k) shape), while request
parsing/serialization happens per-connection in the threaded HTTP server.

The reference has no serving story (its eval loop ranks a closed split);
this is the deployment surface SURVEY.md §0's task description implies.
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

logger = logging.getLogger("mgsv_tpu")


def make_handler(engine, model_name: str):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through our logger
            logger.debug("serve: " + fmt, *args)

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": "unknown path"})
            self._reply(200, {
                "status": "ok",
                "index_size": len(engine.index.music_ids),
                "model": model_name,
            })

        def do_POST(self):
            if self.path != "/query":
                return self._reply(404, {"error": "unknown path"})
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                frame_feats = np.asarray(req["frame_feats"], np.float32)
                if frame_feats.ndim == 2:      # single video convenience
                    frame_feats = frame_feats[None]
                frame_mask = np.asarray(
                    req.get("frame_mask",
                            np.ones(frame_feats.shape[:2])), np.float32)
                if frame_mask.ndim == 1:
                    frame_mask = frame_mask[None]
                top_k = int(req.get("top_k", 5))
                top_k = max(1, min(top_k, len(engine.index.music_ids)))
            except (KeyError, TypeError, ValueError,
                    json.JSONDecodeError) as e:
                return self._reply(400, {"error": f"bad request: {e}"})
            try:
                with lock:
                    results = engine.query(frame_feats, frame_mask,
                                           top_k=top_k)
            except Exception as e:  # surface engine errors as 500s
                logger.exception("query failed")
                return self._reply(500, {"error": str(e)})
            self._reply(200, {"results": results})

    return Handler


class RetrievalServer:
    """Threaded HTTP server wrapper; `serve_forever` blocks, `start`
    runs it on a daemon thread (tests/embedding)."""

    def __init__(self, engine, host: str = "0.0.0.0", port: int = 8008,
                 model_name: str = "made"):
        self.httpd = ThreadingHTTPServer(
            (host, port), make_handler(engine, model_name))
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> "RetrievalServer":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        logger.info("serving on :%d", self.port)
        return self

    def serve_forever(self):
        logger.info("serving on :%d", self.port)
        self.httpd.serve_forever()

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
