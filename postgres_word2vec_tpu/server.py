"""Query server — the serving runtime around the engine.

The reference's serving story is Postgres itself: clients connect and issue
SQL against the extension's functions. This module is the equivalent
standalone runtime: a threaded HTTP/JSON server exposing every query family
with the same names and parameter semantics, so a FREDDY deployment's
client-side SQL maps 1:1 onto request paths.

Endpoints (POST JSON unless noted):

    /knn          {"query": word|vector, "k": int}
    /knn_in       {"query": …, "k": int, "targets": [words|ids]}
    /knn_batch    {"queries": [words], "k": int}
    /knn_join     {"queries": [words], "k": int, "targets": [words|ids]}
    /analogy      {"w1": w, "w2": w, "w3": w}
    /analogy_in   {…, "targets": [words]}
    /groups       {"tokens": [...], "group_tokens": [...]}
    /cluster      {"tokens": [...], "k": int}
    /tokenize     {"text": "..."} (+"raw": true)
    /insert       {"terms": [...]}
    /statistics   {"name": "...", "domain": [words]}
    /config       {"set_pvf": 20, "set_alpha": 3, …}  (any setter)
    /health       GET — engine + device status

Device execution is serialized with a lock (one TPU computation at a time;
the batched kernels are the throughput path — clients should batch).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from postgres_word2vec_tpu.api import Freddy


class UnknownEndpoint(KeyError):
    """Routing failure (404) — distinct from domain KeyErrors (400)."""


class QueryServer:
    """Wraps an engine with a threaded HTTP server."""

    def __init__(self, engine: Freddy, host: str = "127.0.0.1",
                 port: int = 8765):
        self.engine = engine
        self._lock = threading.Lock()
        self._requests = 0
        self._started = time.time()
        handler = self._make_handler()
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------- control
    def start(self) -> "QueryServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    # ------------------------------------------------------------ dispatch
    def _handle(self, path: str, body: dict):
        eng = self.engine
        with self._lock:
            self._requests += 1
            if path == "/knn":
                q = body.get("query")
                q = q if isinstance(q, str) else np.asarray(q, np.float32)
                return eng.knn(q, int(body.get("k", 5)))
            if path == "/knn_in":
                q = body.get("query")
                q = q if isinstance(q, str) else np.asarray(q, np.float32)
                return eng.knn_in(q, int(body.get("k", 5)), body["targets"])
            if path == "/knn_batch":
                return eng.knn_batch(body["queries"], int(body.get("k", 5)))
            if path == "/knn_join":
                return eng.knn_join(body["queries"], int(body.get("k", 5)),
                                    body["targets"])
            if path == "/analogy":
                return eng.analogy(body["w1"], body["w2"], body["w3"])
            if path == "/analogy_in":
                return eng.analogy_in(body["w1"], body["w2"], body["w3"],
                                      body["targets"])
            if path == "/groups":
                return eng.groups(body["tokens"], body["group_tokens"])
            if path == "/cluster":
                return eng.cluster(body["tokens"], int(body.get("k", 5)))
            if path == "/tokenize":
                fn = eng.tokenize_raw if body.get("raw") else eng.tokenize
                v = fn(body["text"])
                return None if v is None else v.tolist()
            if path == "/insert":
                return {"inserted": eng.insert_batch(body["terms"])}
            if path == "/statistics":
                eng.create_statistics(body["name"], body["domain"])
                return {"created": body["name"]}
            if path == "/config":
                applied = {}
                for key, val in body.items():
                    if not key.startswith("set_") or not hasattr(eng, key):
                        raise UnknownEndpoint(f"unknown setting {key!r}")
                    getattr(eng, key)(val)
                    applied[key] = val
                return {"applied": applied}
            raise UnknownEndpoint(f"unknown endpoint {path}")

    def _health(self) -> dict:
        import jax

        return {
            "status": "ok",
            "vocab": self.engine.store.size,
            "dim": self.engine.store.dim,
            "indexes": {
                "pq": self.engine.pq is not None,
                "ivfadc": self.engine.ivfadc is not None,
                "ivpq": self.engine.ivpq is not None,
            },
            "device": str(jax.devices()[0]),
            "requests": self._requests,
            "uptime_s": round(time.time() - self._started, 1),
        }

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # silence default stderr log
                pass

            def _send(self, code: int, payload) -> None:
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/health":
                    self._send(200, server._health())
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(length) or b"{}")
                    result = server._handle(self.path, body)
                    self._send(200, {"result": result})
                except UnknownEndpoint as e:
                    self._send(404, {"error": str(e)})
                except Exception as e:  # noqa: BLE001 — serve errors as 400
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})

        return Handler


def main() -> None:
    """CLI: ``python -m postgres_word2vec_tpu.server <engine_dir> [port]``
    — serve a previously saved engine (see ``Freddy.save``)."""
    import sys

    from postgres_word2vec_tpu.utils.config import apply_platform_from_env
    apply_platform_from_env()
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    engine = Freddy.load(sys.argv[1])
    engine.warmup()
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8765
    server = QueryServer(engine, port=port)
    print(f"serving {engine.store.size} vectors on :{server.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
