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
    /knn_join     {"queries": [words], "k": int,
                   "targets": [words|ids] | "registered-name"}
    /prepare_targets {"name": "...", "targets": [words|ids]} — register a
                   persistent-tile target set for repeated /knn_join calls
    /analogy      {"w1": w, "w2": w, "w3": w}
    /analogy_in   {…, "targets": [words]}
    /groups       {"tokens": [...], "group_tokens": [...]}
    /cluster      {"tokens": [...], "k": int}
    /tokenize     {"text": "..."} (+"raw": true)
    /insert       {"terms": [...]}
    /statistics   {"name": "...", "domain": [words]}
    /config       {"set_pvf": 20, "set_alpha": 3, …}  (any setter)
    /health       GET — engine + device status

Device execution is serialized with a lock (one TPU computation at a time).
Batch-shaped endpoints are the throughput path; concurrent single-query
``/knn`` requests are additionally MICRO-BATCHED: a coalescing queue gathers
requests for up to ``batch_window_ms`` (default 2 ms) and runs them as one
device call on the dispatched index family, so a fleet of single-query
clients gets batched-kernel throughput without changing their requests.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from postgres_word2vec_tpu.api import Freddy

#: lazily-built jitted row gather for the serve path (one program, cached)
_GATHER_ROWS = None


class UnknownEndpoint(KeyError):
    """Routing failure (404) — distinct from domain KeyErrors (400)."""


class _MicroBatcher:
    """Coalesce concurrent single-item requests into one batched call.

    ``fn(items) -> results`` runs on a worker thread; ``submit(item)``
    blocks until the item's result is ready. The worker drains whatever is
    queued after the first item has waited ``window_ms`` (or immediately at
    ``max_batch``).
    """

    def __init__(self, fn, *, max_batch: int = 64, window_ms: float = 2.0):
        self._fn = fn
        self._max_batch = max_batch
        self._window = window_ms / 1e3
        self._cv = threading.Condition()
        self._queue: list[dict] = []
        self.stats_lock = threading.Lock()   # guards the counters below
        self.batched_calls = 0
        self.max_coalesced = 0
        self.busy_s = 0.0          # wall time spent inside fn (device path)
        self.items_done = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, item):
        slot = {"item": item, "event": threading.Event(), "result": None,
                "error": None}
        with self._cv:
            self._queue.append(slot)
            self._cv.notify()
        slot["event"].wait()
        if slot["error"] is not None:
            raise slot["error"]
        return slot["result"]

    def _run(self):
        while True:
            with self._cv:
                while not self._queue:
                    self._cv.wait()
                deadline = time.monotonic() + self._window
                while (len(self._queue) < self._max_batch):
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
                batch = self._queue[:self._max_batch]
                del self._queue[:len(batch)]
            t0 = time.perf_counter()
            try:
                results = self._fn([s["item"] for s in batch])
                for s, r in zip(batch, results):
                    # fn may return an Exception per slot (item-level
                    # failure — e.g. one unknown word must not 400 every
                    # request coalesced into the same batch).
                    if isinstance(r, Exception):
                        s["error"] = r
                    else:
                        s["result"] = r
            except Exception as e:  # noqa: BLE001 — batch-level failure
                for s in batch:
                    s["error"] = e
            with self.stats_lock:
                self.busy_s += time.perf_counter() - t0
                self.items_done += len(batch)
                self.batched_calls += 1
                self.max_coalesced = max(self.max_coalesced, len(batch))
            for s in batch:
                s["event"].set()


class EngineRunner:
    """Engine-execution core shared by the threaded and async servers:
    query resolution, pow2-padded gathers, the coalesced batch runners,
    and the device lock. Front ends differ only in how they parse HTTP
    and coalesce requests."""

    def __init__(self, engine: Freddy):
        self.engine = engine
        # "search" = jitted dispatch (enqueue, host time); "fetch" = the
        # blocking device_get in the completion phase (device + tunnel RTT)
        self.stage_s = {"resolve": 0.0, "gather": 0.0, "search": 0.0,
                        "fetch": 0.0, "format": 0.0}
        self._lock = threading.Lock()
        # device-resident (tids, tmask) per /knn_in target set: the serving
        # pattern is many clients querying the SAME restricted domain, and
        # re-uploading the id set every coalesced batch was one blocking
        # tunnel transfer per batch. Bounded FIFO (drop-oldest) — target
        # sets are client-controlled input.
        self._tid_cache: dict[tuple, tuple] = {}
        self._tid_cache_max = 32

    # -------------------------------------------------- knn micro-batching
    def _resolve_queries(self, entries, out: list
                         ) -> tuple[dict, dict]:
        """Resolve (j, query) entries HOST-side only: word → vocab id, raw
        vector → normalized numpy row (dim-checked). Never materialize a
        device row per item — on a tunneled chip that is one ~30 ms round
        trip each, which serialized an 80-item coalesced batch into
        seconds. A bad item fails only its own ``out`` slot."""
        eng = self.engine
        wid: dict[int, int] = {}
        raw: dict[int, np.ndarray] = {}
        for j, query in entries:
            try:
                if isinstance(query, str):
                    wid[j] = eng.store.get_id(query)
                else:
                    v = np.asarray(query, np.float32).reshape(-1)
                    if v.shape[0] != eng.store.dim:
                        raise ValueError(
                            f"query dim {v.shape[0]} != store dim "
                            f"{eng.store.dim}")
                    n = float(np.linalg.norm(v))
                    raw[j] = v / n if n > 0 else v
            except Exception as e:  # noqa: BLE001 — isolate per item
                out[j] = e
        return wid, raw

    def _gather_group(self, idxs: list[int], wid: dict, raw: dict):
        """One pow2-padded query matrix for a coalesced group. Padding to
        the next power of two bounds the compiled-program count at
        log2(max_batch)+1 — coalescing produces every batch size, and each
        distinct shape is a fresh XLA compile (seconds each on a cold
        server).

        Word-id groups gather rows ON DEVICE: a jitted dispatch is async
        (~0.2 ms host time measured on the tunnel, chaining into the search
        dispatch for free — only a host FETCH pays the ~40 ms round trip,
        scratch/tunnel_rtt_probe.py). Raw-vector groups stack their rows on
        host and ship the small (B, d) matrix as a dispatch operand
        (~1.7 ms) — the groups are split by the caller precisely so neither
        path ever needs the old fetch-mutate-reupload merge."""
        b = len(idxs)
        bp = 1 << (b - 1).bit_length()
        if idxs[0] in raw:   # raw-vector group (host rows, dim-checked)
            rows = [raw[j] for j in idxs]
            rows.extend([rows[0]] * (bp - b))
            return np.ascontiguousarray(np.stack(rows)), b
        pad_j = idxs[0]
        ids = np.asarray([wid.get(j, 0) for j in idxs]
                         + [wid.get(pad_j, 0)] * (bp - b), np.int32)
        global _GATHER_ROWS
        if _GATHER_ROWS is None:
            import jax
            import jax.numpy as jnp

            _GATHER_ROWS = jax.jit(
                lambda table, ids_: jnp.take(table, ids_, axis=0))
        q = _GATHER_ROWS(self.engine.store.vectors_norm, ids)
        return q, b

    def dispatch_knn_batch(self, items: list[tuple]):
        """Enqueue one coalesced batch of (query, k) items on the device
        and return an opaque pending state for
        :meth:`complete_knn_batch`. Dispatch is async (jax returns
        unmaterialized device arrays), so this returns in host time — the
        device + tunnel round trip is paid by the completion phase, which
        a pipelined front end runs on a separate thread while the NEXT
        batch dispatches here (see ``server_async._LoopBatcher``)."""
        eng = self.engine
        tmr = self.stage_s
        t0 = time.perf_counter()
        out: list = [None] * len(items)
        wid, raw = self._resolve_queries(
            [(j, query) for j, (query, _k) in enumerate(items)], out)
        # raw-vector queries group apart from word queries: word groups
        # gather on device, raw groups ship host rows (see _gather_group)
        groups: dict[tuple, list[int]] = {}
        for j, (_query, k) in enumerate(items):
            if out[j] is None:
                groups.setdefault((int(k), j in raw), []).append(j)
        tmr["resolve"] += time.perf_counter() - t0
        pending = []
        for (k, _is_raw), idxs in groups.items():
            # The lock covers only the enqueue (gather + search dispatch —
            # jax dispatch is async); the materializing device_get waits in
            # complete_knn_batch, so the next coalesced batch enqueues
            # while this one executes on device. jax serializes queued
            # computations, so ordering is preserved; the lock prevents
            # interleaved multi-group enqueues only.
            with self._lock:
                t0 = time.perf_counter()
                q, b = self._gather_group(idxs, wid, raw)
                tmr["gather"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                d, i = eng.knn_matrix(q, k)
                tmr["search"] += time.perf_counter() - t0
            pending.append((idxs, b, d, i))
        return out, pending

    def complete_knn_batch(self, state) -> list:
        """Materialize + format a batch dispatched by
        :meth:`dispatch_knn_batch`. Blocks until the device results land
        on host; safe to run on a different thread than the dispatcher."""
        eng = self.engine
        tmr = self.stage_s
        out, pending = state
        for idxs, b, d, i in pending:
            t0 = time.perf_counter()
            # materialize the PADDED arrays in ONE device_get and slice on
            # host: an eager device slice (d[:b]) rebuilds a jaxpr per call
            # — pure-Python work that collapses under the handler threads'
            # GIL contention (measured ~0.7 s/call at 128 concurrent
            # clients vs ~1 ms for the host slice) — and two sequential
            # np.asarray fetches paid two tunnel round trips per batch.
            import jax

            d_np, i_np = jax.device_get((d, i))
            tmr["fetch"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            rows = eng._format_knn(d_np[:b], i_np[:b])
            tmr["format"] += time.perf_counter() - t0
            for j, r in zip(idxs, rows):
                out[j] = r
        return out

    def _run_knn_batch(self, items: list[tuple]) -> list:
        """One device call for a coalesced batch of (query, k) items —
        dispatch + completion back to back (the threaded front end's
        path; the async front end pipelines the two phases).

        Queries group by k (usually one group); each group stacks into a
        (B, d) matrix and runs through ``Freddy.knn_matrix`` — the engine's
        own dispatched batch path (incl. mesh-sharded routing) — then
        formats per query. A bad item (unknown word, malformed vector)
        fails only its own slot, not the whole coalesced batch.
        """
        return self.complete_knn_batch(self.dispatch_knn_batch(items))

    # ------------------------------------------------ knn_in micro-batching
    def dispatch_knn_in_batch(self, items: list[tuple]):
        """Dispatch phase of the coalesced /knn_in path: items are
        (query, k, targets-tuple). Requests group by (k, target set) — the
        serving pattern is many clients querying the SAME restricted
        domain (the reference's statistics-table use case) — and each
        group enqueues as ONE batched in-set device call through
        ``Freddy.knn_in_matrix``. Query batches pad to powers of two and
        target sets to powers of two (mask-padded on HOST — eager
        ``jnp.pad`` per batch is the jaxpr-rebuild pathology, see
        CLAUDE.md), so compiled program count stays logarithmic. Dispatch
        impls without a matrix core (IVPQ) fall back to per-item calls
        (run to completion here — they cannot be split).
        Returns pending state for :meth:`complete_knn_in_batch`.
        """
        import jax.numpy as jnp

        from postgres_word2vec_tpu.api import NoMatrixCore

        eng = self.engine
        out: list = [None] * len(items)
        wid, raw = self._resolve_queries(
            [(j, query) for j, (query, _k, _tgt) in enumerate(items)], out)
        groups: dict[tuple, list[int]] = {}
        for j, (_query, k, tgt) in enumerate(items):
            if out[j] is None:
                # raw-vector queries group apart (see _gather_group)
                groups.setdefault((int(k), tgt, j in raw), []).append(j)

        # impls without a batched matrix core (e.g. IVPQ's data-dependent
        # rounds) go straight to per-item calls — resolving + padding +
        # device-gathering the batch first just to have knn_in_matrix raise
        # wasted a ~30 ms device gather per batch and re-resolved targets
        # per item afterwards.
        has_core = eng.dispatch["knn_in"] in eng._KNN_IN_CORES

        def _per_item(idxs, k, tgt):
            with self._lock:
                for j in idxs:
                    try:
                        out[j] = eng.knn_in(items[j][0], k, list(tgt))
                    except Exception as e:  # noqa: BLE001
                        out[j] = e

        pending = []
        for (k, tgt, _is_raw), idxs in groups.items():
            if not has_core:
                _per_item(idxs, k, tgt)
                continue
            try:
                # resolve + pow2-pad the target axis on HOST; uploaded ONCE
                # per distinct target set (cached device-resident — the
                # serving pattern is many batches against the same domain).
                cached = self._tid_cache.get(tgt)
                if cached is None:
                    tid_list = (eng.store.get_ids(list(tgt), strict=False)
                                if isinstance(tgt[0], str)
                                else [int(t) for t in tgt])
                    t = len(tid_list)
                    tp = 1 << (t - 1).bit_length()
                    tids_np = np.zeros((tp,), np.int32)
                    tids_np[:t] = tid_list
                    tmask_np = np.zeros((tp,), bool)
                    tmask_np[:t] = True
                    cached = (jnp.asarray(tids_np), jnp.asarray(tmask_np))
                    if len(self._tid_cache) >= self._tid_cache_max:
                        self._tid_cache.pop(next(iter(self._tid_cache)))
                    self._tid_cache[tgt] = cached
                tids, tmask = cached
                with self._lock:
                    q, b = self._gather_group(idxs, wid, raw)
                    d, i = eng.knn_in_matrix(q, k, tids, tmask)
                pending.append((idxs, b, d, i))
            except NoMatrixCore:
                # no matrix core for the dispatched impl → per-item calls.
                # Precise sentinel: a bare ``except KeyError`` used to
                # swallow unrelated internal KeyErrors (e.g. incomplete
                # mesh ``_shard`` state) and mask real bugs as fallbacks.
                _per_item(idxs, k, tgt)
            except Exception as e:  # noqa: BLE001 — group-level failure
                for j in idxs:
                    out[j] = e
        return out, pending

    def complete_knn_in_batch(self, state) -> list:
        """Materialize + format groups dispatched by
        :meth:`dispatch_knn_in_batch`; a failing group fails only its own
        slots."""
        eng = self.engine
        out, pending = state
        for idxs, b, d, i in pending:
            try:
                import jax

                d_np, i_np = jax.device_get((d, i))  # one fetch, no lock
                rows = eng._format_knn(d_np[:b], i_np[:b])
                for j, r in zip(idxs, rows):
                    out[j] = r
            except Exception as e:  # noqa: BLE001 — group-level failure
                for j in idxs:
                    out[j] = e
        return out

    def _run_knn_in_batch(self, items: list[tuple]) -> list:
        """Dispatch + completion back to back (threaded front end; the
        async front end pipelines the phases)."""
        return self.complete_knn_in_batch(self.dispatch_knn_in_batch(items))

class QueryServer:
    """Wraps an engine with a threaded HTTP server."""

    def __init__(self, engine: Freddy, host: str = "127.0.0.1",
                 port: int = 8765, batch_window_ms: float = 2.0,
                 max_batch: int = 64):
        self.engine = engine
        self.runner = EngineRunner(engine)
        self.stage_s = self.runner.stage_s
        self._lock = self.runner._lock
        self._requests = 0
        self._started = time.time()
        self._knn_batcher = _MicroBatcher(self.runner._run_knn_batch,
                                          max_batch=max_batch,
                                          window_ms=batch_window_ms)
        self._knn_in_batcher = _MicroBatcher(self.runner._run_knn_in_batch,
                                             max_batch=max_batch,
                                             window_ms=batch_window_ms)
        handler = self._make_handler()
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------- control
    DEFAULT_K = 5   # the /knn handler's default k

    def warmup(self, k: int | None = None) -> None:
        """Precompile the /knn micro-batch path for every shape it can
        produce (batches pad to powers of two, so log2(max_batch)+1
        programs: gather + search + format). Without this, each new
        coalesced size compiles DURING live traffic — tens of seconds per
        shape on a tunneled chip. ``k`` is a static jit argument: warm
        every k your clients use (default: the handler default)."""
        w0 = self.engine.store.words[0]
        kk = self.DEFAULT_K if k is None else k
        # cover every power-of-two pad target, incl. the rounded-up max
        # when max_batch itself is not a power of two.
        top = 1 << (self._knn_batcher._max_batch - 1).bit_length()
        b = 1
        while b <= top:
            self.runner._run_knn_batch([(w0, kk)] * b)
            b *= 2

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
        if path == "/knn":
            # micro-batched: coalesces concurrent single-query requests
            # into one device call (takes the lock inside the batcher).
            with self._lock:
                self._requests += 1
            q = body.get("query")
            q = q if isinstance(q, str) else np.asarray(q, np.float32)
            return self._knn_batcher.submit(
                (q, int(body.get("k", self.DEFAULT_K))))
        if path == "/knn_in":
            # micro-batched like /knn: coalesces concurrent requests,
            # grouped by (k, target set) inside the batcher.
            with self._lock:
                self._requests += 1
            q = body.get("query")
            q = q if isinstance(q, str) else np.asarray(q, np.float32)
            return self._knn_in_batcher.submit(
                (q, int(body.get("k", 5)), tuple(body["targets"])))
        with self._lock:
            self._requests += 1
            if path == "/knn_batch":
                return eng.knn_batch(body["queries"], int(body.get("k", 5)))
            if path == "/knn_join":
                # "targets" may be a list OR the name of a target set
                # registered via /prepare_targets (persistent-tile reuse).
                return eng.knn_join(body["queries"], int(body.get("k", 5)),
                                    body["targets"])
            if path == "/prepare_targets":
                ph = eng.prepare_targets(body["targets"],
                                         name=body["name"])
                return {"prepared": body["name"], "size": ph.size,
                        "build_s": round(ph.build_s, 4)}
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

    def _knn_stats(self) -> dict:
        """Snapshot BOTH micro-batchers' counters, each under its own
        stats lock, so /health never reads a half-updated (calls, items,
        busy) triple. ``stage_s`` is mutated by the batcher workers partly
        outside ``self._lock`` (the double-buffered materialize/format
        steps run unlocked by design); reading it lock-free is a
        point-in-time approximation, fine for a health probe."""
        out = {"knn_stage_s": {k: round(v, 3)
                               for k, v in self.stage_s.items()}}
        for name, b in (("knn", self._knn_batcher),
                        ("knn_in", self._knn_in_batcher)):
            with b.stats_lock:
                out[f"{name}_batched_calls"] = b.batched_calls
                out[f"{name}_busy_s"] = round(b.busy_s, 3)
                out[f"{name}_items_done"] = b.items_done
                out[f"{name}_max_coalesced"] = b.max_coalesced
        return out

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
            **self._knn_stats(),
            "uptime_s": round(time.time() - self._started, 1),
        }

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1: keep-alive connections. The 1.0 default closes the
            # socket after every response, forcing clients into a
            # reconnect-per-request cycle (measured: dominated serving
            # latency and surfaced as RemoteDisconnected errors under
            # load). Content-Length is always set in _send, so persistent
            # connections are safe.
            protocol_version = "HTTP/1.1"

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
    server.warmup()   # precompile every /knn micro-batch shape
    print(f"serving {engine.store.size} vectors on :{server.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
