#!/usr/bin/env python3
"""End-to-end serving throughput: concurrent /knn clients against the HTTP
runtime at 3M scale on the real chip.

The reference's serving layer is Postgres itself (concurrent backends, one
process per connection, SPI per query). This measures the standalone
equivalent (`postgres_word2vec_tpu.server`): a fleet of single-query HTTP
clients whose requests the server coalesces into one device batch per
~window (micro-batching), which is how a k-NN service actually gets TPU
batch throughput without clients changing their request shape.

Usage: python evaluation/serving_bench.py [--n 3072000] [--clients 64]
       [--seconds 20] [--out reports/serving_3M.json]
"""

from __future__ import annotations

import argparse
import http.client
import json
import multiprocessing as mp
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgres_word2vec_tpu.utils.config import apply_platform_from_env

apply_platform_from_env()

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(
                      os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from postgres_word2vec_tpu.evaluation.benchutil import log  # noqa: E402


def post(port, path, payload, timeout=60):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3_072_000)
    ap.add_argument("--d", type=int, default=300)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--max-batch", type=int, default=128)
    ap.add_argument("--window-ms", type=float, default=2.0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "reports",
        "serving_3M.json"))
    args = ap.parse_args()

    from postgres_word2vec_tpu import Freddy, VectorStore
    from postgres_word2vec_tpu.evaluation import synth
    from postgres_word2vec_tpu.server import QueryServer

    log(f"serving_bench: N={args.n} clients={args.clients} "
        f"devices={jax.devices()}")
    t0 = time.perf_counter()
    V = synth.generate_wordlike(jax.random.PRNGKey(0), args.n, args.d)
    words = [f"w{i}" for i in range(args.n)]
    store = VectorStore.from_arrays(words, V)
    # exact-only engine: /knn's default dispatch is k_nearest_neighbour.
    eng = Freddy.build(store, with_pq=False, with_ivfadc=False,
                       with_ivpq=False, exact_dtype="bfloat16",
                       exact_approx=True)
    log(f"engine up in {time.perf_counter() - t0:.1f}s")

    srv = QueryServer(eng, port=0, max_batch=args.max_batch,
                      batch_window_ms=args.window_ms)
    srv.start()
    log(f"server on :{srv.port}")

    # warm every batch shape the micro-batcher can produce (it pads
    # coalesced batches to powers of two, so this is log2(max_batch)+1
    # programs); cold compiles at 3M take tens of seconds each on the
    # tunneled chip and would otherwise poison the measured window.
    t0 = time.perf_counter()
    srv.warmup(k=args.k)
    post(srv.port, "/knn", {"query": "w0", "k": args.k}, timeout=300)
    log(f"warm in {time.perf_counter() - t0:.1f}s")

    # Clients are separate PROCESSES with persistent keep-alive
    # connections: in-process client threads share the server's GIL and a
    # fresh TCP connection per request measures socket churn, not the
    # engine (observed: 13 QPS from harness overhead alone).
    def client_proc(cid, port, n, k, seconds, q):
        r = np.random.default_rng(cid)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        my_lat = []
        err = 0
        stop_t = time.time() + seconds
        while time.time() < stop_t:
            w = f"w{int(r.integers(0, n))}"
            body = json.dumps({"query": w, "k": k})
            t0 = time.perf_counter()
            try:
                conn.request("POST", "/knn", body,
                             {"Content-Type": "application/json"})
                resp = conn.getresponse()
                resp.read()
                if resp.status == 200:
                    my_lat.append(time.perf_counter() - t0)
                else:
                    err += 1
            except Exception:
                err += 1
                conn.close()
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=60)
        q.put((my_lat, err))

    ctx = mp.get_context("fork")
    outq = ctx.Queue()
    procs = [ctx.Process(target=client_proc,
                         args=(i, srv.port, args.n, args.k, args.seconds,
                               outq))
             for i in range(args.clients)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    lat: list[float] = []
    errors = [0]
    for _ in procs:
        try:
            my_lat, err = outq.get(timeout=args.seconds + 180)
        except Exception:
            errors[0] += 1   # a client died without reporting
            continue
        lat.extend(my_lat)
        errors[0] += err
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0

    lat_ms = np.asarray(sorted(lat)) * 1e3
    health = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/health", timeout=10).read())
    srv.stop()

    results = {
        "n": args.n, "clients": args.clients, "seconds": args.seconds,
        "k": args.k, "max_batch": args.max_batch,
        "window_ms": args.window_ms,
        "completed": int(lat_ms.size), "errors": errors[0],
        "qps": lat_ms.size / wall,
        "latency_ms": {
            "p50": float(np.percentile(lat_ms, 50)) if lat_ms.size else None,
            "p95": float(np.percentile(lat_ms, 95)) if lat_ms.size else None,
            "p99": float(np.percentile(lat_ms, 99)) if lat_ms.size else None,
        },
        "health": health,
        "note": "concurrent single-query /knn clients; server coalesces "
                "into device batches (micro-batching). Tunneled chip: "
                "~30 ms RTT floors single-call latency.",
    }
    p50, p95 = (results["latency_ms"][x] for x in ("p50", "p95"))
    log(f"qps={results['qps']:.0f} "
        f"p50={p50 if p50 is None else round(p50, 1)}ms "
        f"p95={p95 if p95 is None else round(p95, 1)}ms errors={errors[0]}")
    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
