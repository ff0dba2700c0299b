"""Shared measurement helpers for the benchmark drivers (bench.py,
evaluation/scale_capacity.py).

Timing hazard these encode (see CLAUDE.md): on the tunneled TPU,
``block_until_ready`` does not guarantee completion — every measurement
must materialize a small result slice to host. A single small call pays
~30-70 ms of transport RTT; ``timeit_piped`` amortizes it by enqueueing
several calls and blocking once.
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np


def log(msg) -> None:
    print(msg, file=sys.stderr, flush=True)


def log_mem(tag: str) -> None:
    try:
        stats = jax.devices()[0].memory_stats() or {}
        used = stats.get("bytes_in_use", 0) / 2**30
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        log(f"[mem {tag}] in_use={used:.2f}GiB peak={peak:.2f}GiB")
    except Exception:
        pass


def materialize(out) -> None:
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf[..., :1])


def timeit(fn, *args, iters: int = 5):
    """Median wall time of ``fn(*args)`` → (seconds, last output)."""
    out = fn(*args)
    materialize(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        materialize(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def timeit_piped(fn, *args, iters: int = 8) -> float:
    """Pipelined per-call time: enqueue ``iters`` calls, block once —
    approximates pure device+queue time per call under tunnel RTT."""
    out = fn(*args)
    materialize(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    materialize(outs[-1])
    return (time.perf_counter() - t0) / iters


def recall_at_k(ids, exact_ids) -> float:
    ids = np.asarray(ids)
    exact_ids = np.asarray(exact_ids)[:, :ids.shape[1]]
    hits = sum(len(set(a.tolist()) & set(e.tolist()))
               for a, e in zip(ids, exact_ids))
    return hits / exact_ids.size
