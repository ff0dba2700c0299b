#!/usr/bin/env python3
"""Render the README benchmark table from BENCH_LOCAL_latest.json.

Reconciliation is mechanical (VERDICT r3 item 4): every number in the
README's comparison table is generated from the latest committed bench
JSON, so a stale README row can be detected (and regenerated) by diffing
this script's output against the README.

Usage: python evaluation/gen_readme_table.py [BENCH_JSON]
"""

from __future__ import annotations

import json
import os
import sys


def fmt_ms(v):
    return f"{v:.2f}" if v >= 0.1 else f"{v:.3f}"


def row(cfg, label, ref, speed, *, extra=""):
    ms = cfg.get("per_query_ms")
    r5 = cfg.get("recall5")
    parts = [f"{fmt_ms(ms)} ms/query"]
    if "batch" in cfg:
        parts.append(f"batch {cfg['batch']}")
    if r5 is not None:
        parts.append(f"recall@5 **{r5:.2f}**")
    if extra:
        parts.append(extra)
    return f"| {label} | {', '.join(parts)} | {ref} | {speed} |"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_LOCAL_latest.json")
    with open(path) as f:
        data = json.load(f)
    c = data["configs"]

    def speedup(name, ref_s, per_batch=True):
        cfg = c[name]
        ours_s = cfg["per_query_ms"] / 1e3
        return f"~{ref_s / ours_s:,.0f}×".replace(",", " ")

    print("| Operating point (3M × 300-d, one TPU chip) | This framework "
          "| FREDDY (reference, Postgres) | Speedup |")
    print("|---|---|---|---|")
    es = c["exact_single"]
    print(f"| Exact, single query | {es['per_query_ms']:.0f} ms wall "
          f"({es['per_query_ms_pipelined']:.0f} ms pipelined), recall 1.0 "
          f"| 8.79 s @ 1.00 | ~{8790 / es['per_query_ms']:.0f}× |")
    print(row(c["exact_batch"], "Exact, batch 1024",
              "10 ms/query @ 0.35 (batchwise IVFADC)",
              speedup("exact_batch", 0.010)))
    if "exact_fused" in c:
        print(row(c["exact_fused"], "Exact, fused Pallas scan (batch 1024)",
                  "10 ms/query @ 0.35", speedup("exact_fused", 0.010)))
    print(row(c["exact_int8"], "int8 exact, batch 1024", "—", "—",
              extra="6× less HBM"))
    print(row(c["pq_scan_b256"], "PQ ADC full scan (12×256, batch 256)",
              "1.06 s @ 0.38", speedup("pq_scan_b256", 1.06)))
    print(row(c["pq4bit_scan"], "4-bit PQ scan (60×16, grouped kernel)",
              "1.06 s @ 0.38", speedup("pq4bit_scan", 1.06)))
    print(row(c["pq4bit_pv_20"], "4-bit PQ + post-verify (pvf=20)",
              "1.29 s @ 0.87", speedup("pq4bit_pv_20", 1.29)))
    print(row(c["pq4bit_opq_scan"], "**OPQ × 4-bit scan (quality point)**",
              "1.06 s @ 0.38", speedup("pq4bit_opq_scan", 1.06)))
    print(row(c["pq4bit_opq_pv_20"], "OPQ × 4-bit + post-verify (pvf=20)",
              "1.29 s @ 0.87", speedup("pq4bit_opq_pv_20", 1.29)))
    print(row(c["pq_opq_scan"], "OPQ ADC full scan (12×256)",
              "1.06 s @ 0.38", speedup("pq_opq_scan", 1.06)))
    print(row(c["pq_opq_pv_20"], "PQ + post-verify (OPQ 12×256, pvf=20)",
              "1.29 s @ 0.87", speedup("pq_opq_pv_20", 1.29)))
    print(row(c["ivfadc_batch_w3"], "IVFADC batch probe (w=3)",
              "10 ms/query @ 0.35", speedup("ivfadc_batch_w3", 0.010)))
    w1 = c["ivfadc_batch_w1"]
    print(row(c["ivfadc4bit_w3"], "**IVFADC 4-bit residuals (60×16, w=3)**",
              "10 ms/query @ 0.35", speedup("ivfadc4bit_w3", 0.010),
              extra=(f"w=1: {w1['recall5']:.2f} @ "
                     f"{fmt_ms(w1['per_query_ms'])} ms")))
    print(row(c["ivfadc_pv"], "IVFADC + post-verify (pvf=20)",
              "0.26 s @ 0.65", speedup("ivfadc_pv", 0.26),
              extra=f"4-bit: **{c['ivfadc4bit_pv']['recall5']:.2f}**"))
    iv1 = c["ivfadc_single"]
    print(f"| IVFADC single query | {iv1['device_ms']:.1f} ms device "
          f"({iv1['per_query_ms']:.0f} ms wall incl. dev-tunnel RTT) "
          f"| 30 ms | ~{30 / iv1['device_ms']:.0f}× |")
    j = c["ivpq_join_pv_a200"]
    # the high-recall operating point: α=600 crosses the 0.92 bar on v3
    # data (scratch/join_alpha_probe.json); fall back to α=400 on older
    # bench JSONs that predate the a600 row.
    j6 = c.get("ivpq_join_pv_a600", {})
    tail = (f" (α=600: **{j6['recall5']:.2f} @ {j6['qps']:,.0f} QPS**)"
            if j6 else "")
    if not j6:
        j4 = c.get("ivpq_join_pv_a400", {})
        tail = f" (α=400: {j4.get('recall5', 0):.2f})" if j4 else ""
    print(f"| IVPQ kNN-join 5k×100k (method 2, α=200) | **{j['total_s']:.2f}"
          f" s total ({j['qps']:,.0f} QPS), recall@5 {j['recall5']:.2f}**"
          + tail + " | figure only | — |")

    # selectivity crossover rows: the probe vs the exact f32 in-set scan
    # at 1M and whole-store targets (the regime ivpq_search_in exists
    # for — cost ∝ selectivity, ivpq_search_in.c:355-401)
    def _hi_row(suffix, bar=0.90):
        rows = [(n, cfg) for n, cfg in c.items()
                if n.startswith("ivpq_join_pv_") and n.endswith(suffix)
                and cfg.get("recall5", 0.0) >= bar]
        if not rows:   # fall back to the best recall available
            rows = [(n, cfg) for n, cfg in c.items()
                    if n.startswith("ivpq_join_pv_") and n.endswith(suffix)]
            return max(rows, key=lambda kv: kv[1]["recall5"]) if rows \
                else None
        return max(rows, key=lambda kv: kv[1]["qps"])

    for suffix, label in (("_1M", "5k×1M"), ("_3M", "5k×3M (whole store)")):
        ex = c.get("join_exact_in" + suffix)
        hi = _hi_row(suffix)
        if not (ex and hi):
            continue
        hcfg = hi[1]

        def th(v):   # thousands with thin spaces, md-table safe
            return f"{v:,.0f}".replace(",", " ")

        print(f"| IVPQ kNN-join {label}, prepared targets "
              f"| **{th(hcfg['qps'])} QPS @ recall@5 {hcfg['recall5']:.2f}"
              f"** (α={hcfg.get('alpha', '?')}, pvf={hcfg.get('pvf', '?')},"
              f" ~{th(hcfg.get('scanned_rows_mean', 0))} rows scanned/q)"
              f" | exact f32 scan: {th(ex['qps'])} QPS @ 1.00 "
              f"| {hcfg['qps'] / ex['qps']:.1f}× vs exact |")
    ins = c.get("insert_batch")
    if ins:
        tps = f"{ins['terms_per_s']:,.0f}".replace(",", " ")
        print(f"| insert_batch (online insert at 3M) "
              f"| {tps} terms/s "
              f"({ins['batch_size']}-term batches; device work O(batch)) "
              f"| no published number | — |")
    print()
    print(f"(generated from {os.path.basename(path)}, dataset "
          f"{data.get('dataset', {})})")


if __name__ == "__main__":
    main()
