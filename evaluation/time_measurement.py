#!/usr/bin/env python3
"""Query-family timing harness (reference ``time_measurement.py`` /
``evaluation_utils.py main`` parity).

    python evaluation/time_measurement.py config/time_measurement.json

Methods (the reference's CLI set, evaluation_utils.py:390-456):
``default`` (single kNN per family), ``defaultpv`` (post-verified variants),
``batch`` (batched IVFADC), ``batch-precision`` (batch + precision vs
exact). Results printed as JSON.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _common import engine_from_config, sample_words

from postgres_word2vec_tpu.evaluation import (batch_measurement,
                                              calculate_precision,
                                              measurement)
from postgres_word2vec_tpu.utils.config import Configuration


def main(config_path: str) -> None:
    cfg = Configuration(config_path)
    eng = engine_from_config(cfg)
    k = cfg.get_value_or("k", 5)
    n_q = cfg.get_value_or("query_sample", 20)
    method = cfg.get_value_or("method", "default")
    queries = sample_words(eng, n_q, cfg.get_value_or("seed", 0))

    out: dict = {"method": method, "k": k, "queries": len(queries)}
    if method == "default":
        for fn in ("k_nearest_neighbour", "k_nearest_neighbour_pq",
                   "k_nearest_neighbour_ivfadc"):
            res = measurement(eng, queries, k, fn)
            times = list(res["times"].values())
            out[fn] = {"mean_s": sum(times) / len(times)}
    elif method == "defaultpv":
        for fn in ("k_nearest_neighbour_pq_pv",
                   "k_nearest_neighbour_ivfadc_pv"):
            res = measurement(eng, queries, k, fn)
            times = list(res["times"].values())
            out[fn] = {"mean_s": sum(times) / len(times)}
    elif method == "batch":
        b = batch_measurement(eng, queries, k)
        out["batch"] = {"time_s": b["time"], "per_query_s": b["per_query"]}
    elif method == "batch-precision":
        b = batch_measurement(eng, queries, k)
        exact = eng.knn_batch_exact(queries, k)
        out["batch"] = {"time_s": b["time"],
                        "precision": calculate_precision(b["results"],
                                                         exact)}
    else:
        raise SystemExit(f"unknown method {method!r}")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    from postgres_word2vec_tpu.utils.config import apply_platform_from_env
    apply_platform_from_env()
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1])
