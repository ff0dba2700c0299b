#!/usr/bin/env python3
"""Predicted vs retrieved target counts (reference ``target_counts.py``
parity — quality of the statistics model's target-count prediction).

    python evaluation/target_counts.py config/confidence_eval.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _common import engine_from_config, sample_words

from postgres_word2vec_tpu.evaluation import target_count_eval
from postgres_word2vec_tpu.utils.config import Configuration


def main(config_path: str) -> None:
    cfg = Configuration(config_path)
    eng = engine_from_config(cfg)
    eng.set_alpha(cfg.get_value_or("alpha", 10))
    queries = sample_words(eng, cfg.get_value_or("query_sample", 50),
                           cfg.get_value_or("seed", 0))
    targets = sample_words(eng, cfg.get_value_or("target_sample", 5000),
                           cfg.get_value_or("seed", 0) + 1)
    out = target_count_eval(eng, queries, cfg.get_value_or("k", 5), targets)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    from postgres_word2vec_tpu.utils.config import apply_platform_from_env
    apply_platform_from_env()
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1])
