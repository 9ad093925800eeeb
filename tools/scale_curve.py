"""Scaling-curve evidence: time representative queries at sf0.001 / 0.01 /
0.1 (100x data range) in ONE session and report per-query growth ratios.

A query whose plan is scale-sound grows at most linearly in the data (plus
fixed per-query overhead, which dominates at the small end — so healthy
ratios are well UNDER the 10x data ratio on this fixture range). A
super-linear jump between adjacent SFs is the local[32] shadow of the
100 TB cliff (a quadratic candidate join, a driver collect, an unpruned
scan) and fails the run.

Usage:
    python tools/scale_curve.py [q1 q2 ...]   # default: a mixed set

Output: one JSON line per query with {sf: seconds} plus the 0.01->0.1
growth ratio, and a trailing summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
DEFAULT = [
    "q1_pricing_summary",       # scan-heavy agg
    "q3_shipping_priority",     # star join
    "q18_large_volume_customers",  # fact-fact aggregate-before-join
    "q_dedup_ngram_jaccard",    # candidate-generation join
    "q_dedup_minhash_lsh",      # banded LSH self-join
    "q_ann_bruteforce_topk",    # Arrow mapInPandas matmul
    "q_chunk_documents",        # 1->N explode projection
    "q_pii_redact",             # pure regex projection
    "q_bm25_topk",              # inverted-index build + broadcast scoring
    "q_rolling_dau_wau",        # bounded explode + distinct
    "q_scd2_pointintime",       # as-of join (union + one window sort)
]
# growth threshold for the 0.01 -> 0.1 step (10x data): linear-with-
# overhead lands well below 10; anything above it is super-linear.
MAX_RATIO = 10.0


def main() -> None:
    names = sys.argv[1:] or DEFAULT

    from spark_sql_custom_mq_datasource_spark.plans.registry import (
        QUERIES,
        get_queries,
    )
    from spark_sql_custom_mq_datasource_spark.session import get_spark

    get_queries()
    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")

    worst = (0.0, "-")
    for name in names:
        times = {}
        for sf_dir in SFS:
            sf = sf_dir.rsplit("sf", 1)[1]
            best = float("inf")
            for _ in range(2):  # best-of-2: first run pays JIT/scan warmup
                t0 = time.monotonic()
                QUERIES[name].fn(spark, sf_dir).collect()
                best = min(best, time.monotonic() - t0)
            times[sf] = round(best, 3)
        ratio = round(times["0.1"] / max(times["0.01"], 1e-9), 2)
        if ratio > worst[0]:
            worst = (ratio, name)
        print(json.dumps({"query": name, "sec": times, "ratio_x10data": ratio}))

    ok = worst[0] <= MAX_RATIO
    print(
        json.dumps(
            {
                "metric": "scale_curve",
                "worst_ratio": worst[0],
                "worst_query": worst[1],
                "threshold": MAX_RATIO,
                "ok": ok,
            }
        )
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
