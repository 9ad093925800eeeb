"""A/B probe: wall time of compute-heavy fixture queries vs the tp()
spread width (the repartition target for small scans, today
defaultParallelism) — the §2.2 "partition from input size, not machine
size" question for the BATCH compute paths, motivated by the r17 scaling
block where 8 cores matched or beat 32 on every sf0.1 query
(PERF_r17.json worst inversions: q_lm_perplexity 0.49,
q_heavy_hitters_2gram 0.57, q_dedup_substring_spans 0.67, q_bm25_topk
0.72).

Usage (repo root):

    SPARK_GRAFT_CPUS=32 python tools/probe_tp_width.py [sf_dir] [q ...]

For each width in WIDTHS it clears the util/dedup caches, re-reads the
fixture with tp()'s target forced to that width, and times each query
(3 draws, best-of reported, first draw shown as cold). One JSON line per
(query, width).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTHS = [0, 16, 8, 4]  # 0 = today's behavior (defaultParallelism)

QUERIES = [
    "q_lm_perplexity",
    "q_heavy_hitters_2gram",
    "q_dedup_substring_spans",
    "q_bm25_topk",
    "q_dedup_ngram_jaccard",
    "q_ann_sq8_topk",
    "q_semantic_kmeans",
    "q_ann_bruteforce_topk",
    "q_pipeline_end_to_end",
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_REDELIVERY_EXERCISE", "0")
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.1"
    names = args or QUERIES

    from spark_sql_custom_mq_datasource_spark.plans import util
    from spark_sql_custom_mq_datasource_spark.plans.registry import (
        QUERIES as REG,
        get_queries,
    )
    from spark_sql_custom_mq_datasource_spark.session import get_spark

    get_queries()
    spark = get_spark("probe-tp-width")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up once (JVM/codegen/python workers)
    for warm in ("q1_pricing_summary", "q_udf_scalar_tokens"):
        try:
            REG[warm].fn(spark, sf_dir).collect()
        except Exception:
            pass

    for width in WIDTHS:
        # force tp()'s spread target, clear every cache keyed on the old width
        os.environ.pop("SPARK_GRAFT_TP_WIDTH", None)
        if width:
            os.environ["SPARK_GRAFT_TP_WIDTH"] = str(width)
        util._cache.clear()
        try:
            from spark_sql_custom_mq_datasource_spark.operators.dedup import (
                clear_dedup_caches,
            )

            clear_dedup_caches(spark)
        except Exception:
            pass
        spark.catalog.clearCache()
        for name in names:
            draws = []
            err = None
            for _ in range(3):
                t0 = time.perf_counter()
                try:
                    REG[name].fn(spark, sf_dir).collect()
                except Exception as exc:
                    err = f"{type(exc).__name__}: {exc}"[:200]
                    break
                draws.append(round(time.perf_counter() - t0, 3))
            rec = {
                "query": name,
                "tp_width": width or "default",
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            }
            if err:
                rec["error"] = err
            else:
                rec["best"] = min(draws)
                rec["draws"] = draws
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
