"""Round-17 optimization profiler: per-headline-query wall time, Spark
job/stage counts, and formatted physical plans.

Usage (repo root):

    python tools/profile_r17.py [sf_dir] [--plans-dir plans/r17] [--tag before] [query ...]

For each query (default: the bench headline set, in bench order) it
records N draws (best-of reported), the number of Spark jobs launched,
and writes ``<plans-dir>/<query>_<tag>.txt`` with the
``explain("formatted")`` output. Prints one JSON line at the end.

Methodology matches bench.py: same warm-up, same collect() action, the
LEGACY-14 group first, then extended, streaming last.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_REDELIVERY_EXERCISE", "0")
    args = [a for a in sys.argv[1:]]
    plans_dir = None
    tag = "before"
    if "--plans-dir" in args:
        i = args.index("--plans-dir")
        plans_dir = args[i + 1]
        del args[i : i + 2]
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.1"
    only = args  # remaining positional args = query subset

    from spark_sql_custom_mq_datasource_spark.session import get_spark
    from spark_sql_custom_mq_datasource_spark.plans.registry import (
        QUERIES,
        get_headline,
        get_queries,
    )

    get_queries()
    spark = get_spark("profile-r17")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    headline = only or get_headline()

    # warm-up identical to bench.py
    for warm in (
        "q1_pricing_summary",
        "q_events_tumbling_1d",
        "q_text_token_stats",
        "q_udf_scalar_tokens",
    ):
        try:
            QUERIES[warm].fn(spark, sf_dir).collect()
        except Exception:
            pass
    try:
        from spark_sql_custom_mq_datasource_spark.operators.dedup import (
            shingle_sets_cached,
        )

        shingle_sets_cached(spark, sf_dir).count()
    except Exception:
        pass

    results: dict[str, dict] = {}
    for name in headline:
        fn = QUERIES[name].fn
        draws = []
        jobs_per_draw = []
        for d in range(3):
            group = f"prof-{name}-{d}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).collect()
            except Exception as exc:
                results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
                break
            el = round(time.perf_counter() - t0, 3)
            draws.append(el)
            try:
                tracker = sc.statusTracker()
                jids = tracker.getJobIdsForGroup(group)
                jobs_per_draw.append(len(jids))
            except Exception:
                jobs_per_draw.append(-1)
            finally:
                sc.setJobGroup(None, None)
        if name in results:
            continue
        results[name] = {
            "best": min(draws),
            "draws": draws,
            "jobs": jobs_per_draw,
        }
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            try:
                df = fn(spark, sf_dir)
                plan = spark._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                    f.write(plan)
            except Exception as exc:
                with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                    f.write(f"explain failed: {type(exc).__name__}: {exc}\n")
        print(
            f"{name}: best={results[name]['best']} draws={draws} jobs={jobs_per_draw}",
            flush=True,
        )

    total = round(
        sum(v["best"] for v in results.values() if "best" in v), 3
    )
    print(json.dumps({"profile_total": total, "results": results}))


if __name__ == "__main__":
    main()
