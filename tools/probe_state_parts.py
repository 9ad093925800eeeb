"""A/B probe: wall time of small-state streaming queries vs the
shuffle-partition count in force at stream start (which pins the RocksDB
state-partition count for the drain).

Usage (repo root):

    python tools/probe_state_parts.py [sf_dir] [query ...]

For each query and each partition setting (200 = vanilla-session default,
32 = local session default, 8 = defaultParallelism//4) it runs the query
twice (second draw reported = warm) by setting the SESSION conf before the
call — meaningful only while the call sites take the session value, i.e.
run it at the pre-change tree for "before" numbers; after the change the
in-code override wins and the session setting is inert for changed sites.
Prints one JSON line per (query, setting).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q_stream_table_fingerprint",
    "q_stream_anomaly_zscore",
    "q_stream_heavy_hitters",
    "q_stream_source_quota",
    "q_stream_stateful_stats",
    "q_stream_tumbling_1d",
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_REDELIVERY_EXERCISE", "0")
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.1"
    names = args or QUERIES

    from spark_sql_custom_mq_datasource_spark.session import get_spark
    from spark_sql_custom_mq_datasource_spark.plans.registry import (
        QUERIES as REG,
        get_queries,
    )

    get_queries()
    spark = get_spark()
    base = spark.conf.get("spark.sql.shuffle.partitions")
    with open("/proc/loadavg") as f:
        print(json.dumps({"loadavg": f.read().split()[:3]}), flush=True)
    for name in names:
        fn = REG[name].fn
        for parts in (int(base), 200, 8, 4):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            draws = []
            for _ in range(2):
                t0 = time.monotonic()
                fn(spark, sf_dir).collect()
                draws.append(round(time.monotonic() - t0, 3))
            print(
                json.dumps(
                    {"query": name, "parts": parts, "draws": draws}
                ),
                flush=True,
            )
        spark.conf.set("spark.sql.shuffle.partitions", base)


if __name__ == "__main__":
    main()
