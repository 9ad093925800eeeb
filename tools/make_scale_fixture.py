"""Build a LARGER-SF probe fixture by deterministic replication of sf0.1.

VERDICT r17 "Next round" item 1: sf0.1 is overhead-saturated (8 cores
matches or beats 32 on every headline query), so the headline set needs
one larger-SF scaling reading. The driver's fixtures stop at sf0.1 and
/root/testdata is read-only, so this tool synthesizes a 10x (or Nx)
fixture for the three tables the heavy headline queries touch
(documents, embeddings, events) into a scratch directory. It is a
PERF-PROBE fixture only — no DuckDB oracle exists for it, nothing under
/root/testdata is touched, and neither bench.py nor any query reads it
unless pointed at it explicitly.

Replication is deterministic (no RNG):
  * documents: doc_id + r*1e8 (offset a multiple of every doc_id mod the
    queries use, so slice densities are preserved); the token array is
    ROTATED by r positions per replica — length/word multiset preserved
    (gate metrics keep their distribution) while shingles/bigrams become
    (mostly) replica-unique, so dedup/near-dup candidate volume scales
    ~linearly like a real bigger corpus instead of quadratically like a
    10x copy-paste would.
  * embeddings: vec_id + r*1e8 (queries stay vec_id < 5 in replica 0),
    label/embedding unchanged (scan and matmul cost is what scales).
  * events: event_id + r*1e8, user_id + r*1e6 (10x the user keys — the
    debounce/sessionize state actually grows), ts/type/value unchanged.

Usage (repo root):
    python tools/make_scale_fixture.py [out_dir] [replicas]
Defaults: /tmp/spark_graft_scale_fixture/sf1 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
ID_OFF = 100_000_000  # multiple of every doc/vec/event id modulus in use
USER_OFF = 1_000_000


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_fixture/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from spark_sql_custom_mq_datasource_spark.session import get_spark

    spark = get_spark("make-scale-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    def replicate(name: str, transform) -> None:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        rep = df.crossJoin(
            spark.range(0, replicas).select(F.col("id").cast("int").alias("_r"))
        )
        transform(rep).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: x{replicas} -> {out}/{name}.parquet", flush=True)

    def docs(rep):
        ws = F.split(F.trim("text"), " ")
        n = F.size(ws)
        rot = F.pmod(F.col("_r"), F.greatest(n, F.lit(1)))
        rotated = F.concat(
            F.slice(ws, rot + 1, n - rot), F.slice(ws, F.lit(1), rot)
        )
        return rep.select(
            (F.col("doc_id") + F.col("_r").cast("long") * ID_OFF).alias("doc_id"),
            F.when(n >= 2, F.array_join(rotated, " "))
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    def embs(rep):
        return rep.select(
            (F.col("vec_id") + F.col("_r").cast("long") * ID_OFF).alias("vec_id"),
            "embedding",
            "label",
        )

    def evts(rep):
        return rep.select(
            (F.col("event_id") + F.col("_r").cast("long") * ID_OFF).alias(
                "event_id"
            ),
            "ts",
            (F.col("user_id") + F.col("_r").cast("long") * USER_OFF).alias(
                "user_id"
            ),
            "event_type",
            "value",
            "props",
        )

    replicate("documents", docs)
    replicate("embeddings", embs)
    replicate("events", evts)
    # the remaining tables are not used by the probed queries; symlink the
    # sf0.1 files so any incidental `t()` load still resolves
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ):
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print("done", flush=True)


if __name__ == "__main__":
    main()
