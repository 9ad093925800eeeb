"""Storage maintenance: small-file compaction.

The classic operational failure at 100 TB is not a slow query — it is a
table of 50 million 2 MB files: every scan pays per-file open/footer
costs, the driver's file index balloons, and shuffle planning degrades.
Streaming sinks and over-parallel writers produce exactly that. The fix
is periodic compaction: rewrite a directory into ceil(bytes / target)
files of the scan-friendly size (the same 128 MiB the engine's
maxPartitionBytes assumes).

Compaction here is a single repartition-write — one narrow round-robin
shuffle, no driver-side file juggling, safe to run per-partition-dir in
parallel on a real lake. The registered query demonstrates the round trip
on a deliberately shattered copy of the documents table and proves
content preservation with count + checksum (the invariant a compaction
job must never break).

The reference has no storage layer (its write path throws,
/root/reference/src/main/java/org/example/CustomTable.java:52-54); this
is part of the batch-analytics surface BASELINE.json mandates.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..plans.util import t

COMPACT_SHATTER_FILES = 32  # the "badly written" input layout
COMPACT_TARGET_FILES = 4  # fixture-sized stand-in for bytes/128MiB


def compact_parquet(
    spark: SparkSession, in_dir: str, out_dir: str, target_files: int
) -> None:
    """Rewrite a parquet directory into `target_files` files.

    At scale, derive target_files = ceil(input_bytes / 128 MiB) from the
    file listing; a fixture-sized corpus pins it explicitly instead."""
    df = spark.read.parquet(in_dir)
    df.repartition(target_files).write.mode("overwrite").parquet(out_dir)


def _parquet_files(path: str) -> list[str]:
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


@register(
    "q_compact_small_files",
    f"""
    SELECT CAST({COMPACT_SHATTER_FILES} AS INTEGER) AS files_before,
           CAST({COMPACT_TARGET_FILES} AS INTEGER) AS files_after,
           COUNT(*) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
           CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS token_checksum
    FROM documents
    """,
    doc="small-file compaction round trip: shatter documents into 32 "
    "files, compact to 4 via one repartition-write, prove file counts and "
    "content checksums (rows, id sum, token sum) are preserved.",
)
def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = tempfile.mkdtemp(prefix="compact_")
    shattered = os.path.join(base, "shattered")
    compacted = os.path.join(base, "compacted")

    docs = t(spark, sf_dir, "documents")
    docs.repartition(COMPACT_SHATTER_FILES).write.mode("overwrite").parquet(shattered)
    compact_parquet(spark, shattered, compacted, COMPACT_TARGET_FILES)

    out = spark.read.parquet(compacted)
    return out.agg(
        F.lit(len(_parquet_files(shattered))).cast("int").alias("files_before"),
        F.lit(len(_parquet_files(compacted))).cast("int").alias("files_after"),
        F.count("*").alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
        F.sum(F.size(F.split(F.trim("text"), " ")))
        .cast("bigint")
        .alias("token_checksum"),
    )


# --------------------------------------------------------------------------
# Partition backfill: restate ONE day of a date-partitioned table without
# touching any other partition. This is the daily-pipeline bread-and-butter
# (late data arrived, a bug was fixed, one day is recomputed): dynamic
# partition overwrite replaces exactly the partitions present in the write,
# so the job is idempotent and the blast radius is the restated day — never
# a full-table rewrite. At 100 TB with daily partitions, this is the
# difference between rewriting ~1/365th of the table and rewriting all of
# it.
# --------------------------------------------------------------------------

BACKFILL_DAY = "2024-01-15"  # present at every fixture SF


@register(
    "q_backfill_day_partition",
    f"""
    WITH day AS (
      -- value * 2 BEFORE the decimal cast, mirroring the Spark side (the
      -- backfilled files hold doubled doubles): doubling is exact in
      -- binary, but cast-then-double vs double-then-cast can differ at
      -- the half-even rounding boundary of DECIMAL(18,6).
      SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value * 2 AS DECIMAL(18,6))) AS DOUBLE) AS restated_value
      FROM events WHERE CAST(ts AS DATE) = DATE '{BACKFILL_DAY}'
      GROUP BY event_type
    )
    SELECT day.event_type, day.n_events, day.restated_value,
           (SELECT COUNT(*) FROM events) AS total_rows
    FROM day ORDER BY day.event_type
    """,
    doc="dynamic-partition-overwrite backfill: restate one day (values "
    "doubled, a corrective restatement) in a date-partitioned copy of "
    "events; the oracle checks the restated day AND that the total row "
    "count is unchanged — i.e. no other partition was touched.",
)
def q_backfill_day_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = tempfile.mkdtemp(prefix="backfill_")
    ev = t(spark, sf_dir, "events").withColumn("dt", F.to_date("ts"))
    ev.write.mode("overwrite").partitionBy("dt").parquet(base)

    # the "recomputed" day: same rows, values restated (doubled)
    day = F.lit(BACKFILL_DAY).cast("date")
    restated = ev.where(F.col("dt") == day).withColumn(
        "value", F.col("value") * F.lit(2.0)
    )
    # dynamic mode: ONLY the partitions present in this write are replaced
    restated.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("dt").parquet(base)

    out = spark.read.parquet(base)
    total = out.agg(F.count("*").alias("total_rows"))
    return (
        out.where(F.col("dt") == day)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("restated_value"),
        )
        .crossJoin(F.broadcast(total))
        .select("event_type", "n_events", "restated_value", "total_rows")
        .orderBy("event_type")
    )
