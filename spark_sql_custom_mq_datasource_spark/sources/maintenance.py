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
