"""JSONL interchange — the dominant LLM-training-data exchange format.

Write a corpus as newline-delimited JSON (one object per line, sharded one
file per task) and read it back with an explicit schema. Training-data
pipelines live on JSONL at their edges (ingest from crawls / export to
tokenizer runs), so the engine speaks it natively via Spark's built-in
json source — no custom parser.

Scale design (100 TB corpus, 1000 executors):
  * Write: one output shard per task, no shuffle (a ``coalesce`` is only
    applied at fixture scale to avoid 32 one-KB files; a big table keeps
    its natural parallelism). Compression would be one ``option()`` away.
  * Read: schema is DECLARED, not inferred — schema inference over JSONL
    is a full extra pass over 100 TB and is nondeterministic under corrupt
    records, so the contract here requires the caller's StructType.
    Corrupt lines land in ``_corrupt_record`` under the default PERMISSIVE
    mode rather than failing the job.

Reference parity note: the reference repo is a source-only mock MQ
(/root/reference/src/main/java/org/example/); file interchange is part of
the LLM-data-pipeline brief (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..plans.util import t, work_dir


def write_jsonl(df: DataFrame, path: str, shards: int | None = None) -> None:
    """Write df as JSONL. shards only coalesces DOWN (fixture-scale file
    hygiene); a table with more natural partitions than shards keeps them."""
    out = df
    if shards is not None and df.rdd.getNumPartitions() > shards:
        out = df.coalesce(shards)
    out.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read JSONL with a declared schema (never inference — see module doc)."""
    return spark.read.schema(schema).json(path)


@register(
    "q_jsonl_roundtrip",
    """
    SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
           md5(text) AS text_md5
    FROM documents ORDER BY doc_id
    """,
    doc="JSONL interchange roundtrip: documents written as sharded "
    "newline-delimited JSON and read back under a declared schema; the "
    "oracle is the original table (the roundtrip must be lossless, "
    "md5-checked per row).",
)
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    path = work_dir("jsonl_rt")
    write_jsonl(docs, path, shards=4)
    back = read_jsonl(spark, path, docs.schema)
    return back.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.md5("text").alias("text_md5"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# CSV interchange — same contract as JSONL (declared schema, sharded
# write, PERMISSIVE corrupt capture), for the other edge format legacy
# pipelines exchange. Quoting/escaping is the writer's job; the
# registered roundtrip proves losslessness per row including text fields.
# --------------------------------------------------------------------------


def write_csv(df: DataFrame, path: str, shards: int | None = None) -> None:
    out = df
    if shards is not None and df.rdd.getNumPartitions() > shards:
        out = df.coalesce(shards)
    out.write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    # multiLine: quoted embedded newlines parse correctly — the price is
    # that a file stops being line-splittable across tasks (each file =
    # one task). That is CSV's structural scale penalty vs JSONL (always
    # line-splittable); at 100 TB keep shards small or use JSONL. The
    # other documented corner: CSV cannot represent the empty-string /
    # NULL distinction (both read back NULL under the default nullValue).
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(path)
    )


@register(
    "q_csv_roundtrip",
    """
    SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
           md5(text) AS text_md5
    FROM documents ORDER BY doc_id
    """,
    doc="CSV interchange roundtrip: documents written as quoted/escaped "
    "sharded CSV with header and read back under a declared schema; "
    "oracle is the original table (lossless per-row md5 check).",
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    path = work_dir("csv_rt")
    write_csv(docs, path, shards=4)
    back = read_csv(spark, path, docs.schema)
    return back.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.md5("text").alias("text_md5"),
    ).orderBy("doc_id")
