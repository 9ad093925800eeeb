"""Vectorized Python UDF surface (SURVEY.md §2.4 'UDF surface' row):
scalar ``@pandas_udf`` and grouped-map ``applyInPandas``, each oracle-checked.

The engine's stance is UDFs-as-last-resort — everything expressible in
``pyspark.sql.functions`` stays JVM-side (see functions/text.py, where the
same token counting is done with built-ins). These two queries exist to keep
the Arrow-vectorized escape hatch exercised end to end: scalar batches in
(pandas.Series), grouped frames in (pandas.DataFrame), results hash-compared
against DuckDB. mapInPandas and applyInPandasWithState are covered in
operators/similarity.py and streaming/pipelines.py respectively.

Scale notes: a scalar pandas UDF is a projection — embarrassingly parallel,
no shuffle, Arrow batches amortize the Python boundary. applyInPandas
shuffles on the grouping key and materializes ONE GROUP PER CALL in pandas —
safe when groups are bounded (a user's events), never for whole-corpus keys.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..plans.registry import register
from ..plans.util import t, tp


# --------------------------------------------------------------------------
# Scalar pandas UDF: whitespace token count, vectorized over Arrow batches.
# Integer-exact, so the DuckDB oracle matches bit-for-bit.
# --------------------------------------------------------------------------


@pandas_udf(LongType())
def token_count_udf(text: pd.Series) -> pd.Series:
    return text.str.split().map(len).astype("int64")


@register(
    "q_udf_scalar_tokens",
    """
    SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens
    FROM documents
    ORDER BY doc_id
    """,
    doc="scalar @pandas_udf token count (Arrow-batched projection).",
)
def q_udf_scalar_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count_udf("text").alias("n_tokens")).orderBy(
        "doc_id"
    )


# --------------------------------------------------------------------------
# Grouped-map applyInPandas: per-user event stats. median is the
# classic can't-do-it-with-partial-aggs statistic (needs the whole group);
# both pandas and DuckDB define even-count median as the midpoint average,
# one IEEE op on identical doubles ⇒ hash-stable.
# --------------------------------------------------------------------------

_GROUP_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("median_value", DoubleType()),
        StructField("max_gap_events", LongType()),
    ]
)


def _user_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    vals = pdf["value"]
    ids = pdf["event_id"].sort_values().to_numpy()
    gaps = (ids[1:] - ids[:-1]).max() if len(ids) > 1 else 0
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "median_value": [float(vals.median())],
            "max_gap_events": [int(gaps)],
        }
    )


@register(
    "q_udf_grouped_user_stats",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           median(value) AS median_value,
           COALESCE(MAX(gap), 0) AS max_gap_events
    FROM (
      SELECT user_id, value,
             event_id - lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
               AS gap
      FROM events
    )
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="grouped-map applyInPandas: per-user median + max event-id gap "
    "(whole-group statistics, one pandas frame per user).",
)
def q_udf_grouped_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return (
        ev.groupBy("user_id")
        .applyInPandas(_user_stats, _GROUP_STATS_SCHEMA)
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Grouped-AGG pandas UDF (the UDAF surface): unlike applyInPandas this one
# slots into a normal .agg() next to built-ins. Spark feeds the whole
# group's column as one pandas Series. Geometric mean is the classic
# "no built-in" aggregate; exp/log in float64 is IEEE-identical to DuckDB
# computing the same expression, and the group sizes here are bounded
# (per event_type), so whole-group materialization is safe at any corpus
# size — the thing that grows is group COUNT, which shards freely.
# --------------------------------------------------------------------------


@pandas_udf(DoubleType())
def geomean_udf(v: pd.Series) -> float:
    import numpy as np

    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))


@pandas_udf(LongType())
def count_udf(v: pd.Series) -> int:
    # Spark disallows mixing group-agg pandas UDFs with JVM aggregates in
    # one .agg() (INVALID_PANDAS_UDF_PLACEMENT), so the count rides along
    # as a pandas aggregate too.
    return len(v)


@register(
    "q_udf_grouped_agg_geomean",
    """
    SELECT event_type,
           COUNT(*) AS cnt,
           ROUND(exp(SUM(ln(value)) / COUNT(*)), 6) AS geomean_value
    FROM events
    WHERE value > 0
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="grouped-agg pandas_udf (UDAF): per-type geometric mean. Both "
    "engines round to 6dp: the log-sum's float reduction order differs "
    "(numpy pairwise vs sequential) in the last ~2 ulps.",
)
def q_udf_grouped_agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("value") > 0)
    return (
        ev.groupBy("event_type")
        .agg(
            count_udf("value").alias("cnt"),
            F.round(geomean_udf("value"), 6).alias("geomean_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Python UDTF (Spark 4): one input row -> N output rows with a real table
# schema — the API-complete form of the reference demo's flatMap
# tokenization (/root/reference/README.md:84-86). The lateral join keeps
# the explosion map-side; the oracle is DuckDB's unnest.
# --------------------------------------------------------------------------


def _make_tokenize_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            for pos, tok in enumerate(text.split()):
                yield pos, tok

    return Tokenize


@register(
    "q_udtf_tokenize",
    """
    SELECT doc_id, CAST(pos - 1 AS INT) AS pos, token
    FROM (
      SELECT doc_id,
             generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos,
             unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents
      WHERE doc_id < 50
    )
    ORDER BY doc_id, pos
    """,
    doc="Python UDTF: 1->N tokenization with (pos, token) table output via "
    "LATERAL join.",
)
def q_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    Tokenize = _make_tokenize_udtf()
    spark.udtf.register("tokenize_udtf", Tokenize)
    t(spark, sf_dir, "documents").where(F.col("doc_id") < 50).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, tk.pos, tk.token
        FROM _udtf_docs d, LATERAL tokenize_udtf(d.doc_id, d.text) tk
        ORDER BY d.doc_id, tk.pos
        """
    )
