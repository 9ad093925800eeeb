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
