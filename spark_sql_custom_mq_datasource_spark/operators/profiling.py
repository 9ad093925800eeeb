"""Column-level table profiling (the ANALYZE-TABLE surface).

Every lake operation upstream of this engine — compaction sizing, join
strategy, skew diagnosis, data-quality gating — starts from per-column
statistics: row count, null count, distinct count, min/max. Warehouses
expose it as ANALYZE / COMPUTE STATISTICS; at 100 TB it must be a single
scan, not a per-column loop of full scans.

Shape: the table is UNPIVOTED to (col_name, val-as-string) rows with one
``stack`` projection — one scan, rows × |cols| narrow rows — then ONE
grouped aggregate on col_name computes all five statistics per column.
``count(distinct val)`` runs as the standard two-phase expansion (partial
distinct on (col_name, val), then count), so a hot column never funnels
through one reducer. min/max compare the stringified values (binary
collation in both engines), which keeps one output schema for
heterogeneous column types; exactness of n_distinct is preserved because
casting is injective for the profiled types.

Scale posture: at 100 TB the same plan runs with
``approx_count_distinct`` swapped in for the exact distinct (the knob is
``exact=``) — the unpivot itself is a pure projection and the aggregate
state is five scalars per column either way. The fixture query keeps the
exact path so the DuckDB oracle can match bit-for-bit.

The reference has no statistics surface (it is a 271-line source mock);
this belongs to the batch-analytics surface BASELINE.json mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..plans.util import t


def profile_table(df: DataFrame, cols: list[str], exact: bool = True) -> DataFrame:
    """Per-column profile of `df` restricted to `cols`:
    (col_name, n_rows, n_nonnull, n_distinct, min_val, max_val).

    One scan + one shuffle regardless of |cols|. `exact=False` swaps the
    distinct count for approx_count_distinct (HLL) — the 100 TB default,
    where a ±2% NDV answers the same planning questions for ~1/20 the
    aggregate state."""
    stack_args = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in cols
    )
    pairs = df.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (col_name, val)")
    )
    ndv = (
        F.count_distinct("val") if exact else F.approx_count_distinct("val")
    ).alias("n_distinct")
    return pairs.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        F.count("val").alias("n_nonnull"),
        ndv,
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


def _profile_oracle(table: str, cols: list[str]) -> str:
    parts = [
        f"""
        SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
               COUNT(CAST({c} AS VARCHAR)) AS n_nonnull,
               COUNT(DISTINCT CAST({c} AS VARCHAR)) AS n_distinct,
               MIN(CAST({c} AS VARCHAR)) AS min_val,
               MAX(CAST({c} AS VARCHAR)) AS max_val
        FROM {table}
        """
        for c in cols
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@register(
    "q_profile_documents",
    _profile_oracle("documents", _DOC_COLS),
    doc="ANALYZE-style per-column profile (rows/nulls/exact NDV/min/max) "
    "of the documents table — one unpivot scan + one grouped aggregate; "
    "the 100 TB path swaps in approx_count_distinct via exact=False.",
)
def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return profile_table(docs, _DOC_COLS).orderBy("col_name")
