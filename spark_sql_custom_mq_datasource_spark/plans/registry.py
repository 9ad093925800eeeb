"""Central query registry.

Every operator/query the engine claims is registered here once, pairing
  * a Spark implementation  (SparkSession, sf_dir) -> DataFrame
  * an ANSI-SQL oracle string DuckDB can run on the same parquet tables
    (None for genuinely non-SQL-expressible ops — the driver then records a
    weaker rows-only check).

Column names are aliased identically on both sides: the correctness harness
sorts columns by name before value-hashing (driver contract in
/root/repo/__spark_entry__.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: SparkQuery
    oracle: str | None
    headline: bool = False  # included in bench.py's timed set
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, headline: bool = False, doc: str = ""
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, headline=headline, doc=doc)
        return fn

    return deco


# The correctness harness verifies a 50-query PREFIX of the registry per
# round. This list pins that prefix explicitly (module import order alone
# left 4 queries never checked in any round — VERDICT.md r03 item 5).
#
# Rotation policy (bounds staleness, ADVICE r04 item 4): each round the
# prefix holds (a) every query whose code or oracle CHANGED this round,
# (b) the families with the OLDEST last-green driver record, (c) a few
# stable greens rotated back in on a schedule. Round 5 therefore swaps the
# round-4 prefix (all freshly green in CORRECTNESS_r04.json) out for the
# 45 queries whose last driver record was round 1 — the whole TPC-H
# family, window/set-op/scalar/array/date/percentile — especially
# q12_priority_by_class, whose only driver record was an r01 hash-FAIL
# (fixed in round 2, never driver-re-checked since), plus
# q_approx_distinct_parts (now hash-checkable), q_stream_mq_wordcount
# (new VALUES oracle), q_stream_decontaminate (restructured onto
# foreachBatch), and the 7 operators ADDED this round (never
# driver-checked — highest priority per tools/rotation_plan.py). Four
# r01 greens whose FAMILY keeps other members in the prefix
# (q_top_customers, q_union_high_value, q_window_running_total,
# q_right_join_order_coverage) wait one more round to make room. Union
# coverage across rounds stays complete: everything rotated out is green
# in CORRECTNESS_r04.json or r01 + re-verified locally this round.
#
# Late-round-5 additions (PII redaction ×2, runtime-filter join, TF-IDF,
# chunking, JSONL roundtrip) take never-checked priority; six more stable
# r01 greens with in-prefix family cover step aside for them
# (q_semi_join_priority, q_distinct_parts_per_flag, q_array_functions,
# q_events_global_stats, q_window_order_gaps, q_cube_orders — each
# locally re-verified via tools/check_oracles.py this round).
#
# ROUND-6 ROTATION PLAN: the 11 queries added after this prefix froze are
# first in line (never driver-checked; all pass the local mirror at
# sf0.001 + sf0.01 + CHECK_VANILLA): q_rolling_dau_wau, q_funnel_stages,
# q_cohort_retention, q_retention_prune, q_approx_percentile_bounds,
# q_window_time_range_avg, q_unpivot_daily, q_null_semantics,
# q_scd2_build, q_scd2_pointintime, q_stream_chunk_documents. Next: the
# 10 r01-greens displaced this round, then r04 greens on schedule.
_PRIORITY: tuple[str, ...] = (
    # -- changed this round: must be driver-re-checked -------------------
    "q_stream_mq_wordcount",
    "q_approx_distinct_parts",
    "q_stream_decontaminate",
    # -- only driver record is an r01 hash-FAIL (fixed in ccb80c6) -------
    "q12_priority_by_class",
    # -- TPC-H family, last checked r01 ----------------------------------
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation",
    "q10_returned_items",
    "q11_important_parts",
    "q13_order_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_diversity",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q20_heavy_promo_shippers",
    "q21_waiting_suppliers",
    "q22_sales_opportunity",
    # -- join variants, last checked r01 ---------------------------------
    "q_anti_join_idle_customers",
    "q_outer_join_nation_customers",
    "q_full_outer_join_balance",
    "q_subquery_above_avg",
    # -- agg/rollup/set-op families, last checked r01 --------------------
    "q_rollup_returns",
    "q_grouping_sets_sql",
    "q_setops_active_customers",
    # -- window family, last checked r01 ---------------------------------
    "q_window_top_parts_per_brand",
    "q_window_rank_dense_ntile",
    # -- scalar/array/date/percentile families, last checked r01 ---------
    "q_scalar_functions",
    "q_date_functions",
    "q_percentiles_price",
    # -- new this round: never driver-checked, highest rotation priority --
    "q_bm25_topk",
    "q_quality_gopher",
    "q_dsir_importance",
    "q_stream_quality_gate",
    "q_dedup_substring_spans",
    "q_heavy_hitters_2gram",
    "q_compact_small_files",
    # -- late-round-5 additions: never driver-checked -------------------
    "q_pii_redact",
    "q_stream_pii_redact",
    "q_runtime_filter_join",
    "q_tfidf_topterms",
    "q_chunk_documents",
    "q_jsonl_roundtrip",
)


def _load_all() -> None:
    """Import every module that registers queries (idempotent), then pin
    the harness-checked prefix to _PRIORITY order."""
    from ..operators import dedup  # noqa: F401
    from ..operators import retrieval  # noqa: F401
    from ..operators import similarity  # noqa: F401
    from ..functions import text  # noqa: F401
    from ..operators import curation  # noqa: F401
    from ..functions import udfs  # noqa: F401
    from ..operators import multimodal  # noqa: F401
    from ..operators import privacy  # noqa: F401
    from ..operators import joins  # noqa: F401
    from ..streaming import pipelines  # noqa: F401
    from ..sources import bucketing  # noqa: F401
    from ..sources import jsonl  # noqa: F401
    from ..sources import maintenance  # noqa: F401
    from . import analytics  # noqa: F401
    from . import product_analytics  # noqa: F401
    from . import tpch  # noqa: F401
    from . import tpch2  # noqa: F401
    from . import tpch3  # noqa: F401

    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    for name, q in QUERIES.items():
        if name not in ordered:
            ordered[name] = q
    QUERIES.clear()
    QUERIES.update(ordered)


def get_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: q.fn for name, q in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


def get_headline() -> list[str]:
    _load_all()
    return [name for name, q in QUERIES.items() if q.headline]
