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
# left 4 queries never checked in any round — VERDICT.md r03 item 5):
# the full streaming family, everything touching `events`, the LLM-pipeline
# core, and the 4 queries no round has ever driver-checked
# (q_wordcount_topk — the reference's own demo twin, README.md:64-124 —
# q_mqlog_roundtrip, q_map_functions, q_fuzzy_source_pairs), plus the
# round-4 additions (decontamination, embedding quantization, stratified
# sampling, incremental dedup). Queries not listed keep registration order
# after the prefix; r01/r03 already recorded green rows for them
# (q_text_quality, q_text_fingerprint, q_udf_scalar_tokens,
# q_multimodal_binary_meta rotated out as stable greens), so
# round-over-round union coverage stays complete.
_PRIORITY: tuple[str, ...] = (
    "q_text_lang_id",
    "q_decontaminate_ngram",
    "q_stream_decontaminate",
    "q_embedding_quantize",
    "q_dedup_exact",
    "q_dedup_incremental",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_embedding_cosine",
    "q_dedup_clusters",
    "q_ann_bruteforce_topk",
    "q_ann_lsh_bucketed",
    "q_ann_ivf",
    "q_ann_recall_lsh",
    "q_split_train_val_test",
    "q_curation_pipeline",
    "q_stratified_sample",
    "q_token_budget_mix",
    "q_udf_grouped_user_stats",
    "q_udf_grouped_agg_geomean",
    "q_udtf_tokenize",
    "q_multimodal_decode",
    "q_asof_join_last_order",
    "q_salted_join_event_stats",
    "q_stream_tumbling_1d",
    "q_stream_tumbling_watermark",
    "q_stream_sliding_6h",
    "q_stream_dedup_pairs",
    "q_stream_dedup_within_watermark",
    "q_stream_stream_join",
    "q_stream_stateful_stats",
    "q_stream_session_windows",
    "q_stream_mq_wordcount",
    "q_stream_static_join",
    "q_stream_mq_replay",
    "q_stream_foreachbatch_parquet",
    "q_stream_rate_source",
    "q_stream_stream_left_outer",
    "q_stream_transform_with_state",
    "q_partition_pruned_day",
    "q_events_json_extract",
    "q_events_tumbling_1d",
    "q_events_sliding_6h",
    "q_events_sessionize",
    "q_events_pivot_daily",
    "q_wordcount_topk",
    "q_mqlog_roundtrip",
    "q_map_functions",
    "q_fuzzy_source_pairs",
)


def _load_all() -> None:
    """Import every module that registers queries (idempotent), then pin
    the harness-checked prefix to _PRIORITY order."""
    from ..operators import dedup  # noqa: F401
    from ..operators import similarity  # noqa: F401
    from ..functions import text  # noqa: F401
    from ..operators import curation  # noqa: F401
    from ..functions import udfs  # noqa: F401
    from ..operators import multimodal  # noqa: F401
    from ..operators import joins  # noqa: F401
    from ..streaming import pipelines  # noqa: F401
    from ..sources import bucketing  # noqa: F401
    from . import analytics  # noqa: F401
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
