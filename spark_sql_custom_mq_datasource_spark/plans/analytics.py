"""Event-stream batch analytics + semi-structured / array function surface.

The `events` fixture is the batch image of the stream the MQ source replays
(FIXTURES.md §B); these queries are the batch halves of the streaming
pipelines in ``streaming/`` — same window semantics, checkable against the
DuckDB oracle (streaming versions are tested separately with memory sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import register
from .util import dec, t

# --------------------------------------------------------------------------
# JSON extraction (events.props is a JSON string) + grouped agg.
# Scale: get_json_object is codegen'd JVM-side; no Python in the hot path.
# --------------------------------------------------------------------------


@register(
    "q_events_json_extract",
    """
    SELECT event_type,
           COUNT(*) AS cnt,
           -- CAST: DuckDB promotes integer SUM to HUGEINT; Spark returns BIGINT
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="JSON field extraction + grouped aggregation.",
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
            F.sum(dec("value", 18, 6)).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Tumbling event-time window (batch form of the streaming windowed agg).
# Scale: window() is a projection + hash agg — one shuffle on (window, type).
# --------------------------------------------------------------------------


@register(
    "q_events_tumbling_1d",
    """
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS cnt,
           COUNT(DISTINCT user_id) AS users
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    headline=True,
    doc="tumbling 1-day event-time window counts.",
)
def q_events_tumbling_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.countDistinct("user_id").alias("users"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "cnt",
            "users",
        )
        .orderBy("win_start", "event_type")
    )


@register(
    "q_events_sliding_6h",
    """
    WITH buckets AS (
      SELECT ts, value,
             time_bucket(INTERVAL '3 hour', ts) AS b
      FROM events WHERE event_type = 'purchase'
    ), slides AS (
      SELECT b AS win_start, ts, value FROM buckets
      UNION ALL
      SELECT b - INTERVAL '3 hour' AS win_start, ts, value FROM buckets
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM slides
    GROUP BY 1
    ORDER BY 1
    """,
    doc="sliding 6h/3h window (each event lands in 2 windows).",
)
def q_events_sliding_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    return (
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(dec("value", 18, 6)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "cnt",
            "sum_value",
        )
        .orderBy("win_start")
    )


# --------------------------------------------------------------------------
# Sessionization (batch): 30-min inactivity gap → session ids via window
# functions. This is the batch twin of streaming session_window(); kept
# SQL-expressible so the oracle can verify it exactly.
# Scale: two window passes over the same (user_id, ts) partitioning — Spark
# reuses one sort+shuffle for both.
# --------------------------------------------------------------------------


@register(
    "q_events_sessionize",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    ), per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events
      FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           MAX(n_events) AS max_session_events,
           -- CAST: DuckDB promotes integer SUM to HUGEINT; Spark returns BIGINT
           CAST(SUM(n_events) AS BIGINT) AS total_events
    FROM per_session
    GROUP BY user_id
    ORDER BY user_id
    """,
    headline=True,
    doc="gap-based sessionization via window functions (batch twin of session_window).",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    new_session = (
        F.when(
            (us - F.lag(us).over(order) > 1800 * 1_000_000)
            | F.lag("ts").over(order).isNull(),
            1,
        ).otherwise(0)
    )
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        new_session.alias("new_session"),
    ).select(
        "user_id",
        "ts",
        F.sum("new_session").over(running).alias("session_id"),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(F.count("*").alias("n_events"))
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum("n_events").alias("total_events"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Pivot — event_type counts per day (conditional aggregation in the oracle).
# --------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _daily_wide_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, click, error, purchase, signup, view) wide counts — pivot
    leaves NULL for absent combos, coalesced to 0 to match the oracle's
    FILTER semantics. Shared by the pivot query and its unpivot inverse."""
    ev = t(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "day", *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in _EVENT_TYPES]
    )


@register(
    "q_events_pivot_daily",
    """
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    doc="pivot on a bounded category set (conditional agg at scale).",
)
def q_events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _daily_wide_pivot(spark, sf_dir).orderBy("day")


# --------------------------------------------------------------------------
# Array functions over embeddings — JVM-side list ops (no Python).
# --------------------------------------------------------------------------


@register(
    "q_array_functions",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(list_sum(list_transform(embedding[1:8],
                         x -> CAST(abs(x) AS DOUBLE))) AS DOUBLE) AS l1_head8,
           CAST(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS max_elem
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id
    """,
    doc="array slice/transform/aggregate, all Catalyst-side.",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    head8 = F.slice("embedding", 1, 8)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.aggregate(
            head8,
            F.lit(0.0),
            lambda acc, x: acc + F.abs(x.cast("double")),
        ).alias("l1_head8"),
        F.array_max(F.transform("embedding", lambda x: x.cast("double"))).alias("max_elem"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# Global (ungrouped) aggregation over events.
# --------------------------------------------------------------------------


@register(
    "q_events_global_stats",
    """
    SELECT COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    """,
    doc="global aggregation (single-row reduce).",
)
def q_events_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.sum(dec("value", 18, 6)).cast("double").alias("sum_value"),
    )


# --------------------------------------------------------------------------
# Exact percentiles — single-pass sort-based percentile (both engines use
# linear interpolation on the sorted values, so doubles match bit-for-bit).
# Scale: percentile is not partial-aggregable; Spark sorts within each
# group's partition — fine for bounded groups (per returnflag), and the
# approx_percentile sketch is the unbounded-cardinality alternative.
# --------------------------------------------------------------------------


@register(
    "q_percentiles_price",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.50) AS p50,
           quantile_cont(l_extendedprice, 0.75) AS p75,
           quantile_cont(l_extendedprice, 0.95) AS p95,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="exact interpolated percentiles per group.",
)
def q_percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.25)).alias("p25"),
            F.percentile("l_extendedprice", F.lit(0.50)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.75)).alias("p75"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Fuzzy matching — edit-distance pairs over the (distinct) source labels:
# the candidate set is deduplicated BEFORE the quadratic step, which is the
# fuzzy-join discipline at scale (dedupe/block first, edit-distance the
# survivors; here distinct sources are dimension-sized).
# --------------------------------------------------------------------------


@register(
    "q_fuzzy_source_pairs",
    """
    WITH s AS (SELECT DISTINCT source FROM documents)
    SELECT a.source AS sa, b.source AS sb,
           CAST(levenshtein(a.source, b.source) AS INT) AS dist
    FROM s a JOIN s b ON a.source < b.source
    WHERE levenshtein(a.source, b.source) <= 1
    ORDER BY sa, sb
    """,
    doc="fuzzy matching: levenshtein <= 1 pairs over distinct source labels.",
)
def q_fuzzy_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "documents").select("source").distinct()
    a = s.select(F.col("source").alias("sa"))
    b = s.select(F.col("source").alias("sb"))
    dist = F.levenshtein("sa", "sb")
    return (
        a.join(b, F.col("sa") < F.col("sb"))
        .where(dist <= 1)
        .select("sa", "sb", dist.cast("int").alias("dist"))
        .orderBy("sa", "sb")
    )


# --------------------------------------------------------------------------
# mqlog sink round-trip: write orders through the append-only topic (full
# commit protocol: staging -> manifest -> segments), read it back, and
# aggregate — proving the write path the reference stubs out
# (CustomTable.java:52-54) preserves values end-to-end. The oracle reads
# the ORIGINAL table: PASS means the round-trip is lossless.
# Scale: segments are written one per task, so write parallelism = upstream
# partitioning; the read back maps one task per segment.
# --------------------------------------------------------------------------


@register(
    "q_mqlog_roundtrip",
    """
    SELECT o_orderstatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="mqlog sink round-trip: orders -> append-only topic -> read back "
    "-> aggregate; oracle reads the original table (lossless write path).",
)
def q_mqlog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..session import register_mq_source
    from .util import work_dir

    register_mq_source(spark)
    topic = os.path.join(work_dir("mqlog_rt"), "orders-topic")
    (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.format("mqlog")
        .option("path", topic)
        .mode("append")
        .save()
    )
    back = spark.read.format("mqlog").option("path", topic).load()
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(dec("o_totalprice")).cast("double").alias("total"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# WordCount — the reference's flagship (and only) end-to-end query, in
# batch form (the streaming twin over the mq source is
# streaming/pipelines.py::q_stream_mq_wordcount). The reference runs it as
# flatMap(split)+groupBy+count over its source (/root/reference/
# README.md:64-124); here explode(split()) keeps the 1->N tokenization
# inside Catalyst — no per-row Python.
# Scale: token explosion is map-side; the single shuffle is the partial-agg
# count on the token key; top-k is TakeOrderedAndProject, never a full sort.
# --------------------------------------------------------------------------


@register(
    "q_wordcount_topk",
    """
    SELECT w AS word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents)
    WHERE w <> ''
    GROUP BY w
    ORDER BY cnt DESC, word
    LIMIT 100
    """,
    headline=True,
    doc="WordCount (reference README.md:64-124 demo) as a batch top-k.",
)
def q_wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.trim("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Map functions (SURVEY.md §2.4 scalar-fns row: .../map/...): construction,
# concat, higher-order filter/transform, key enumeration, lookup — all
# codegen/JVM-side. The oracle states the expected VALUES directly (DuckDB
# maps have different construction syntax; the check is on results, and
# every output is a deterministic function of the row).
# --------------------------------------------------------------------------


@register(
    "q_map_functions",
    """
    SELECT event_id,
           3 AS n_keys,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_val,
           'day,k,type' AS keys_csv,
           upper(event_type) AS type_upper
    FROM events
    WHERE event_id < 200
    ORDER BY event_id
    """,
    doc="map functions: create_map/map_concat/map_filter/transform_values/"
    "map_keys/element_at, all JVM-side.",
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("event_id") < 200)
    base = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    m = F.map_concat(base, F.create_map(F.lit("day"), F.date_format("ts", "yyyy-MM-dd")))
    upper_vals = F.transform_values(m, lambda k, v: F.upper(v))
    return ev.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.element_at(F.map_filter(m, lambda k, v: k == F.lit("k")), "k").alias("k_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(upper_vals, "type").alias("type_upper"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# Approximate percentile (KLL/GK sketch) with its error bound encoded in
# the result — the approx-agg pattern shared with q_approx_distinct_parts:
# the sketch estimate is engine-specific, so the hash check covers (a) the
# exact interpolated percentile computed alongside and (b) a boolean that
# the estimate landed within 2% of it. At scale the sketch is the only
# viable plan: it is one pass, mergeable map-side, O(accuracy) memory per
# group vs the exact path's full sort per group.
# --------------------------------------------------------------------------


@register(
    "q_approx_percentile_bounds",
    """
    SELECT l_returnflag,
           CAST(floor(quantile_cont(l_extendedprice, 0.50) * 1048576.0 + 0.5)
                AS BIGINT) AS exact_p50_q20,
           TRUE AS within_2pct
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    doc="percentile_approx (accuracy 10000) per group, checked against the "
    "exact interpolated median computed alongside; the 2% bound rides in "
    "the result row so the sketch's correctness is hash-verified. The "
    "exact median is exported through the repo's Q20 quantization "
    "(floor(x*2^20+0.5)) so a last-ulp interpolation difference between "
    "Spark's percentile and DuckDB's quantile_cont cannot flip the hash "
    "(ADVICE r05 item 1).",
)
def q_approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.50)).alias("exact_p50"),
            F.percentile_approx("l_extendedprice", F.lit(0.50), F.lit(10000)).alias(
                "_approx"
            ),
        )
        .select(
            "l_returnflag",
            F.floor(F.col("exact_p50") * F.lit(1048576.0) + F.lit(0.5))
            .cast("bigint")
            .alias("exact_p50_q20"),
            (
                F.abs(F.col("_approx") - F.col("exact_p50")) / F.col("exact_p50")
                < F.lit(0.02)
            ).alias("within_2pct"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Time-RANGE window frame: rolling 24 h average per user. RANGE frames are
# value-based (every row whose order key falls in [key-86400, key] joins
# the frame) — the surface ROWS frames cannot express when events are
# irregularly spaced. Order key is floor-seconds on BOTH engines (Spark's
# unix_timestamp truncates; DuckDB's epoch() keeps fractions — flooring
# pins identical frame membership for ties). The windowed sum uses the
# repo's decimal convention so frame-internal accumulation order can't
# leak into the double.
# --------------------------------------------------------------------------


@register(
    "q_window_time_range_avg",
    """
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                  OVER (PARTITION BY user_id
                        ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                        RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
                AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY user_id
                            ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                            RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
             AS avg_24h
    FROM events WHERE user_id < 5
    ORDER BY user_id, ts_s
    """,
    doc="time-RANGE window frame: per-user rolling 24h average over "
    "irregular event times (value-based frame, not ROWS); floor-seconds "
    "order key and decimal frame sums keep both engines bit-identical.",
)
def q_window_time_range_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").where(F.col("user_id") < 5)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-86400, 0)
    )
    return (
        ev.select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
                / F.count("*").over(w)
            ).alias("avg_24h"),
        )
        .orderBy("user_id", "ts_s")
    )


# --------------------------------------------------------------------------
# UNPIVOT (melt): the inverse of the daily pivot — wide per-type count
# columns back to (day, event_type, n) long form. Spark 4's native
# DataFrame.unpivot; the oracle reconstructs the same full grid (including
# explicit zeros, which a bare GROUP BY would drop) relationally.
# --------------------------------------------------------------------------


@register(
    "q_unpivot_daily",
    # the type grid is the SAME pinned _EVENT_TYPES list the Spark pivot
    # uses — deriving it from the data (SELECT DISTINCT) would make the
    # two sides equal only by fixture accident (code-review finding: a
    # slice missing one type would zero-fill on the Spark side only)
    f"""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    types AS (SELECT * FROM (VALUES {", ".join(f"('{t}')" for t in _EVENT_TYPES)})
              AS v(event_type)),
    counts AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT days.day, types.event_type,
           CAST(COALESCE(counts.n, 0) AS BIGINT) AS n
    FROM days CROSS JOIN types
    LEFT JOIN counts ON counts.day = days.day
                    AND counts.event_type = types.event_type
    ORDER BY days.day, types.event_type
    """,
    doc="UNPIVOT/melt: the wide daily pivot flipped back to long form via "
    "DataFrame.unpivot, zeros preserved (the full day x type grid) — "
    "oracle rebuilds the grid relationally.",
)
def q_unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = _daily_wide_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            ids=["day"],
            values=list(_EVENT_TYPES),
            variableColumnName="event_type",
            valueColumnName="n",
        )
        .select("day", "event_type", F.col("n").cast("bigint").alias("n"))
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------
# Null semantics: explicit NULLS FIRST ordering and null-safe equality
# (<=> / IS NOT DISTINCT FROM). The hash compare is order-insensitive, so
# the null ORDERING is baked into a row_number value — engines that
# disagree on where NULLs sort (Spark default: first ASC; DuckDB default:
# last) produce different rn values unless the explicit NULLS FIRST is
# honored identically.
# --------------------------------------------------------------------------


@register(
    "q_null_semantics",
    """
    WITH s AS (
      SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
      FROM customer WHERE c_custkey < 200
    )
    SELECT c_custkey, seg,
           CAST(ROW_NUMBER() OVER (ORDER BY seg ASC NULLS FIRST, c_custkey)
                AS INTEGER) AS rn,
           (seg IS NOT DISTINCT FROM
              lag(seg) OVER (ORDER BY seg ASC NULLS FIRST, c_custkey))
             AS same_as_prev
    FROM s ORDER BY rn
    """,
    doc="null semantics: NULLS FIRST ordering baked into row_number values "
    "and null-safe equality (<=>) against a possibly-NULL lag — TRUE for "
    "NULL<=>NULL, which plain = can never produce. The unpartitioned "
    "window is demo-bounded by the c_custkey < 200 slice (a global total "
    "order is semantically global; at scale you'd partition or bucket it).",
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    s = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 200)
        .select(
            "c_custkey",
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        )
    )
    w = Window.orderBy(F.col("seg").asc_nulls_first(), "c_custkey")
    return (
        s.select(
            "c_custkey",
            "seg",
            F.row_number().over(w).cast("int").alias("rn"),
            F.col("seg").eqNullSafe(F.lag("seg").over(w)).alias("same_as_prev"),
        )
        .orderBy("rn")
    )


# --------------------------------------------------------------------------
# Ordered string aggregation: collect_list is NOT order-stable under
# parallel aggregation, so the portable pattern is collect structs ->
# sort_array -> slice -> join (deterministic regardless of partial-agg
# arrival order). DuckDB's string_agg(... ORDER BY) is the same contract.
# --------------------------------------------------------------------------


@register(
    "q_ordered_string_agg",
    """
    WITH ranked AS (
      SELECT n.n_name, c.c_name, c.c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_name
                                ORDER BY c.c_acctbal DESC, c.c_name) AS rk
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT n_name,
           string_agg(c_name, ',' ORDER BY c_acctbal DESC, c_name) AS top3
    FROM ranked WHERE rk <= 3
    GROUP BY n_name ORDER BY n_name
    """,
    doc="ordered string aggregation: per-nation CSV of the top-3 customers "
    "by balance — collect structs, sort_array, array_join (order-stable "
    "under parallel partial aggregation, unlike bare collect_list).",
)
def q_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), "c_name")
    ranked = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
    )
    ordered = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.struct((-F.col("c_acctbal")).alias("negbal"), F.col("c_name").alias("nm")).alias("k"), F.col("c_name").alias("v")))
            ),
            lambda s: s["v"],
        ),
        ",",
    )
    return (
        ranked.groupBy("n_name")
        .agg(ordered.alias("top3"))
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Histogram binning via width_bucket — the bounded-cardinality summary
# every profiling pass runs: one scan, partial-aggregated counts over a
# fixed bucket domain.
# --------------------------------------------------------------------------


@register(
    "q_histogram_totalprice",
    # DuckDB has no width_bucket; the oracle spells out the same
    # fixed-domain bucket arithmetic (0 = underflow, 11 = overflow)
    """
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 500000 THEN 11
                     ELSE 1 + CAST(floor(o_totalprice / 50000.0) AS INTEGER)
                END AS INTEGER) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    doc="value histogram: width_bucket(o_totalprice, 0, 500000, 10) counts "
    "with per-bucket min/max — fixed bucket domain, one scan, map-side "
    "partial aggregation; oracle spells the bucket arithmetic out.",
)
def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(500000), F.lit(10))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Top-k session paths — the most common ordered event-type sequences per
# session (the clickstream "what do sessions look like" read-out, one
# level above q_event_transitions' order-1 matrix). Sessions use the same
# 30-minute-gap definition as q_events_sessionize; paths are truncated to
# the first PATH_MAX_EVENTS events so a runaway bot session cannot
# produce an unbounded group key.
#
# Scale: one user-partitioned window shuffle (shared shape with
# sessionize), one (user, session) aggregate whose collect_list is
# bounded by the truncation + human session length, then the path
# aggregate is tiny (distinct paths << sessions). Top-k plans as
# TakeOrderedAndProject — no global sort.
# --------------------------------------------------------------------------

PATH_MAX_EVENTS = 12


@register(
    "q_session_paths_topk",
    f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    ), paths AS (
      SELECT user_id, session_id,
             array_to_string(
               list_slice(list(event_type ORDER BY ts, event_id),
                          1, {PATH_MAX_EVENTS}), '>') AS path
      FROM sess GROUP BY user_id, session_id
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
    doc="top-20 most common session event paths (30-min-gap sessions, "
    "paths truncated to the first 12 events): one user-partitioned window "
    "shuffle + a bounded per-session collect, then a tiny path aggregate; "
    "top-k never global-sorts.",
)
def q_session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    new_session = F.when(
        (us - F.lag(us).over(order) > 1800 * 1_000_000)
        | F.lag("ts").over(order).isNull(),
        1,
    ).otherwise(0)
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        new_session.alias("new_session"),
    ).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_session").over(running).alias("session_id"),
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("ts", "event_id", "event_type"))
                        ),
                        lambda x: x["event_type"],
                    ),
                    1,
                    PATH_MAX_EVENTS,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Event debouncing — collapse rapid-fire repeats of the same action
# (double-clicks, retry storms, at-least-once producer duplicates) into
# one logical event: within each (user, event_type), an event belongs to
# the same BURST as its predecessor when the gap is <= 300 s; only the
# first event of each burst is kept. This is the batch twin of the
# stream's dropDuplicatesWithinWatermark, but with burst semantics
# (chained gaps extend the burst) and an exact oracle.
#
# Scale shape: one (user_id, event_type) shuffle; burst ids come from a
# running sum over the lag flags — both windows share the same
# partitioning, so Spark plans ONE exchange and two window passes.
# --------------------------------------------------------------------------

DEBOUNCE_GAP_S = 300


@register(
    "q_events_debounce",
    f"""
    WITH g AS (
      SELECT event_id, user_id, event_type, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                        > CAST({DEBOUNCE_GAP_S} AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END AS new_burst
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(SUM(new_burst) AS BIGINT) AS n_kept,
           CAST(SUM(1 - new_burst) AS BIGINT) AS n_dropped
    FROM g GROUP BY event_type ORDER BY event_type
    """,
    doc=f"event debouncing: within (user, type), chained gaps <= "
    f"{DEBOUNCE_GAP_S}s form one burst and only its first event "
    "survives (double-click / retry-storm / at-least-once collapse); "
    "one key shuffle, the lag flag and burst-id running sum share the "
    "same window partitioning.",
)
def q_events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        # microsecond gaps (the fixture's timestamps carry sub-second
        # micros): whole-second epochs would truncate a 300.5s gap to
        # 300 and mis-classify the boundary
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > DEBOUNCE_GAP_S * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_burst"),
    )
    return (
        g.groupBy("event_type")
        .agg(
            F.sum("new_burst").cast("bigint").alias("n_kept"),
            F.sum(1 - F.col("new_burst")).cast("bigint").alias("n_dropped"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# EQUI-DEPTH histogram (exact): the fixed-width q_histogram_totalprice
# answers "how do values spread over a known domain"; optimizers and
# data-profiling want the dual — boundaries that split the data into
# equal-count buckets. Exact equi-depth needs every row's global rank,
# and a partition-less ntile window would move the whole table through
# ONE task. This is the distributed two-level ranking (terasort shape):
# range-repartition on (value, unique key), rank LOCALLY per partition,
# then add each partition's exclusive prefix count — a bounded
# |partitions|-row collect — to make ranks global. The SQL-standard
# ntile arithmetic then assigns buckets from (rank, N) alone, so the
# result is bit-identical to a single-node ntile at any parallelism.
# --------------------------------------------------------------------------

HIST_EQ_BUCKETS = 16


def ntile_exact(
    df: DataFrame, val_col: str, key_col: str, buckets: int
) -> DataFrame:
    """(v, k, bucket): every row's SQL-standard ntile bucket over the total
    order (val, key) — ties break deterministically on the unique key.
    Exact distributed ntile: range repartition, pid-local ranks,
    |partitions|-row prefix offsets, integer-div bucket arithmetic."""
    parts = df.sparkSession.sparkContext.defaultParallelism
    t2 = df.select(
        F.col(val_col).alias("v"), F.col(key_col).alias("k")
    ).repartitionByRange(parts, "v", "k")
    ranked = t2.withColumn("pid", F.spark_partition_id()).withColumn(
        "lr",
        F.row_number().over(Window.partitionBy("pid").orderBy("v", "k")),
    )
    # Two consumers (the offset collect and the final join) must see ONE
    # materialization: repartitionByRange SAMPLES its boundaries, so a
    # re-execution may place rows in different pids — eager
    # localCheckpoint pins the assignment (blocks reclaimed on GC, the
    # repo's persist-lifetime convention).
    ranked = ranked.localCheckpoint(eager=True)
    # bounded: one row per partition; global correctness does not depend
    # on WHERE the range boundaries landed, only on per-partition counts
    cnts = sorted(
        (r["pid"], r["n"])
        for r in ranked.groupBy("pid").agg(F.count("*").alias("n")).collect()
    )
    total = sum(n for _, n in cnts)
    offs, acc = {}, 0
    for pid, n in cnts:
        offs[pid] = acc
        acc += n
    off_df = df.sparkSession.createDataFrame(
        [(p, o) for p, o in offs.items()], "pid int, off long"
    )
    q, r = divmod(total, buckets)
    # SQL-standard ntile from (rank, N) alone: the first r buckets hold
    # q+1 rows, the rest q. Integer `div` ceilings, never a double
    # division — exact at any rank magnitude (a 10^12-row table's ranks
    # do not fit a double's 53-bit mantissa).
    if q:
        bucket = F.expr(
            f"CASE WHEN off + lr <= {r} * {q + 1} "
            f"THEN (off + lr + {q}) DIV {q + 1} "
            f"ELSE {r} + (off + lr - {r} * {q + 1} + {q - 1}) DIV {q} END"
        )
    else:  # fewer rows than buckets: row rank IS the bucket
        bucket = F.expr("off + lr")
    return (
        ranked.join(F.broadcast(off_df), "pid")
        .withColumn("bucket", bucket.cast("int"))
        .select("v", "k", "bucket")
    )


def equidepth_histogram(
    df: DataFrame, val_col: str, key_col: str, buckets: int
) -> DataFrame:
    """(bucket, n, lo, hi) equal-count buckets of val_col — the histogram
    read-out over ntile_exact."""
    return (
        ntile_exact(df, val_col, key_col, buckets)
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


@register(
    "q_histogram_equidepth",
    f"""
    WITH b AS (
      SELECT o_totalprice AS v,
             ntile({HIST_EQ_BUCKETS})
               OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(v) AS DOUBLE) AS lo,
           CAST(MAX(v) AS DOUBLE) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc=f"exact equi-depth histogram ({HIST_EQ_BUCKETS} equal-count "
    "buckets of o_totalprice): distributed two-level ranking — range "
    "repartition, local row_number, |partitions|-row prefix offsets — "
    "bit-identical to a single-node ntile without ever moving the "
    "table through one task.",
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return equidepth_histogram(
        o, "o_totalprice", "o_orderkey", HIST_EQ_BUCKETS
    ).orderBy("bucket")


# --------------------------------------------------------------------------
# Interval overlap join (round 14): which users' sessions OVERLAP IN TIME —
# the concurrency / co-presence primitive behind fraud rings, shared-device
# detection, and load attribution. The spec is a quadratic theta-join
# (a.start <= b.end AND b.start <= a.end); the scale path is the standard
# time-binning rewrite: explode each interval into the coarse hour bins it
# spans, EQUI-join on the bin (overlapping intervals always share at least
# one bin — any point of the intersection lies in a bin both spans cover),
# dedup the candidate pair (one pair can share many bins), then re-check
# the exact predicate. Cost is O(Σ bins + bin collisions), never
# |sessions|² — the bin width tunes the collision rate against the
# per-interval explode factor.
#
# The ORACLE runs the naive quadratic form (it IS the spec, fine at
# fixture scale); the Spark side runs the binned rewrite — value equality
# proves the rewrite lossless. Bins are internal to the Spark side, so
# their epoch arithmetic needs no cross-engine agreement.
# --------------------------------------------------------------------------

OVERLAP_BIN_S = 3600  # 1-hour candidate bins


def session_intervals(ev: DataFrame) -> DataFrame:
    """(user_id, session_id, s_start, s_end) via the shared 30-min-gap
    sessionization (q_events_sessionize's definition)."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    new_session = F.when(
        (us - F.lag(us).over(order) > 1800 * 1_000_000)
        | F.lag("ts").over(order).isNull(),
        1,
    ).otherwise(0)
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id", "ts", "event_id", new_session.alias("new_session")
    ).select("user_id", "ts", F.sum("new_session").over(running).alias("session_id"))
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )


# The quadratic theta-join spec — shared by the batch overlap join and
# its streaming twin (streaming/pipelines.py q_stream_sessions_overlap).
_SQL_OVERLAP_PAIRS = """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    ), iv AS (
      SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM sess GROUP BY user_id, session_id
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id
     AND a.s_start <= b.s_end AND b.s_start <= a.s_end
    GROUP BY 1, 2
    ORDER BY 1, 2
    """


@register(
    "q_sessions_overlap_pairs",
    _SQL_OVERLAP_PAIRS,
    doc="interval overlap join: cross-user session pairs overlapping in "
    "time (co-presence / shared-device primitive), counted per user pair. "
    "Oracle = the quadratic theta-join spec; Spark = the time-binning "
    "rewrite (hour-bin explode -> bin EQUI-join -> pair dedup -> exact "
    "re-check), O(bins + collisions) instead of |sessions|^2 — value "
    "equality proves the rewrite lossless.",
)
def q_sessions_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = session_intervals(t(spark, sf_dir, "events"))
    return overlap_pairs(iv, OVERLAP_BIN_S).orderBy("user_a", "user_b")


def _interval_bins(iv: DataFrame, bin_s: int) -> DataFrame:
    """Explode each (user_id, session_id, s_start, s_end) interval into
    the bin_s-second candidate bins it spans."""
    return iv.select(
        "user_id",
        "session_id",
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros("s_start") / (bin_s * 1_000_000)),
                F.floor(F.unix_micros("s_end") / (bin_s * 1_000_000)),
            )
        ).alias("bin"),
    )


def overlap_pairs(iv: DataFrame, bin_s: int = OVERLAP_BIN_S) -> DataFrame:
    """(user_a, user_b, n_overlaps) — the lossless time-binning rewrite of
    the quadratic interval-overlap spec, over any (user_id, session_id,
    s_start, s_end) interval table. ``bin_s`` is the candidate-bin width:
    ANY width gives the same answer (overlapping intervals share at least
    one bin at every width — property-pinned), it only tunes cost:
    coarse bins mean fewer explode rows but more false candidates in hot
    bins; fine bins cut hot-bin collisions at the price of longer
    per-interval bin lists. q_sessions_overlap_hotbins is the read-out
    that says which way to turn the knob."""
    binned = _interval_bins(iv, bin_s)
    a = binned.select(
        F.col("user_id").alias("ua"),
        F.col("session_id").alias("sa"),
        F.col("s_start").alias("a_start"),
        F.col("s_end").alias("a_end"),
        "bin",
    )
    b = binned.select(
        F.col("user_id").alias("ub"),
        F.col("session_id").alias("sb"),
        F.col("s_start").alias("b_start"),
        F.col("s_end").alias("b_end"),
        "bin",
    )
    pairs = (
        a.join(b, "bin")
        .where(F.col("ua") < F.col("ub"))
        # one pair can share many bins: dedup BEFORE counting
        .select("ua", "sa", "ub", "sb", "a_start", "a_end", "b_start", "b_end")
        .distinct()
        # bins are coarse — re-check the exact overlap predicate
        .where(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
    )
    return pairs.groupBy(
        F.col("ua").alias("user_a"), F.col("ub").alias("user_b")
    ).agg(F.count("*").cast("bigint").alias("n_overlaps"))


# --------------------------------------------------------------------------
# Hot-bin diagnostic for the interval overlap join (round 15, VERDICT r14
# missing 3): at web scale a peak-hour bin holds ~every concurrently
# active session, and that bin's equi-join is locally quadratic in its
# occupancy — the rewrite's one skew exposure. The OUTPUT of the overlap
# join is inherently pairwise (mutually-overlapping sessions ARE ~n²/2
# real pairs), but the CANDIDATE set need not be: short non-overlapping
# sessions that merely share a coarse bin are pure waste, and shrinking
# bin_s removes exactly those. This read-out is the tuning signal: the
# hottest bins' occupancy and their candidate-pair mass (n·(n-1)/2 — what
# the equi-join will actually fan out). Occupancy ≈ truly-concurrent
# sessions ⇒ the bin is irreducible (the output itself is quadratic
# there); occupancy >> concurrency ⇒ shrink bin_s. Unlike the frame-DF
# cap, DROPPING a hot bin would lose real pairs (hot bins carry signal —
# peak-hour co-presence is the point), so the guard is a lossless knob +
# alarm, not a cap; the bin_s-invariance of the join is property-pinned
# on a constructed hot-bin corpus in tests/test_plans.py.
#
# Scale: one explode + one |bins|-row aggregate — no pair join runs here.
# --------------------------------------------------------------------------

OVERLAP_HOT_TOP = 5


@register(
    "q_sessions_overlap_hotbins",
    f"""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    ), iv AS (
      SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM sess GROUP BY user_id, session_id
    ), bins AS (
      SELECT unnest(generate_series(
               epoch_us(s_start) // {OVERLAP_BIN_S * 1_000_000},
               epoch_us(s_end) // {OVERLAP_BIN_S * 1_000_000})) AS bin
      FROM iv
    ), occ AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM bins GROUP BY bin
    )
    SELECT CAST(bin AS BIGINT) AS bin, n_sessions,
           CAST(n_sessions * (n_sessions - 1) // 2 AS BIGINT) AS candidate_pairs
    FROM occ
    ORDER BY n_sessions DESC, bin
    LIMIT {OVERLAP_HOT_TOP}
    """,
    doc=f"hot-bin diagnostic for the interval overlap join: the "
    f"top-{OVERLAP_HOT_TOP} hottest {OVERLAP_BIN_S}-second candidate bins "
    "by session occupancy with their candidate-pair mass n·(n-1)/2 — the "
    "skew alarm and bin-width tuning signal for the time-binning rewrite "
    "(occupancy >> true concurrency ⇒ shrink bin_s; the join itself is "
    "bin_s-invariant, property-pinned on a constructed hot-bin corpus); "
    "one explode + one |bins|-row aggregate, no pair join.",
)
def q_sessions_overlap_hotbins(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = session_intervals(t(spark, sf_dir, "events"))
    return overlap_hotbins(iv, OVERLAP_BIN_S, OVERLAP_HOT_TOP)


def overlap_hotbins(
    iv: DataFrame, bin_s: int = OVERLAP_BIN_S, top: int = OVERLAP_HOT_TOP
) -> DataFrame:
    """Top-N hottest candidate bins for the binned overlap join: (bin,
    n_sessions, candidate_pairs) ordered by occupancy; the per-bin
    equi-join cost read-out."""
    occ = (
        _interval_bins(iv, bin_s)
        .groupBy("bin")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
    )
    # global top-N over the bounded |bins|-row aggregate: TakeOrderedAndProject
    # (per-partition heaps), never a single-partition window
    return (
        occ.orderBy(F.desc("n_sessions"), F.asc("bin"))
        .limit(top)
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            "n_sessions",
            F.expr("n_sessions * (n_sessions - 1) DIV 2")
            .cast("bigint")
            .alias("candidate_pairs"),
        )
    )


# --------------------------------------------------------------------------
# Bin-width sweep for the overlap join (round 15): the tuning-knob
# read-out pattern (q_ann_ivf_pq_nprobe_sweep, q_dedup_threshold_sweep)
# applied to bin_s. For each candidate width: the explode factor
# (Σ per-interval bins — the row-multiplication cost), the bin count,
# the candidate-pair mass (Σ n·(n-1)/2 — what the equi-join fans out),
# and the TRUE pair count computed through that width's own rewrite —
# identical in every row, proving bin_s-invariance inside the sweep
# itself while the cost columns expose the trade: fine bins multiply
# explode rows, coarse bins multiply false candidates. Pick the knee.
#
# Scale: per width one explode + two bounded aggregates + the binned
# join; a production sweep runs on a sampled day, not the firehose —
# the knob read-out is an offline audit, like the nprobe sweep.
# --------------------------------------------------------------------------

OVERLAP_SWEEP_BINS = (900, 3600, 14400)


def _overlap_sweep_oracle() -> str:
    per_width = [
        f"""
    SELECT CAST({w} AS BIGINT) AS bin_s,
           (SELECT CAST(COUNT(DISTINCT bin) AS BIGINT) FROM bw{w}) AS n_bins,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bw{w}) AS n_explode_rows,
           (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT)
            FROM (SELECT COUNT(*) AS n FROM bw{w} GROUP BY bin))
             AS candidate_pairs,
           (SELECT true_pairs FROM tp) AS true_pairs
    """
        for w in OVERLAP_SWEEP_BINS
    ]
    bw_ctes = ",\n".join(
        f"""bw{w} AS (
      SELECT unnest(generate_series(
               epoch_us(s_start) // {w * 1_000_000},
               epoch_us(s_end) // {w * 1_000_000})) AS bin
      FROM iv
    )"""
        for w in OVERLAP_SWEEP_BINS
    )
    selects = "\n    UNION ALL\n".join(per_width)
    return f"""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    ), iv AS (
      SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM sess GROUP BY user_id, session_id
    ), tp AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS true_pairs
      FROM iv a JOIN iv b
        ON a.user_id < b.user_id
       AND a.s_start <= b.s_end AND b.s_start <= a.s_end
    ),
    {bw_ctes}
    {selects}
    ORDER BY bin_s
    """


@register(
    "q_overlap_bin_sweep",
    _overlap_sweep_oracle(),
    doc=f"bin-width sweep for the interval overlap join (the nprobe-sweep "
    f"pattern on the bin_s knob): for each width in {OVERLAP_SWEEP_BINS} "
    "the explode factor, bin count, candidate-pair mass, and the true "
    "pair count computed through THAT width's own rewrite — constant "
    "across rows, proving bin_s-invariance in-query while the cost "
    "columns expose the fine-bins-multiply-explode vs "
    "coarse-bins-multiply-candidates trade; oracle's true_pairs is the "
    "quadratic spec, so every width is value-proven lossless.",
)
def q_overlap_bin_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = session_intervals(t(spark, sf_dir, "events")).localCheckpoint(
        eager=True
    )  # reused by 3 widths x (bins agg + pair join) — sever the lineage once
    rows = []
    for w in OVERLAP_SWEEP_BINS:
        b = _interval_bins(iv, w)
        [agg] = (
            b.agg(
                F.count("*").cast("bigint").alias("n_explode_rows"),
                F.countDistinct("bin").cast("bigint").alias("n_bins"),
            ).collect()
        )  # bounded: 1 row
        [cand] = (
            b.groupBy("bin")
            .agg(F.count("*").alias("n"))
            .agg(
                F.sum(F.expr("n * (n - 1) DIV 2")).cast("bigint").alias("cp")
            )
            .collect()
        )  # bounded: 1 row
        [tp_row] = (
            overlap_pairs(iv, w)
            # SUM over zero pairs is NULL — report true_pairs=0, not a crash
            .agg(
                F.coalesce(F.sum("n_overlaps"), F.lit(0))
                .cast("bigint")
                .alias("tp")
            )
            .collect()
        )  # bounded: 1 row — the width's own rewrite proves invariance
        rows.append(
            (
                w,
                int(agg["n_bins"]),
                int(agg["n_explode_rows"]),
                int(cand["cp"]),
                int(tp_row["tp"]),
            )
        )
    return spark.createDataFrame(
        rows,
        "bin_s bigint, n_bins bigint, n_explode_rows bigint, "
        "candidate_pairs bigint, true_pairs bigint",
    ).orderBy("bin_s")
