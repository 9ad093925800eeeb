"""Custom join operators Spark lacks as primitives: as-of join and
bucketed range join (SURVEY.md §2.4 / the custom-operator mandate).

Both are compositions of existing DataFrame ops — no Catalyst surgery — and
both replace plans that would otherwise be quadratic:

  as-of join     union-marker + sort + last_value(ignoreNulls) over one
                 (key, time) window: ONE shuffle+sort, O(n log n), vs the
                 naive per-left-row greatest-subquery (a join explosion).
                 This is the standard streaming/时序 "enrich with latest
                 dimension state as of event time" operator.
  range join     bucketize both sides to integer buckets of the range
                 width, equi-join on bucket (candidates = same or adjacent
                 bucket), filter exactly. Turns a theta join — which Spark
                 executes as BroadcastNestedLoopJoin, O(n·m) — into a
                 shuffle-hash equi join whose fan-out is bounded by bucket
                 occupancy. The standard trick for interval/proximity joins
                 at scale.

Oracles: DuckDB has a native ASOF JOIN, and the range join oracle is the
plain theta join — both exactly comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..plans.util import materialize_small, t

# --------------------------------------------------------------------------
# Generic as-of join
# --------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_key: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the LATEST right row with
    right_ts <= left_ts and the same key (left rows keep all their columns).

    Implementation: tag both sides, union, sort each key partition by
    (ts, side) — side 0 (right) before side 1 (left) so a right row at
    exactly left_ts is visible — then carry payloads forward with
    last_value(ignoreNulls) and keep only left rows. One shuffle on key,
    one sort; no join node at all, so there is nothing to explode on
    skewed keys (a hot key costs its sort, not a cross product)."""
    right_key = right_key or key
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
    )
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "*",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_a_{c}")
            for c in payload_cols
        ],
    )
    return carried.where(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_a_{c}").alias(c) for c in payload_cols]
    )


@register(
    "q_asof_join_last_order",
    """
    WITH daily AS (
      SELECT o_custkey, o_orderdate,
             COUNT(*) AS n_orders_that_day, MAX(o_orderkey) AS max_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           strftime(d.o_orderdate, '%Y-%m-%d') AS last_order_day,
           d.n_orders_that_day, d.max_orderkey
    FROM events e
    ASOF LEFT JOIN daily d
      ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate
    ORDER BY e.event_id
    """,
    doc="as-of join: each event enriched with the user's latest order-day "
    "stats as of event time (union-marker + one window pass, no join node).",
)
def q_asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # pre-aggregate the right side to one row per (key, ts) so the as-of
    # pick is deterministic (no ties), mirroring the oracle's `daily` CTE
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.count("*").alias("n_orders_that_day"),
            F.max("o_orderkey").alias("max_orderkey"),
        )
    )
    out = asof_join(
        ev,
        daily,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderdate", "n_orders_that_day", "max_orderkey"],
        right_key="o_custkey",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_order_day"),
        "n_orders_that_day",
        "max_orderkey",
    ).orderBy("event_id")


# NOTE for the oracle above: asof_join's union has right-side rows carrying
# key = o_custkey; events.user_id is BIGINT and o_custkey BIGINT — same type,
# so the union is type-stable.


# --------------------------------------------------------------------------
# Bucketed range join
# --------------------------------------------------------------------------


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    width: float,
) -> DataFrame:
    """All (left, right) pairs with |left_val - right_val| <= width, via
    integer bucketing: a qualifying pair's buckets differ by at most 1, so
    candidates are the 3 adjacent buckets (left exploded to {b-1, b, b+1},
    equi-joined on the right's bucket), then filtered exactly. The theta
    join becomes a shuffle-hash equi join; fan-out is bucket occupancy,
    not |left|x|right|."""
    lb = left.withColumn(
        "_lb",
        F.explode(
            F.array(
                *[
                    (F.floor(F.col(left_val) / F.lit(width)) + d).cast("bigint")
                    for d in (-1, 0, 1)
                ]
            )
        ),
    )
    rb = right.withColumn("_rb", F.floor(F.col(right_val) / F.lit(width)).cast("bigint"))
    return (
        lb.join(rb, lb._lb == rb._rb)
        .where(F.abs(F.col(left_val) - F.col(right_val)) <= width)
        .drop("_lb", "_rb")
    )


@register(
    "q_range_join_acctbal",
    """
    SELECT s.s_suppkey, COUNT(*) AS n_customers,
           MIN(c.c_custkey) AS min_custkey, MAX(c.c_custkey) AS max_custkey
    FROM supplier s JOIN customer c
      ON abs(c.c_acctbal - s.s_acctbal) <= CAST(5.0 AS DOUBLE)
    GROUP BY s.s_suppkey
    ORDER BY s.s_suppkey
    """,
    doc="bucketed range join: customers within +-5.0 account balance of "
    "each supplier (theta join -> equi join on width buckets).",
)
def q_range_join_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    pairs = range_join_bucketed(cust, supp, "c_acctbal", "s_acctbal", 5.0)
    return (
        pairs.groupBy("s_suppkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_custkey").alias("min_custkey"),
            F.max("c_custkey").alias("max_custkey"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Salted join (skew mitigation)
# --------------------------------------------------------------------------


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    num_salts: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: scatter the big side's hot keys across
    ``num_salts`` sub-keys and replicate the small side once per salt.

    A plain shuffle join sends every row of a hot key to ONE reducer — at
    100 TB a single skewed key (a null-ish default, a bot user, a dominant
    event type) turns the join into a one-task straggler. Salting bounds
    per-task fan-in at |hot key| / num_salts at the cost of a small-side
    replication factor of num_salts, which is the right trade whenever the
    small side is dimension-sized but too big (or too mid-plan) to
    broadcast. AQE's skew-join split handles *sort-merge* skew after the
    fact; salting is the declarative form that also covers hash joins and
    composes with any downstream agg.

    The salt on the big side is rand(seed)-derived: correctness never
    depends on WHICH salt a row gets (the small side carries every salt),
    so any deterministic-enough scatter works and a seeded rand is the
    cheapest uniform one. Supported ``how``: inner / left — each big row
    holds exactly one salt and the small side holds all of them, so join
    multiplicity is preserved exactly.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    ns = num_salts or big.sparkSession.sparkContext.defaultParallelism
    salted_big = big.withColumn("_salt", (F.rand(42) * ns).cast("int"))
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(ns)]))
    )
    return salted_big.join(replicated, [*keys, "_salt"], how).drop("_salt")


@register(
    "q_salted_join_event_stats",
    """
    WITH d AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value)
               AS type_avg
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, strftime(e.ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
           CAST(SUM(CAST(e.value - d.type_avg AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*) AS avg_dev
    FROM events e JOIN d USING (event_type)
    GROUP BY e.event_type, strftime(e.ts, '%Y-%m-%d')
    ORDER BY event_type, day
    """,
    doc="salted join: events (5 hot event_type keys - maximal skew) "
    "enriched with per-type averages; oracle is the plain join.",
)
def q_salted_join_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.util import dec, davg

    ev = t(spark, sf_dir, "events").select("event_type", "ts", "value")
    dim = ev.groupBy("event_type").agg(davg("value", "type_avg", 18, 6))
    joined = salted_join(ev, dim, "event_type", num_salts=8)
    return (
        joined.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(dec(F.col("value") - F.col("type_avg"), 18, 6)).cast("double")
                / F.count("*")
            ).alias("avg_dev"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# Runtime bitmap-filter join (explicit bloom-style pre-filter)
# --------------------------------------------------------------------------

RF_BUCKETS = 1 << 16  # bitmap domain: bounded broadcast regardless of dim size


def runtime_filter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
) -> DataFrame:
    """Equi-join with an explicit runtime membership pre-filter on the fact.

    The dim side's join keys are projected to hash(key) mod RF_BUCKETS and
    de-duplicated — a <=65536-row "bitmap" that stays broadcastable no
    matter how many keys the dim has (the point where broadcasting the keys
    themselves stops being possible). The fact is pre-filtered by a
    broadcast LEFT SEMI on the bucket BEFORE the shuffle join, so rows that
    cannot match never enter the exchange: at 100 TB, shuffle bytes drop by
    the dim's selectivity (false-positive rate <= |dim keys| / 65536).
    The exact equi-join afterwards removes bucket collisions, making the
    pre-filter semantically transparent — which is why the oracle is the
    plain join. This is the hand-rolled twin of Spark's own
    spark.sql.optimizer.runtime.bloomFilter.enabled rewrite; explicit
    because the optimizer's heuristic declines small-looking plans and
    cannot see through non-file sources."""
    buckets = dim.select(
        F.pmod(F.hash(F.col(dim_key)), F.lit(RF_BUCKETS)).alias("_rb")
    ).distinct()
    pre = fact.join(
        F.broadcast(buckets),
        F.pmod(F.hash(F.col(fact_key)), F.lit(RF_BUCKETS)) == F.col("_rb"),
        "leftsemi",
    )
    return pre.join(dim, pre[fact_key] == dim[dim_key])


@register(
    "q_runtime_filter_join",
    """
    SELECT p.p_brand, l.l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand IN ('Brand#1', 'Brand#2')
    GROUP BY p.p_brand, l.l_returnflag
    ORDER BY p.p_brand, l.l_returnflag
    """,
    doc="runtime bitmap-filter join: lineitem pre-filtered by a broadcast "
    "<=65536-bucket hash bitmap of the selective part subset before the "
    "exact join; oracle is the plain join (the filter is transparent).",
)
def q_runtime_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.util import dec

    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    pt = (
        t(spark, sf_dir, "part")
        .where(F.col("p_brand").isin("Brand#1", "Brand#2"))
        .select("p_partkey", "p_brand")
    )
    joined = runtime_filter_join(li, pt, "l_partkey", "p_partkey")
    return (
        joined.groupBy("p_brand", "l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 4)
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("p_brand", "l_returnflag")
    )


# --------------------------------------------------------------------------
# Conversion attribution window: each purchase attributed to the user's
# LAST view within a lookback window — the marketing-attribution join
# every events warehouse runs. Built on the as-of join (union + one
# window pass, no join node), then a pure filter on the time delta:
# attribution adds zero shuffles beyond the as-of's single key sort.
# --------------------------------------------------------------------------

ATTRIBUTION_WINDOW_H = 24


@register(
    "q_attribution_last_view",
    f"""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    views AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    attr AS (
      SELECT p.event_id, p.user_id, p.ts,
             (SELECT MAX(v.ts) FROM views v
              WHERE v.user_id = p.user_id AND v.ts <= p.ts) AS last_view
      FROM purchases p
    )
    SELECT user_id, COUNT(*) AS n_purchases,
           CAST(SUM(CASE WHEN last_view IS NOT NULL
                          AND epoch_us(ts) - epoch_us(last_view)
                                <= CAST({ATTRIBUTION_WINDOW_H} AS BIGINT) * 3600 * 1000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS attributed
    FROM attr GROUP BY user_id ORDER BY user_id
    """,
    doc=f"last-touch attribution: each purchase matched to the user's "
    f"most recent view, attributed iff it falls within "
    f"{ATTRIBUTION_WINDOW_H}h — the as-of join (one key sort, no join "
    "node) plus a pure delta filter; per-user purchase/attribution "
    "counts.",
)
def q_attribution_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    out = asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="view_ts",
        payload_cols=["view_ts"],
    )
    window_us = ATTRIBUTION_WINDOW_H * 3600 * 1_000_000
    return (
        out.groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(
                F.when(
                    F.col("view_ts").isNotNull()
                    & (
                        F.unix_micros("ts") - F.unix_micros("view_ts")
                        <= window_us
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("attributed"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Join-key skew report — the diagnostic that DECIDES when the salted join
# above is worth its replication cost: per-key frequency share and the
# key's multiple of the average, for the top keys of a prospective join
# key. At 100 TB this is the first query an engineer runs before picking
# a join strategy (AQE skew-join thresholds are per-partition; this is
# the per-KEY view that predicts them).
#
# Scale: one groupBy(key) shuffle with map-side partial aggregation; the
# total and key-count come from a global-frame window over the SAME key
# aggregate (the single-scan pattern pinned for q_vocab_coverage), so
# the corpus is read once and never joined. Top-k plans as
# TakeOrderedAndProject.
# --------------------------------------------------------------------------

SKEW_TOP = 10


@register(
    "q_join_key_skew_report",
    f"""
    WITH c AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ),
    tot AS (SELECT SUM(cnt) AS n, COUNT(*) AS n_keys FROM c)
    SELECT user_id, cnt,
           CAST(floor(cnt * 1048576.0 / tot.n + 0.5) AS BIGINT) AS share_q20,
           CAST(floor(cnt * tot.n_keys * 1048576.0 / tot.n + 0.5) AS BIGINT)
             AS x_avg_q20
    FROM c CROSS JOIN tot
    ORDER BY cnt DESC, user_id
    LIMIT {SKEW_TOP}
    """,
    doc="join-key skew diagnostic: top-10 hottest events.user_id keys "
    "with corpus share and multiple-of-average (Q20) — one key shuffle "
    "into a persisted aggregate; top-k via TakeOrderedAndProject and "
    "totals via a broadcast 1-row scalar (no partition-less window).",
)
def q_join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, c = _join_key_skew_report_lazy(spark, sf_dir)
    # top-10 rows: materialize locally so the key aggregate's persist
    # doesn't outlive the query (ADVICE r07 item 2)
    return materialize_small(spark, out, c)


def _join_key_skew_report_lazy(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The lazy plan + its persisted intermediate (for plan tests and the
    registered wrapper, which materializes then unpersists)."""
    ev = t(spark, sf_dir, "events")
    # the key aggregate feeds the bounded top-k AND the 1-row totals;
    # a partition-less window here would move EVERY key through one
    # task (at 100 TB the key aggregate is itself huge) — instead the
    # top-k is TakeOrderedAndProject and the totals cross in broadcast
    c = ev.groupBy("user_id").agg(F.count("*").alias("cnt")).persist()
    tot = c.agg(
        F.sum("cnt").alias("n"), F.count("*").alias("n_keys")
    )
    q20 = F.lit(1048576.0)
    top = c.orderBy(F.desc("cnt"), F.asc("user_id")).limit(SKEW_TOP)
    out = (
        top.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            F.floor(F.col("cnt") * q20 / F.col("n") + F.lit(0.5))
            .cast("bigint")
            .alias("share_q20"),
            F.floor(
                F.col("cnt") * F.col("n_keys") * q20 / F.col("n") + F.lit(0.5)
            )
            .cast("bigint")
            .alias("x_avg_q20"),
        )
        .orderBy(F.desc("cnt"), F.asc("user_id"))
    )
    return out, c


# --------------------------------------------------------------------------
# Skew-safe exact distinct: the two-stage composite-key rewrite
# --------------------------------------------------------------------------


def distinct_count_two_stage(
    df: DataFrame, key: str, distinct_col: str
) -> DataFrame:
    """Exact per-key distinct count via the composite-key rewrite:
    stage 1 reduces on (key, distinct_col) — the shuffle spreads a hot
    key across |distinct values| reducers instead of funneling every
    row of that key through one task — stage 2 counts groups per key.
    A total-event count rides along free as SUM of the stage-1 partial
    counts (one scan, never a second pass over the fact).

    This is the explicit form of the planner's own distinct-aggregate
    expansion, registered as a first-class operator because at 100 TB
    you compose it by hand whenever a query needs BOTH the distinct
    count and other aggregates without a double scan."""
    s1 = df.groupBy(key, distinct_col).agg(F.count("*").alias("_cnt"))
    return s1.groupBy(key).agg(
        F.count("*").alias("n_distinct"),
        F.sum("_cnt").alias("n_rows"),
    )


@register(
    "q_distinct_users_skew_safe",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_distinct,
           COUNT(*) AS n_rows
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="skew-safe exact distinct users per event_type (5 maximally hot "
    "keys): two-stage composite-key rewrite — stage 1 reduces on "
    "(type, user), spreading each hot key across its user cardinality; "
    "stage 2 counts groups. Total rows ride along as a partial-count "
    "sum, so one scan serves both aggregates.",
)
def q_distinct_users_skew_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        distinct_count_two_stage(ev, "event_type", "user_id")
        .select("event_type", "n_distinct", "n_rows")
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Join-size estimation by key-universe sampling — the planning primitive
# behind "can we afford this join?". |A ⋈_k B| = Σ_k c_A(k)·c_B(k); a
# deterministic 1/S sample of the KEY UNIVERSE (md5(key) % S == 0 — the
# same keys on every engine and every run, no RNG) gives the unbiased
# estimator S · Σ_{sampled k} c_A(k)·c_B(k). At 100 TB the point is that
# the sample predicate pushes to the SCAN (rows of unsampled keys are
# never read past the filter), so the estimate costs 1/S of the count
# build; the registered query computes estimate AND exact in one
# aggregate to read the estimator's error out directly.
# --------------------------------------------------------------------------

JOIN_EST_MOD = 32  # 1/32 key-universe sample


@register(
    "q_join_size_estimate",
    f"""
    WITH c AS (
      SELECT user_id, COUNT(*) AS cnt,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 10))
                  AS BIGINT) % {JOIN_EST_MOD} = 0 AS sampled
      FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS exact_pairs,
           CAST({JOIN_EST_MOD} * SUM(CASE WHEN sampled THEN cnt * cnt
                                          ELSE 0 END) AS BIGINT) AS est_pairs,
           CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
             AS sampled_keys,
           CAST({JOIN_EST_MOD} * SUM(CASE WHEN sampled THEN cnt * cnt
                                          ELSE 0 END) AS DOUBLE)
             / SUM(cnt * cnt) AS ratio
    FROM c
    """,
    doc="join-size estimation: self-join cardinality of events on user_id "
    f"(Σ cnt²) vs the unbiased 1/{JOIN_EST_MOD} key-universe-sample "
    "estimate (md5-deterministic, engine-portable, RNG-free) — both from "
    "ONE key aggregate; at scale the sample predicate pushes to the scan "
    "and the exact leg is dropped.",
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    hkey = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 10), 16, 10
    ).cast("bigint")
    c = ev.groupBy("user_id").agg(F.count("*").alias("cnt")).withColumn(
        "sampled", F.pmod(hkey, F.lit(JOIN_EST_MOD)) == 0
    )
    sq = F.col("cnt") * F.col("cnt")
    est = F.lit(JOIN_EST_MOD) * F.sum(F.when(F.col("sampled"), sq).otherwise(0))
    return c.agg(
        F.sum(sq).cast("bigint").alias("exact_pairs"),
        est.cast("bigint").alias("est_pairs"),
        F.sum(F.when(F.col("sampled"), 1).otherwise(0))
        .cast("bigint")
        .alias("sampled_keys"),
        (est.cast("double") / F.sum(sq)).alias("ratio"),
    )
