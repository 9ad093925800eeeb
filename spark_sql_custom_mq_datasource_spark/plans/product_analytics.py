"""Product/event analytics operators over the events stream table:
rolling active-user counts, ordered funnels, cohort retention.

The classic clickstream trio every events warehouse serves. All three are
pure DataFrame compositions with deliberate scale shapes:

  * DAU/WAU — a distinct-over-sliding-window, which Spark window frames
    cannot express (no DISTINCT in a frame). Instead each (user, day)
    activity row is exploded to the <=7 future days it keeps the user
    "weekly active" for, then counted distinct per day: one bounded 7×
    fan-out and one shuffle, instead of a 7-way self-join of the fact.
  * Funnel — stage timestamps are sequential conditional aggregates
    (stage k's min ts AFTER the user's stage k-1 ts). Each pass is a
    type-filtered scan (predicate reaches the parquet scan) grouped by
    user; the stage tables are |users|-sized, joined back broadcast-free
    on the grouping key.
  * Cohort retention — first-seen week per user (one agg), joined back to
    the user's weekly activity; the matrix is |cohort × offset| tiny.

Oracles are the same logic in portable ANSI SQL (weeks are fixed 7-day
buckets from the fixture epoch, not locale week-starts, so both engines
agree by construction).

Reference parity note: the reference repo is a source-only mock MQ
(/root/reference/src/main/java/org/example/); the events analytics surface
comes from the BASELINE.json batch-analytics brief (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..plans.util import t

EPOCH = "2024-01-01"  # fixture epoch: week k = days [7k, 7k+7) from here
FUNNEL = ("view", "click", "purchase")


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()


@register(
    "q_rolling_dau_wau",
    headline=True,
    oracle="""
    WITH daily AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dau AS (SELECT day, COUNT(*) AS dau FROM daily GROUP BY day),
    contrib AS (
      SELECT DISTINCT user_id,
             unnest(generate_series(day, day + INTERVAL 6 DAY,
                                    INTERVAL 1 DAY))::DATE AS day
      FROM daily
    ),
    wau AS (SELECT day, COUNT(*) AS wau FROM contrib GROUP BY day)
    SELECT dau.day, dau.dau, wau.wau
    FROM dau JOIN wau ON dau.day = wau.day
    ORDER BY dau.day
    """,
    doc="rolling DAU/WAU: distinct-over-sliding-window via bounded 7-day "
    "contribution explode (window frames can't express DISTINCT) — one "
    "7x fan-out + one shuffle, never a self-join of the fact.",
)
def q_rolling_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    dau = daily.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = (
        daily.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("day"),
        )
        .distinct()
    )
    wau = contrib.groupBy("day").agg(F.count("*").alias("wau"))
    # inner join restricts to observed days (future contribution days of
    # the last week have no DAU row and drop out on both engines)
    return dau.join(wau, "day").select("day", "dau", "wau").orderBy("day")


@register(
    "q_funnel_stages",
    f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = '{FUNNEL[1]}' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = '{FUNNEL[2]}' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS stage, '{FUNNEL[0]}' AS event_type,
             (SELECT COUNT(*) FROM s1) AS users
      UNION ALL
      SELECT 2, '{FUNNEL[1]}', (SELECT COUNT(*) FROM s2)
      UNION ALL
      SELECT 3, '{FUNNEL[2]}', (SELECT COUNT(*) FROM s3)
    ) ORDER BY stage
    """,
    doc="ordered funnel view->click->purchase: per-stage min-ts-after-"
    "previous-stage conditional aggregates; each pass is a type-filtered "
    "scan grouped by user, stage tables are |users|-sized.",
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    stages: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, etype in enumerate(FUNNEL):
        step = ev.where(F.col("event_type") == etype)
        if prev is not None:
            step = step.join(prev, "user_id").where(F.col("ts") > F.col("_pt"))
        cur = step.groupBy("user_id").agg(F.min("ts").alias("_pt"))
        stages.append(cur)
        prev = cur
    counts = [s.agg(F.count("*").alias("users")) for s in stages]
    out = None
    for i, (etype, c) in enumerate(zip(FUNNEL, counts), start=1):
        row = c.select(
            F.lit(i).cast("int").alias("stage"),
            F.lit(etype).alias("event_type"),
            F.col("users"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("stage")


@register(
    "q_cohort_retention",
    f"""
    WITH weekly AS (
      SELECT DISTINCT user_id,
             CAST(floor(date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE)) / 7.0)
                  AS INTEGER) AS week
      FROM events
    ),
    first AS (SELECT user_id, MIN(week) AS cohort FROM weekly GROUP BY user_id)
    SELECT first.cohort, weekly.week - first.cohort AS offset,
           COUNT(*) AS users
    FROM weekly JOIN first ON weekly.user_id = first.user_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="cohort retention matrix: first-active fixed 7-day week per user "
    "(epoch-anchored, locale-free), joined to weekly activity; output is "
    "|cohorts x offsets| tiny.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    weekly = (
        ev.select(
            "user_id",
            # floor, not int-cast: CAST(double AS INT) truncates in Spark
            # but ROUNDS in DuckDB — floor is the portable bucket function
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.lit(EPOCH).cast("date")) / 7
            )
            .cast("int")
            .alias("week"),
        )
        .distinct()
    )
    first = weekly.groupBy("user_id").agg(F.min("week").alias("cohort"))
    return (
        weekly.join(first, "user_id")
        .groupBy("cohort", (F.col("week") - F.col("cohort")).alias("offset"))
        .agg(F.count("*").alias("users"))
        .orderBy("cohort", "offset")
    )
