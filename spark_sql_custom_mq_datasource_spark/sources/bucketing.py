"""Bucketed-table layout: pay the shuffle once at write time, join free
forever after.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders on
orderkey) is the shuffle of both sides. Spark's bucketed tables
(``bucketBy(n, key)`` + ``sortBy(key)``) persist the hash-partitioned,
per-bucket-sorted layout, so every later sort-merge join on the bucket key
needs NO Exchange and NO Sort — the scan itself satisfies the join's
distribution and ordering requirements. This is the batch analogue of the
MQ source's partition→task alignment (one bucket ↔ one task), and the
standard layout investment for tables that are joined on the same key by
many queries.

The reference has no storage layer at all (its write path throws,
/root/reference/src/main/java/org/example/CustomTable.java:52-54); this
module is part of the batch-analytics surface BASELINE.json mandates.

Bucket-count choice at scale: buckets ≈ table_size / target_task_input
(128-256 MiB); both join sides MUST use the same count (or a multiple,
with spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..plans.util import REVENUE_SQL, revenue, session_key, t

# Bucketed copies live inside the repo (external-table paths), keyed by
# (sf_dir, table) so scale factors never collide; the session catalog entry
# is recreated idempotently per session.
def _process_warehouse() -> str:
    """Per-PROCESS warehouse for catalog-registered layouts (the
    bucketed tables). The old in-repo `.bucketed` dir was SHARED across
    processes while every session rewrote it in overwrite mode — two
    concurrent drivers on one machine (pytest alongside a verify
    battery, the exact scenario ADVICE r08 item 5 fixed for work_dir)
    clobbered each other's live files mid-read (observed: a
    FILE_NOT_EXIST on a bucketed part file during a concurrent run,
    round 16). Bucketed data must be registered through saveAsTable (the
    bucket spec lives in the catalog), so the atomic-rename fixture
    cache does not apply; process-private paths remove the race instead,
    at the cost of one cheap per-process projection rebuild. The root
    lives under the pid-discriminated work tree, so dead processes'
    copies are garbage-collected on the next work_dir() use."""
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_work_{os.getpid()}", "bucketed"
    )
    os.makedirs(root, exist_ok=True)
    return root


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    path: str | None = None,
) -> None:
    """Persist df as a bucketed+sorted external parquet table."""
    (
        df.write.mode("overwrite")
        .option("path", path or os.path.join(_process_warehouse(), table))
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


_prepared: set[tuple[int, str]] = set()


def bucketed_pair(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> tuple[DataFrame, DataFrame]:
    """lineitem + orders bucketed by orderkey (written once per
    session+sf_dir, into the process-private warehouse).

    Only the join-relevant columns are written — at 100 TB the bucketed
    copy is a projection of the fact table, not a second full copy."""
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    li_name, o_name = f"lineitem_b_{tag}", f"orders_b_{tag}"
    key = (session_key(spark), sf_dir)
    if key not in _prepared:
        wh = _process_warehouse()
        write_bucketed(
            t(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            li_name,
            "l_orderkey",
            num_buckets,
            path=os.path.join(wh, tag, "lineitem"),
        )
        write_bucketed(
            t(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority", "o_orderstatus"
            ),
            o_name,
            "o_orderkey",
            num_buckets,
            path=os.path.join(wh, tag, "orders"),
        )
        _prepared.add(key)
    return spark.table(li_name), spark.table(o_name)


@register(
    "q_bucketed_join_revenue",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="fact-fact join on pre-bucketed tables: sort-merge join with zero "
    "Exchange/Sort (layout satisfies distribution+ordering). The hint "
    "forces merge so the demo holds even where AQE would broadcast.",
)
def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = bucketed_pair(spark, sf_dir)
    return (
        li.hint("merge")
        .join(orders.where(F.col("o_orderstatus") == "F"),
              li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(revenue()).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Date-partitioned layout + partition pruning
# --------------------------------------------------------------------------
#
# The OTHER canonical storage investment besides bucketing: time-series
# facts written as dt=YYYY-MM-DD directory partitions, so a day-scoped
# query reads 1/Nth of the table — the scan plan carries the predicate as
# a PartitionFilter (directory pruning at planning time, zero data files
# of other days opened). At 100 TB with daily partitions this is the
# difference between scanning 100 TB and scanning ~3 TB for a 1-day query.
# The partition column is derived from the event wall-clock (to_date(ts)),
# which round-trips the session timezone, so the layout is tz-stable.

PRUNE_DAY = "2024-01-15"  # present at every fixture SF (events span Jan 2024)

_partitioned_paths: dict[str, str] = {}


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per source-fixture version) the events table
    date-partitioned; return the layout path.

    The path embeds a fingerprint of the source parquet (mtime+size), so a
    regenerated fixture — which HAS happened between rounds, see
    FIXTURES.md — gets a fresh layout instead of the _SUCCESS marker
    silently serving stale data against a fresh oracle."""
    if sf_dir not in _partitioned_paths:
        from ..plans.util import cached_fixture_dir
        from ..plans.util import t as load

        src = os.path.join(sf_dir, "events.parquet")
        st = os.stat(src)
        fp = f"{st.st_mtime_ns:x}_{st.st_size:x}"

        def build(path: str) -> None:
            ev = load(spark, sf_dir, "events").withColumn("dt", F.to_date("ts"))
            ev.write.mode("overwrite").partitionBy("dt").parquet(path)

        # the flock-guarded atomic-rename cache (plans/util): two
        # concurrent drivers can no longer race the first build or
        # overwrite a committed layout mid-read (round-16 hygiene — the
        # bucketed warehouse's race, closed here by the cache instead of
        # process-private copies since this layout needs no catalog)
        _partitioned_paths[sf_dir] = cached_fixture_dir(
            "events_by_day", sf_dir, f"events-by-day-v1 src={fp}", build
        )
    return _partitioned_paths[sf_dir]


@register(
    "q_partition_pruned_day",
    f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) = DATE '{PRUNE_DAY}'
    GROUP BY event_type ORDER BY event_type
    """,
    doc="date-partitioned parquet layout + partition pruning: the day "
    "filter is a PartitionFilter (directory pruning at planning time), so "
    "the scan opens only that day's files; oracle is the same aggregate "
    "over the unpartitioned table.",
)
def q_partition_pruned_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = partitioned_events_path(spark, sf_dir)
    ev = spark.read.parquet(path).where(F.col("dt") == F.lit(PRUNE_DAY).cast("date"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Z-order clustered layout: multi-dimensional data skipping.
#
# Partition pruning (above) skips on ONE directory dimension; a z-order
# sort makes parquet ROW-GROUP min/max statistics tight on SEVERAL
# columns at once, so a scan with predicates on any clustered column
# skips most row groups (the Delta/Iceberg OPTIMIZE ZORDER technique,
# reproduced on plain parquet). The mechanism: interleave the bits of
# the (range-bucketed) cluster columns into one z-value, range-partition
# + sort by it at write time — points close in z are close in EVERY
# clustered dimension, so each row group covers a small axis-aligned box.
#
# At 100 TB this is the difference between "a (user, day-range) query
# scans the whole fact table" and "it touches the few row groups whose
# boxes intersect the query box" — with zero engine changes, because the
# parquet reader already evaluates pushed filters against row-group
# stats. The skip ratio is MEASURED, not assumed, in
# tests/test_operators.py::TestZOrderLayout via pyarrow footer stats.
# --------------------------------------------------------------------------

ZORDER_BITS = 16


def z_value(x, y, bits: int = ZORDER_BITS):
    """Interleave the low `bits` of two non-negative int columns: a pure
    codegen expression (2*bits shifts+masks), no UDF."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    xcol,
    ycol,
    files: int = 8,
    rowgroup_rows: int = 512,
) -> None:
    """Write df clustered by z(xcol, ycol): one range shuffle on the
    z-value, sorted within partitions, small row groups so stats are
    tight. At scale rowgroup_rows comes from the parquet default
    (~128 MB); the fixture pins a small value so a 500-row table still
    has multiple row groups to skip."""
    zed = df.withColumn("_z", z_value(xcol, ycol))
    (
        zed.repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("parquet.block.size", str(rowgroup_rows * 256))
        .option("parquet.page.size", "4096")
        .parquet(path)
    )


@register(
    "q_zorder_point_range",
    """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
    FROM events
    WHERE user_id BETWEEN 10 AND 19
      AND CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-19'
    GROUP BY user_id ORDER BY user_id
    """,
    doc="multi-dimensional data skipping: events rewritten z-ordered on "
    "(user_id, day), then a (user-range x day-range) box query runs "
    "against the clustered copy — same answer as the raw table (the "
    "oracle), while row-group min/max stats let the scan skip most of "
    "the file (skip ratio measured in tests via pyarrow footers).",
)
def q_zorder_point_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.util import work_dir

    ev = t(spark, sf_dir, "events")
    path = os.path.join(work_dir("zorder_events"), "events")
    day = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
    write_zordered(
        ev, path, F.col("user_id").cast("bigint"), day.cast("bigint")
    )
    zev = spark.read.parquet(path)
    return (
        zev.where(
            F.col("user_id").between(10, 19)
            & F.to_date("ts").between(
                F.lit("2024-01-10").cast("date"), F.lit("2024-01-19").cast("date")
            )
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .orderBy("user_id")
    )
