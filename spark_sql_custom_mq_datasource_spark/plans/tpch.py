"""TPC-H-style relational queries over the fixture star schema.

Each query pairs an idiomatic-DataFrame plan with a DuckDB oracle. Scale
notes per query explain why the plan survives 100 TB: filters reach the
parquet scan (Catalyst pushdown), dimension joins are broadcast (no shuffle
of the fact table for small sides), aggregations are partial (map-side
combine) before the exchange, and top-k is rank-then-limit, never a global
collect.

The reference implements no relational operators itself (SURVEY.md §2.1 —
it is a source, not an engine); this module is the stock-Spark surface its
README demo composes with (SURVEY.md §2.2) widened to the BASELINE.json
target list (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import register
from .util import REVENUE_SQL, davg, dec, dsum, revenue, sql_davg, sql_dsum, t

# --------------------------------------------------------------------------
# Q1 — pricing summary report (flagship): scan-heavy grouped aggregation.
# Scale: filter pushed to parquet; 6 aggregates computed in one pass with
# map-side partial aggregation; output cardinality = |flag|x|status| (tiny).
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({REVENUE_SQL} * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc", 4, 2)},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    headline=True,
    doc="TPC-H Q1 analogue: grouped 8-aggregate scan of lineitem.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = revenue()
    charge = disc_price * (F.lit(1).cast("decimal(4,2)") + dec("l_tax", 4, 2))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc", 4, 2),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q3 — shipping priority: selective 3-way join + top-k by revenue.
# Scale: customer filter prunes the build side; orders/lineitem join shuffles
# on orderkey (the natural co-location key); top-k via orderBy+limit is
# executed as TakeOrderedAndProject (no global sort materialization).
# --------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
    doc="TPC-H Q3 analogue: selective join + grouped agg + top-k.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way star join.
# Scale: region/nation/customer/supplier are broadcast (dims ≪ fact); only
# orders⋈lineitem shuffles; the c_nationkey = s_nationkey condition is a
# post-join filter on broadcast columns, not an extra shuffle.
# --------------------------------------------------------------------------


@register(
    "q5_local_supplier",
    f"""
    SELECT n_name, CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    headline=True,
    doc="TPC-H Q5 analogue: 6-way star join, broadcast dims.",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# Top customers by revenue — join + agg + deterministic top-k.
# --------------------------------------------------------------------------


@register(
    "q_top_customers",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
           COUNT(*) AS order_cnt
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spent DESC, c_custkey
    LIMIT 20
    """,
    doc="join + agg + top-k (TakeOrderedAndProject).",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum("o_totalprice", "total_spent"),
            F.count("*").alias("order_cnt"),
        )
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Semi join — orders having at least one heavy line; count per priority.
# Scale: LEFT SEMI keeps only the probe side's columns — no row explosion,
# and Spark can use a broadcast/shuffled hash semi.
# --------------------------------------------------------------------------


@register(
    "q_semi_join_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="left-semi join (EXISTS) + grouped count.",
)
def q_semi_join_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    heavy = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Anti join — customers that never ordered, per nation.
# --------------------------------------------------------------------------


@register(
    "q_anti_join_idle_customers",
    """
    SELECT n_name, COUNT(*) AS idle_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="left-anti join (NOT IN) + broadcast dim join.",
)
def q_anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("idle_customers"))
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Outer join — nations with their (possibly zero) customer counts.
# --------------------------------------------------------------------------


@register(
    "q_outer_join_nation_customers",
    """
    SELECT n_name,
           COUNT(c_custkey) AS customer_cnt,
           CAST(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_acctbal
    FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="left outer join preserving unmatched dimension rows.",
)
def q_outer_join_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    return (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("customer_cnt"),
            F.coalesce(F.sum(dec("c_acctbal")), F.lit(0)).cast("double").alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# ROLLUP — hierarchical subtotals. GROUPING() flags disambiguate NULLs.
# --------------------------------------------------------------------------


@register(
    "q_rollup_returns",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS TINYINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS TINYINT) AS g_status,
           {sql_dsum("l_quantity", "sum_qty")},
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
    doc="rollup with grouping flags.",
)
def q_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            dsum("l_quantity", "sum_qty"),
            F.count("*").alias("cnt"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "cnt")
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# CUBE — all grouping combinations of status x priority.
# --------------------------------------------------------------------------


@register(
    "q_cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_prio,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
    doc="cube with grouping flags.",
)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_prio"),
            F.count("*").alias("cnt"),
            dsum("o_totalprice", "total"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "cnt", "total")
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


# --------------------------------------------------------------------------
# GROUPING SETS via the SQL entry point (the engine's second front door).
# --------------------------------------------------------------------------


@register(
    "q_grouping_sets_sql",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="GROUPING SETS through spark.sql().",
)
def q_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# DISTINCT aggregation — exact distinct counts per group.
# Scale: Spark expands distinct aggs into a two-phase plan; exact but
# shuffle-heavy — the approx variant below is the 100 TB path.
# --------------------------------------------------------------------------


@register(
    "q_distinct_parts_per_flag",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="multi count-distinct (Expand-based exact plan).",
)
def q_distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
        )
        .orderBy("l_returnflag")
    )


# approx_count_distinct: HLL++ sketch — the scale path for distinct counts.
# No oracle: DuckDB's approx algorithm differs; driver runs rows-only check.
@register(
    "q_approx_distinct_parts",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_5pct
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    doc="approx_count_distinct (HLL++, rsd=0.01). The estimate itself is "
    "engine-specific, so the hash check is on (a) the exact count computed "
    "alongside and (b) a boolean asserting the estimate landed within 5% "
    "of it — encoding the HLL error bound in the result "
    "(VERDICT.md r04 item 3).",
)
def q_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts")
                < F.lit(0.05)
            ).alias("within_5pct"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Set operations — UNION / INTERSECT / EXCEPT on customer activity.
# --------------------------------------------------------------------------


@register(
    "q_setops_active_customers",
    """
    WITH c97 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'),
         c98 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'),
         c99 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00')
    SELECT o_custkey FROM
      ((SELECT o_custkey FROM c97 INTERSECT SELECT o_custkey FROM c98)
       EXCEPT SELECT o_custkey FROM c99)
    ORDER BY o_custkey
    """,
    doc="intersect + except (distinct set semantics).",
)
def q_setops_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")

    def active(year: int) -> DataFrame:
        return orders.where(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        ).select("o_custkey").distinct()

    return active(1997).intersect(active(1998)).subtract(active(1999)).orderBy("o_custkey")


@register(
    "q_union_high_value",
    """
    SELECT k, src FROM (
      SELECT o_custkey AS k, 'big_order' AS src FROM orders WHERE o_totalprice > 450000
      UNION
      SELECT c_custkey AS k, 'rich' AS src FROM customer WHERE c_acctbal > 9900
    ) u
    ORDER BY k, src
    """,
    doc="union-distinct of heterogeneous sources.",
)
def q_union_high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    a = orders.where(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("k"), F.lit("big_order").alias("src")
    )
    b = cust.where(F.col("c_acctbal") > 9900).select(
        F.col("c_custkey").alias("k"), F.lit("rich").alias("src")
    )
    return a.unionByName(b).distinct().orderBy("k", "src")


# --------------------------------------------------------------------------
# Window functions — ranking, frames, lag.
# Scale: one shuffle per distinct partitioning; rank-filter top-k avoids any
# global sort of the fact table.
# --------------------------------------------------------------------------


@register(
    "q_window_top_parts_per_brand",
    f"""
    SELECT p_brand, p_partkey, revenue, rk FROM (
      SELECT p_brand, p_partkey,
             CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue,
             CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY CAST(SUM({REVENUE_SQL}) AS DOUBLE) DESC, p_partkey) AS INTEGER) AS rk
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_partkey
    ) WHERE rk <= 3
    ORDER BY p_brand, rk
    """,
    headline=True,
    doc="per-group top-k via row_number window.",
)
def q_window_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    # Aggregate-before-join: collapse lineitem to one row per partkey on a
    # single long key (map-side combine), then broadcast-join part onto the
    # |parts|-sized result. p_partkey determines p_brand, so grouping by
    # partkey alone is equivalent to the (brand, partkey) grouping.
    per_part = (
        li.groupBy("l_partkey")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("p_brand", "p_partkey", "revenue")
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        per_part.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "revenue", "rk")
        .orderBy("p_brand", "rk")
    )


@register(
    "q_window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderkey
    """,
    doc="running sum with explicit ROWS frame.",
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q_window_order_gaps",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS INT) AS gap_days
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderkey
    """,
    doc="lag() analytic — days between consecutive orders.",
)
def q_window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("gap_days"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q_window_rank_dense_ntile",
    """
    SELECT c_custkey, c_acctbal_r,
           CAST(RANK()       OVER (ORDER BY c_acctbal_r DESC, c_custkey) AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER (ORDER BY c_acctbal_r DESC, c_custkey) AS INTEGER) AS drnk,
           CAST(NTILE(4)     OVER (ORDER BY c_acctbal_r DESC, c_custkey) AS INTEGER) AS quartile
    FROM (SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal_r
          FROM customer WHERE c_custkey <= 200)
    ORDER BY rnk, c_custkey
    """,
    doc="rank / dense_rank / ntile over one ordering.",
)
def q_window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") <= 200)
        .select("c_custkey", dec("c_acctbal").cast("double").alias("c_acctbal_r"))
    )
    w = Window.orderBy(F.desc("c_acctbal_r"), F.asc("c_custkey"))
    return (
        cust.select(
            "c_custkey",
            "c_acctbal_r",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("rnk", "c_custkey")
    )


# --------------------------------------------------------------------------
# Scalar function surface — strings, dates, CASE, math in one projection.
# --------------------------------------------------------------------------


@register(
    "q_scalar_functions",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           substr(p_name, 1, 8) AS name8,
           CAST(length(p_name) AS INTEGER) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           CASE WHEN p_size >= 30 THEN 'large'
                WHEN p_size >= 10 THEN 'medium'
                ELSE 'small' END AS size_class,
           CAST(round(p_retailprice * 1.1, 2) AS DOUBLE) AS marked_up,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           p_partkey % 7 AS bucket7
    FROM part
    WHERE p_size BETWEEN 5 AND 45 AND p_name LIKE '%a%'
    ORDER BY p_partkey
    """,
    doc="string/math/CASE scalar functions in a pushdown-friendly projection.",
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return (
        part.where((F.col("p_size").between(5, 45)) & F.col("p_name").like("%a%"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.substring("p_name", 1, 8).alias("name8"),
            F.length("p_name").alias("name_len"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.when(F.col("p_size") >= 30, "large")
            .when(F.col("p_size") >= 10, "medium")
            .otherwise("small")
            .alias("size_class"),
            F.round(F.col("p_retailprice") * 1.1, 2).cast("double").alias("marked_up"),
            F.floor("p_retailprice").cast("bigint").alias("price_floor"),
            (F.col("p_partkey") % 7).alias("bucket7"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q_date_functions",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY yr, qtr
    ORDER BY yr, qtr
    """,
    doc="date-part extraction + grouped agg by derived keys.",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.quarter("o_orderdate").cast("int").alias("qtr"),
        )
        .agg(F.count("*").alias("cnt"), dsum("o_totalprice", "total"))
        .orderBy("yr", "qtr")
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery — nations' above-average-balance customers.
# --------------------------------------------------------------------------


@register(
    "q_subquery_above_avg",
    """
    SELECT c_custkey, c_nationkey
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = customer.c_nationkey)
    ORDER BY c_custkey
    """,
    doc="correlated scalar subquery (decorrelated by Catalyst into a join).",
)
def q_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = customer.c_nationkey)
        ORDER BY c_custkey
        """
    )
