"""TPC-H analogues Q2/Q8/Q11/Q12/Q16/Q20/Q21 — the partsupp family, adapted.

Completes the TPC-H surface started in plans/tpch.py / tpch2.py. The
fixtures have no `partsupp` table and no `l_shipmode` / `l_receiptdate` /
`l_commitdate` / `ps_availqty` columns, so these seven are re-derived over
the supplier↔part relationships that DO exist in `lineitem` — preserving
each query's judge-relevant operator shape (correlated MIN subquery,
ratio-of-sums by group, scalar-subquery HAVING, conditional aggregation,
NOT-IN subquery + distinct agg, grouped-HAVING semi join, double-correlated
EXISTS/NOT-EXISTS) while swapping the missing columns for available ones.
Fixture nations are NATION_k with n_regionkey = k % 5 (1 = AMERICA,
3 = EUROPE).

Numeric convention per plans/util.py: exact DECIMAL sums exported as
DOUBLE; ratios as one IEEE division of two identically-computed doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import register
from .util import REVENUE_SQL, dec, revenue, t

# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part. No partsupp ⇒ the part↔supplier
# catalog is DERIVED from lineitem (observed unit price = extendedprice /
# quantity); TPC-H Q2's correlated MIN subquery becomes a window MIN over
# the derived catalog — same semantics, one shuffle on l_partkey that the
# groupBy and the window REUSE (single exchange), instead of a per-row
# rescan. Dimension joins are all broadcasts.
# --------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    """
    WITH catalog AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
      SELECT l_partkey, l_suppkey, unit_cost,
             MIN(unit_cost) OVER (PARTITION BY l_partkey) AS best_cost
      FROM catalog
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, r.unit_cost
    FROM ranked r
    JOIN part p ON p.p_partkey = r.l_partkey
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE r.unit_cost = r.best_cost
      AND p.p_size <= 25 AND p.p_type = 'ECONOMY'
      AND n.n_regionkey = 3
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 analogue: min-unit-cost supplier per part via a "
    "lineitem-derived catalog + window MIN (correlated-subquery shape), "
    "EUROPE-region suppliers.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    catalog = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    ranked = catalog.withColumn(
        "best_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    ).where(F.col("unit_cost") == F.col("best_cost"))
    part = t(spark, sf_dir, "part").where(
        (F.col("p_size") <= 25) & (F.col("p_type") == "ECONOMY")
    )
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").where(F.col("n_regionkey") == 3)
    return (
        ranked.join(F.broadcast(part), ranked.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), ranked.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q8 — national market share: NATION_6's share of ECONOMY-part revenue
# sold to AMERICA-region customers, by order year. Share = ratio of two
# exact decimal sums (numerator NULL-if-absent), divided once in DOUBLE.
# Scale: lineitem⨝orders is the only shuffle join (both sides on
# orderkey); part/customer/supplier/nation all filter to dimension size
# and broadcast; the division runs on a handful of year rows.
# --------------------------------------------------------------------------


@register(
    "q8_market_share",
    f"""
    WITH flat AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             {REVENUE_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE n1.n_regionkey = 1
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_6' THEN volume END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM flat GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 analogue: supplier-nation market share by order year "
    "(ratio of exact decimal sums).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    cust_america = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.where(F.col("n_regionkey") == 1)),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
    )
    supp_nation = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    flat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(F.broadcast(cust_america), orders.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            revenue().alias("volume"),
            "supp_nation",
        )
    )
    return (
        flat.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_6", F.col("volume"))).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q11 — important part values: per-part revenue from one nation's
# suppliers, kept where it exceeds a fraction of that nation's total
# (scalar-subquery HAVING). The partsupp value column becomes summed
# extendedprice from lineitem.
# Scale: one groupBy(l_partkey) shuffle; the total is a second pass over
# the same filtered scan reduced to ONE row and broadcast — no driver
# collect; threshold compare is identical IEEE math in both engines.
# --------------------------------------------------------------------------


@register(
    "q11_important_parts",
    """
    WITH filtered AS (
      SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(18,2)) AS price
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey = 3
    ),
    pv AS (
      SELECT l_partkey AS partkey, CAST(SUM(price) AS DOUBLE) AS value
      FROM filtered GROUP BY l_partkey
    )
    SELECT partkey, value FROM pv
    WHERE value > (SELECT CAST(SUM(price) AS DOUBLE) * CAST(0.001 AS DOUBLE)
                   FROM filtered)
    ORDER BY value DESC, partkey
    """,
    doc="TPC-H Q11 analogue: per-part value with scalar-subquery HAVING "
    "threshold (0.1% of nation total).",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp3 = t(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 3)
    filtered = li.join(
        F.broadcast(supp3), li.l_suppkey == supp3.s_suppkey, "left_semi"
    ).select("l_partkey", dec("l_extendedprice").alias("price"))
    pv = filtered.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("price").cast("double").alias("value")
    )
    total = filtered.agg(
        (F.sum("price").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        pv.join(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("partkey", "value")
        .orderBy(F.desc("value"), "partkey")
    )


# --------------------------------------------------------------------------
# Q12 — priority counts by shipping class: lineitem⨝orders + conditional
# aggregation. Fixtures lack l_shipmode ⇒ l_returnflag is the class
# column; counts are exact integers.
# Scale: both join sides shuffle on orderkey once; the CASE aggregation is
# map-side partial before the 3-row final exchange.
# --------------------------------------------------------------------------


@register(
    "q12_priority_by_class",
    """
    SELECT l_returnflag AS ship_class,
           -- CAST: DuckDB promotes integer SUM to HUGEINT; Spark returns BIGINT
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 analogue: conditional priority counts per shipping "
    "class (l_returnflag stands in for the missing l_shipmode).",
)
def q12_priority_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# --------------------------------------------------------------------------
# Q16 — supplier diversity per part group: NOT-IN exclusion subquery +
# COUNT(DISTINCT). The partsupp relationship is observed from lineitem;
# the comment-based supplier blacklist becomes s_acctbal < 0.
# Scale: the distinct count shuffles (brand, type, size, suppkey) pairs —
# Spark expands distinct aggs into a two-phase plan automatically; the
# blacklist is dimension-sized and broadcast as an anti join.
# --------------------------------------------------------------------------


@register(
    "q16_supplier_diversity",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 10, 20, 30, 40, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < CAST(0 AS DOUBLE))
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 analogue: NOT-IN supplier exclusion + distinct supplier "
    "count per (brand, type, size).",
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 10, 20, 30, 40, 49)
    )
    bad = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0.0)
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(bad), F.col("l_suppkey") == bad.s_suppkey, "left_anti"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q20 — heavy PROMO shippers: semi join against a grouped-HAVING subquery
# (ps_availqty excess becomes shipped-quantity excess), EUROPE suppliers.
# Scale: the inner agg shuffles only (suppkey, qty) partials after a
# broadcast semi join on PROMO parts; the outer semi join is
# dimension-sized both sides.
# --------------------------------------------------------------------------


@register(
    "q20_heavy_promo_shippers",
    """
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_nationkey IN (3, 8, 13, 18, 23)
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(50 AS DECIMAL(18,2))
      )
    ORDER BY s_name
    """,
    doc="TPC-H Q20 analogue: grouped-HAVING subquery semi join — EUROPE "
    "suppliers who shipped >50 units of PROMO parts in 1997.",
)
def q20_heavy_promo_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    promo = t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(promo), li.l_partkey == promo.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .where(F.col("qty") > F.lit(50).cast("decimal(18,2)"))
    )
    supp = t(spark, sf_dir, "supplier").where(
        F.col("s_nationkey").isin(3, 8, 13, 18, 23)
    )
    return (
        supp.join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting, adapted: for finished orders,
# the supplier whose lineitem came back 'R' while OTHER suppliers on the
# same order did not — EXISTS(other supplier) AND NOT EXISTS(other
# supplier with 'R'), the double-correlated shape of Q21 with returnflag
# standing in for the missing commit/receipt dates.
# Scale: all three lineitem sides shuffle on l_orderkey (one exchange each,
# co-partitioned semi/anti hash joins); supplier is broadcast.
# --------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND s.s_nationkey IN (1, 6, 11, 16, 21)
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 analogue: sole-returning supplier on multi-supplier "
    "finished orders (EXISTS + NOT EXISTS double correlation), AMERICA "
    "suppliers.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier").where(
        F.col("s_nationkey").isin(1, 6, 11, 16, 21)
    )
    orders_f = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    waiting = (
        l1.join(
            orders_f, F.col("l1.l_orderkey") == orders_f.o_orderkey, "left_semi"
        )
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Full-outer + right joins — completing the equi-join surface
# (SURVEY.md §2.4 joins row: inner/left/RIGHT/FULL). Both sides are
# deliberately filtered so each has keys the other lacks, exercising both
# null-extension directions. Scale: both plans are plain shuffle equi
# joins; COALESCE of the two keys keeps the output key non-null.
# --------------------------------------------------------------------------


@register(
    "q_full_outer_join_balance",
    """
    WITH c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0),
    o AS (SELECT o_custkey, COUNT(*) AS n_urgent
          FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey)
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           CAST(c.c_acctbal AS DOUBLE) AS acctbal,
           o.n_urgent
    FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
    ORDER BY custkey
    """,
    doc="full outer join: overdrawn customers x urgent-order counts; "
    "unmatched rows survive from BOTH sides.",
)
def q_full_outer_join_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") < 0)
        .select("c_custkey", "c_acctbal")
    )
    urgent = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_urgent"))
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
            "n_urgent",
        )
        .orderBy("custkey")
    )


@register(
    "q_right_join_order_coverage",
    """
    SELECT c.c_custkey,
           c.c_mktsegment,
           COUNT(o.o_orderkey) AS n_big_orders
    FROM (SELECT * FROM orders WHERE o_totalprice > 200000) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    ORDER BY c.c_custkey
    """,
    doc="right join: every customer kept, big-order count null-safe "
    "(COUNT over the null-extended side = 0 for uncovered customers).",
)
def q_right_join_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    cust = t(spark, sf_dir, "customer")
    return (
        big.join(cust, big.o_custkey == cust.c_custkey, "right")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
        .orderBy("c_custkey")
    )
