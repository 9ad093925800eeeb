"""Edge-semantics tests for the custom join operators (operators/joins.py).
The oracle gate covers the bulk; these pin the boundary rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_sql_custom_mq_datasource_spark.operators.joins import (
    asof_join,
    range_join_bucketed,
)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 10, "e1"), (1, 20, "e2"), (2, 5, "e3")], "k long, ts long, ev string"
        )
        right = spark.createDataFrame(
            [(1, 10, "r@10"), (1, 15, "r@15"), (3, 1, "other")],
            "k long, rts long, payload string",
        )
        return left, right

    def test_latest_at_or_before(self, spark):
        left, right = self._frames(spark)
        out = {
            r["ev"]: r["payload"]
            for r in asof_join(
                left, right, key="k", left_ts="ts", right_ts="rts",
                payload_cols=["payload"],
            ).collect()
        }
        # e1 at ts=10: right row at exactly 10 is visible (<= semantics)
        assert out == {"e1": "r@10", "e2": "r@15", "e3": None}

    def test_left_rows_preserved(self, spark):
        left, right = self._frames(spark)
        assert (
            asof_join(
                left, right, key="k", left_ts="ts", right_ts="rts",
                payload_cols=["payload"],
            ).count()
            == left.count()
        )


class TestRangeJoinBucketed:
    def test_boundary_inclusive_and_cross_bucket(self, spark):
        left = spark.createDataFrame([(1, 0.0), (2, 9.9), (3, 100.0)], "lid long, v double")
        right = spark.createDataFrame(
            [(10, 5.0), (11, 10.1), (12, -5.0), (13, 50.0)], "rid long, w double"
        )
        # width 5: pairs with |v - w| <= 5
        got = {
            (r["lid"], r["rid"])
            for r in range_join_bucketed(left, right, "v", "w", 5.0).collect()
        }
        assert got == {(1, 10), (1, 12), (2, 10), (2, 11)}

    def test_exact_width_boundary(self, spark):
        left = spark.createDataFrame([(1, 0.0)], "lid long, v double")
        right = spark.createDataFrame([(10, 5.0), (11, 5.0001)], "rid long, w double")
        got = {
            r["rid"] for r in range_join_bucketed(left, right, "v", "w", 5.0).collect()
        }
        assert got == {10}  # |0-5| <= 5 in; 5.0001 out


class TestSaltedJoin:
    def _frames(self, spark):
        big = spark.createDataFrame(
            [(k, i) for k in ("hot", "cold") for i in range(50 if k == "hot" else 2)]
            + [("orphan", 0)],
            "k string, v long",
        )
        small = spark.createDataFrame(
            [("hot", 1.0), ("cold", 2.0), ("unmatched", 9.0)], "k string, w double"
        )
        return big, small

    def test_inner_equals_plain_join(self, spark):
        from spark_sql_custom_mq_datasource_spark.operators.joins import salted_join

        big, small = self._frames(spark)
        got = sorted(
            (r["k"], r["v"], r["w"])
            for r in salted_join(big, small, "k", num_salts=4).collect()
        )
        want = sorted(
            (r["k"], r["v"], r["w"]) for r in big.join(small, "k").collect()
        )
        assert got == want  # multiplicity preserved, no dup/loss from salting

    def test_left_preserves_unmatched(self, spark):
        from spark_sql_custom_mq_datasource_spark.operators.joins import salted_join

        big, small = self._frames(spark)
        out = salted_join(big, small, "k", num_salts=4, how="left").collect()
        assert len(out) == big.count()
        assert {r["w"] for r in out if r["k"] == "orphan"} == {None}


class TestRuntimeFilterJoin:
    def _frames(self, spark):
        fact = spark.createDataFrame(
            [(i, i * 10.0) for i in range(100)], "fk long, v double"
        )
        dim = spark.createDataFrame(
            [(5, "a"), (17, "b"), (99, "c"), (1000, "d")], "dk long, name string"
        )
        return fact, dim

    def test_matches_plain_join(self, spark):
        from spark_sql_custom_mq_datasource_spark.operators.joins import (
            runtime_filter_join,
        )

        fact, dim = self._frames(spark)
        got = sorted(
            (r["fk"], r["name"])
            for r in runtime_filter_join(fact, dim, "fk", "dk").collect()
        )
        want = sorted(
            (r["fk"], r["name"])
            for r in fact.join(dim, fact.fk == dim.dk).collect()
        )
        assert got == want == [(5, "a"), (17, "b"), (99, "c")]

    def test_prefilter_is_broadcast_before_exchange(self, spark):
        from spark_sql_custom_mq_datasource_spark.operators.joins import (
            runtime_filter_join,
        )

        fact, dim = self._frames(spark)
        plan = runtime_filter_join(fact, dim, "fk", "dk")._jdf.queryExecution(
        ).executedPlan().toString()
        # the semi pre-filter must be a broadcast (never a shuffle of fact)
        assert "LeftSemi, BuildRight" in plan and "Broadcast" in plan


class TestSkewReport:
    def test_share_and_multiple_of_average(self, spark, tmp_path):
        import datetime as dt

        from spark_sql_custom_mq_datasource_spark.operators.joins import (
            q_join_key_skew_report,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        # key 1 has 6 of 8 events across 3 keys: share 6/8, 2.25x the
        # (8/3) average; keys 2 and 3 have one each.
        rows = [(i, 1) for i in range(6)] + [(6, 2), (7, 3)]
        ev = spark.createDataFrame(
            [(e, u, dt.datetime(2024, 1, 1, 0, e)) for e, u in rows],
            "event_id long, user_id long, ts timestamp",
        )
        sf_dir = str(tmp_path)
        ev.write.parquet(f"{sf_dir}/events.parquet")
        _cache.clear()
        got = {
            r["user_id"]: (r["cnt"], r["share_q20"], r["x_avg_q20"])
            for r in q_join_key_skew_report(spark, sf_dir).collect()
        }
        _cache.clear()
        q20 = 1 << 20
        assert got[1] == (6, int(6 * q20 / 8 + 0.5), int(6 * 3 * q20 / 8 + 0.5))
        assert got[2][0] == 1 and got[3][0] == 1
