"""Event-analytics trio (plans/product_analytics.py): hand-computed laws
on tiny frames; the oracle gate covers the fixture-scale values."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, et, dt.datetime(2024, 1, d, h)) for u, et, d, h in rows],
        "user_id long, event_type string, ts timestamp",
    )


class TestFunnel:
    def test_stage_order_enforced(self, spark, tmp_path, monkeypatch):
        from spark_sql_custom_mq_datasource_spark.plans import product_analytics as pa
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        # u1 completes in order; u2 purchases BEFORE clicking (must not
        # count at stage 3); u3 only views.
        ev = _events(
            spark,
            [
                (1, "view", 1, 0), (1, "click", 1, 1), (1, "purchase", 1, 2),
                (2, "view", 2, 0), (2, "purchase", 2, 1), (2, "click", 2, 2),
                (3, "view", 3, 0),
            ],
        )
        sf_dir = str(tmp_path)
        ev.write.parquet(f"{sf_dir}/events.parquet")
        _cache.clear()
        got = {
            r["stage"]: r["users"]
            for r in pa.q_funnel_stages(spark, sf_dir).collect()
        }
        _cache.clear()
        assert got == {1: 3, 2: 2, 3: 1}


class TestDauWau:
    def test_wau_is_7_day_distinct(self, spark, tmp_path):
        from spark_sql_custom_mq_datasource_spark.plans import product_analytics as pa
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        # u1 active day 1; u2 active days 1 and 8 -> day 8 WAU must count
        # u2 twice? no: distinct -> {u2} from day 8 plus u1? u1's day-1
        # activity covers days 1..7 only, so day 8 WAU = {u2} = 1.
        ev = _events(
            spark,
            [(1, "view", 1, 0), (2, "view", 1, 1), (2, "view", 8, 0)],
        )
        sf_dir = str(tmp_path)
        ev.write.parquet(f"{sf_dir}/events.parquet")
        _cache.clear()
        rows = {
            str(r["day"]): (r["dau"], r["wau"])
            for r in pa.q_rolling_dau_wau(spark, sf_dir).collect()
        }
        _cache.clear()
        assert rows["2024-01-01"] == (2, 2)
        assert rows["2024-01-08"] == (1, 1)
        # only observed days appear (contribution-only days drop out)
        assert set(rows) == {"2024-01-01", "2024-01-08"}


class TestCohort:
    def test_offsets_anchor_to_first_week(self, spark, tmp_path):
        from spark_sql_custom_mq_datasource_spark.plans import product_analytics as pa
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        # u1 first active week 0, returns week 2; u2 first active week 1
        ev = _events(
            spark,
            [(1, "view", 2, 0), (1, "view", 16, 0), (2, "view", 9, 0)],
        )
        sf_dir = str(tmp_path)
        ev.write.parquet(f"{sf_dir}/events.parquet")
        _cache.clear()
        got = {
            (r["cohort"], r["offset"]): r["users"]
            for r in pa.q_cohort_retention(spark, sf_dir).collect()
        }
        _cache.clear()
        assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


class TestEventTransitions:
    def test_counts_probs_and_tie_order(self, spark, tmp_path):
        from spark_sql_custom_mq_datasource_spark.plans import product_analytics as pa
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        # u1: a -> b -> a   (ties on ts broken by event_id: events 2,3
        # share a timestamp, so order is 1,2,3 by event_id).
        # u2: b -> b
        ev = spark.createDataFrame(
            [
                (1, 1, "a", dt.datetime(2024, 1, 1, 0)),
                (2, 1, "b", dt.datetime(2024, 1, 1, 1)),
                (3, 1, "a", dt.datetime(2024, 1, 1, 1)),
                (4, 2, "b", dt.datetime(2024, 1, 2, 0)),
                (5, 2, "b", dt.datetime(2024, 1, 2, 1)),
            ],
            "event_id long, user_id long, event_type string, ts timestamp",
        )
        sf_dir = str(tmp_path)
        ev.write.parquet(f"{sf_dir}/events.parquet")
        _cache.clear()
        got = {
            (r["prev_type"], r["next_type"]): (r["cnt"], r["prob_q20"])
            for r in pa.q_event_transitions(spark, sf_dir).collect()
        }
        _cache.clear()
        q20 = 1 << 20
        assert got == {
            ("a", "b"): (1, q20),
            ("b", "a"): (1, q20 // 2),
            ("b", "b"): (1, q20 // 2),
        }


class TestSessionPaths:
    def test_paths_gap_split_and_truncation(self, spark, tmp_path):
        from spark_sql_custom_mq_datasource_spark.plans import analytics as an
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        # u1: a,b (5 min apart) then a 2h gap then c -> sessions "a>b", "c"
        # u2: a,b -> "a>b"
        # u3: 14 x's in one session -> truncated to 12 path elements
        rows = [
            (1, 1, "a", dt.datetime(2024, 1, 1, 0, 0)),
            (2, 1, "b", dt.datetime(2024, 1, 1, 0, 5)),
            (3, 1, "c", dt.datetime(2024, 1, 1, 2, 10)),
            (4, 2, "a", dt.datetime(2024, 1, 2, 0, 0)),
            (5, 2, "b", dt.datetime(2024, 1, 2, 0, 1)),
        ] + [
            (10 + i, 3, "x", dt.datetime(2024, 1, 3, 0, i)) for i in range(14)
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        sf_dir = str(tmp_path)
        ev.write.parquet(f"{sf_dir}/events.parquet")
        _cache.clear()
        got = {
            r["path"]: r["n_sessions"]
            for r in an.q_session_paths_topk(spark, sf_dir).collect()
        }
        _cache.clear()
        assert got == {"a>b": 2, "c": 1, ">".join(["x"] * 12): 1}


class TestAttributionCap:
    def test_bot_user_fanout_is_capped_to_most_recent(self, spark, tmp_path):
        """Adversarial hot key (VERDICT r07 item 3): one bot user with 200
        touches inside the 24h lookback of a single purchase. The pid
        window must keep exactly MTA_MAX_TOUCHES rows — the MOST RECENT
        ones — so per-purchase state is bounded no matter the key's heat,
        and total credit still sums to ~one Q20 unit."""
        from spark_sql_custom_mq_datasource_spark.plans import (
            product_analytics as pa,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        cap = pa.MTA_MAX_TOUCHES
        purchase_ts = dt.datetime(2024, 1, 2, 12, 0, 0)
        rows = [(1_000_000, 7, "purchase", purchase_ts)]
        # 200 touches, one per minute counting back from the purchase:
        # the newest `cap` are clicks, everything older is a view — only
        # clicks may survive the recency cap.
        for i in range(200):
            ts = purchase_ts - dt.timedelta(minutes=i + 1)
            etype = "click" if i < cap else "view"
            rows.append((i, 7, etype, ts))
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        sf_dir = str(tmp_path)
        ev.write.parquet(f"{sf_dir}/events.parquet")
        _cache.clear()
        got = {
            r["event_type"]: (r["n_touches"], r["credit_q20_sum"])
            for r in pa.q_attribution_linear(spark, sf_dir).collect()
        }
        _cache.clear()
        assert set(got) == {"click"}  # the 136 older views were cut
        n, credit = got["click"]
        assert n == cap
        assert credit == cap * (1048576 // cap)  # floor(2^20/64)=16384 each


class TestConversionWithinWindow:
    def test_planted_conversions(self, spark, tmp_path):
        import datetime as dt

        from spark_sql_custom_mq_datasource_spark.plans.registry import (
            QUERIES,
            _load_all,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        _load_all()
        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

        def row(eid, ts, uid, etype):
            return (eid, ts, uid, etype, 1.0, "{}")

        rows = [
            # u1: view then click 10 s later -> converts
            row(1, t0, 1, "view"),
            row(2, t0 + dt.timedelta(seconds=10), 1, "click"),
            # u2: click BEFORE the view only -> no conversion
            row(3, t0 - dt.timedelta(seconds=5), 2, "click"),
            row(4, t0, 2, "view"),
            # u3: next click beyond the 3600 s window -> no conversion
            row(5, t0, 3, "view"),
            row(6, t0 + dt.timedelta(seconds=3601), 3, "click"),
            # u4: boundary — exactly 3600 s counts
            row(7, t0, 4, "view"),
            row(8, t0 + dt.timedelta(seconds=3600), 4, "click"),
        ]
        d = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        sf = str(tmp_path)
        d.write.parquet(f"{sf}/events.parquet")
        _cache.clear()
        got = {
            r["day"]: r
            for r in QUERIES["q_conversion_within_window"].fn(spark, sf).collect()
        }
        _cache.clear()
        assert got["2024-01-01"]["n_views"] == 4
        assert got["2024-01-01"]["n_converted"] == 2  # u1 and u4 only


class TestJoinSizeEstimate:
    def test_exact_pairs_and_deterministic_sample(self, spark, sf_dir):
        import pyspark.sql.functions as FF

        from spark_sql_custom_mq_datasource_spark.plans.registry import (
            QUERIES,
            _load_all,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import t

        _load_all()
        fn = QUERIES["q_join_size_estimate"].fn
        a = fn(spark, sf_dir).collect()[0]
        b = fn(spark, sf_dir).collect()[0]
        assert tuple(a) == tuple(b)  # md5 sample: no RNG anywhere
        ev = t(spark, sf_dir, "events")
        exact = (
            ev.groupBy("user_id")
            .agg(FF.count("*").alias("c"))
            .agg(FF.sum(FF.col("c") * FF.col("c")).alias("s"))
            .collect()[0]["s"]
        )
        assert a["exact_pairs"] == exact
        assert a["est_pairs"] >= 0 and abs(a["ratio"]) < 50


class TestAbCuped:
    def test_pure_covariate_effect_is_removed(self, spark, tmp_path):
        import datetime as dt

        from spark_sql_custom_mq_datasource_spark.plans.registry import (
            QUERIES,
            _load_all,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        _load_all()
        rows, eid = [], 0
        # user u has u+1 pre-period events and outcome value EXACTLY
        # 2.0 per pre-event: y = 2*x with NO arm effect — CUPED must
        # equalize the arms even though arms differ in x by hash accident
        for u in range(40):
            x = (u % 7) + 1
            for i in range(x):
                eid += 1
                rows.append(
                    (eid, dt.datetime(2024, 1, 2 + i), u, "view", 0.0, "{}")
                )
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, 20), u, "purchase", 2.0 * x, "{}")
            )
        d = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        sf = str(tmp_path)
        d.write.parquet(f"{sf}/events.parquet")
        _cache.clear()
        got = {r["arm"]: r for r in QUERIES["q_ab_cuped"].fn(spark, sf).collect()}
        _cache.clear()
        raw_gap = abs(got[0]["mean_y_q20"] - got[1]["mean_y_q20"])
        adj_gap = abs(got[0]["mean_y_adj_q20"] - got[1]["mean_y_adj_q20"])
        # y is an exact linear function of x: adjustment removes ALL of
        # the between-arm difference (up to float roundoff)
        assert adj_gap < 1e-6 * max(1.0, got[0]["mean_y_q20"])
        assert adj_gap <= raw_gap


class TestEventsCusum:
    def test_step_shift_peaks_at_end_flat_is_zero(self, spark, tmp_path):
        import datetime as dt

        from spark_sql_custom_mq_datasource_spark.plans.registry import (
            QUERIES,
            _load_all,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        _load_all()
        rows, eid = [], 0
        d0 = dt.date(2024, 1, 1)
        for day in range(20):
            n = 10 if day < 10 else 20  # persistent +10 shift at day 10
            for _ in range(n):
                eid += 1
                rows.append(
                    (
                        eid,
                        dt.datetime.combine(d0 + dt.timedelta(days=day),
                                            dt.time(9)),
                        1,
                        "shifted",
                        1.0,
                        "{}",
                    )
                )
            eid += 1
            rows.append(
                (
                    eid,
                    dt.datetime.combine(d0 + dt.timedelta(days=day),
                                        dt.time(10)),
                    1,
                    "flat",
                    1.0,
                    "{}",
                )
            )
        d = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        sf = str(tmp_path)
        d.write.parquet(f"{sf}/events.parquet")
        _cache.clear()
        got = {
            r["event_type"]: r
            for r in QUERIES["q_events_cusum"].fn(spark, sf).collect()
        }
        _cache.clear()
        # shifted: n=20 days, sy=300; residuals ±100 scaled; the walk
        # bottoms at -1000 after day 10 then climbs +100/day to 0 — the
        # floored CUSUM peaks at 1000 on the LAST day
        assert got["shifted"]["max_cusum_scaled"] == 1000
        assert str(got["shifted"]["peak_day"]) == "2024-01-20"
        assert got["flat"]["max_cusum_scaled"] == 0


class TestDecileLift:
    def test_planted_separation(self, spark, tmp_path):
        import datetime as dt

        from spark_sql_custom_mq_datasource_spark.plans.registry import (
            QUERIES,
            _load_all,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        _load_all()
        rows, eid = [], 0
        # 40 users: 20 heavy viewers who ALL convert, 20 light who never do
        for u in range(40):
            views = 10 if u < 20 else 1
            for i in range(views):
                eid += 1
                rows.append(
                    (eid, dt.datetime(2024, 1, 2, 8, i), u, "view", 1.0, "{}")
                )
            if u < 20:
                eid += 1
                rows.append(
                    (eid, dt.datetime(2024, 1, 9), u, "purchase", 5.0, "{}")
                )
        d = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        sf = str(tmp_path)
        d.write.parquet(f"{sf}/events.parquet")
        _cache.clear()
        got = {r["decile"]: r for r in QUERIES["q_decile_lift"].fn(spark, sf).collect()}
        _cache.clear()
        assert sorted(got) == list(range(1, 11))
        # deciles 1-5 are the heavy viewers: full conversion, lift = 2x
        for d10 in range(1, 6):
            assert got[d10]["n_users"] == 4 and got[d10]["n_converted"] == 4
            assert got[d10]["lift_q20"] == 2 * 1048576
        # deciles 6-10: zero conversion, zero lift
        for d10 in range(6, 11):
            assert got[d10]["n_converted"] == 0 and got[d10]["lift_q20"] == 0
