"""Property-based spot checks (SURVEY.md §5.2 item 4) — hypothesis drives
the PURE-PYTHON kernels (offset math, payload determinism) hard, and a few
seeded DataFrame properties cover the operator laws (dedup idempotence,
top-k containment) without paying a Spark job per example.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from spark_sql_custom_mq_datasource_spark.sources.mq import (
    _apply_retention,
    _indices_in_range,
    _Options,
    _payload,
)


class TestOffsetMathProperties:
    @given(
        start=st.integers(0, 10**6),
        length=st.integers(0, 10**5),
        interval=st.integers(1, 1000),
    )
    @settings(max_examples=300, deadline=None)
    def test_range_additivity(self, start, length, interval):
        """[a,c) must contain exactly the records of [a,b) + [b,c) — the
        no-loss/no-dup property that exactly-once replay depends on."""
        mid = start + length // 2
        end = start + length
        full = list(_indices_in_range(start, end, interval))
        left = list(_indices_in_range(start, mid, interval))
        right = list(_indices_in_range(mid, end, interval))
        assert full == left + right

    @given(
        start=st.integers(0, 10**6),
        end=st.integers(0, 10**6),
        interval=st.integers(1, 1000),
    )
    @settings(max_examples=300, deadline=None)
    def test_range_bounds(self, start, end, interval):
        """Every index i satisfies start <= i*interval < end; empty when
        end <= start (left-closed right-open, README.md:337-345)."""
        idx = list(_indices_in_range(start, end, interval))
        if end <= start:
            assert idx == []
        for i in idx:
            assert start <= i * interval < end
        # completeness: any i in the arithmetic range must be present
        lo = -(-start // interval)
        hi = (end - 1) // interval if end > start else -1
        assert idx == list(range(max(0, lo), hi + 1))

    @given(
        seed=st.integers(0, 2**31),
        p=st.integers(0, 64),
        i=st.integers(0, 10**6),
    )
    @settings(max_examples=200, deadline=None)
    def test_payload_pure(self, seed, p, i):
        a, b = _payload(seed, p, i), _payload(seed, p, i)
        assert a == b and 3 <= len(a.split(" ")) <= 8

    @given(
        start=st.integers(0, 10**6),
        end=st.integers(0, 10**6),
        retention=st.integers(0, 10**6),
    )
    @settings(max_examples=300, deadline=None)
    def test_retention_clamp_never_loses_fresh_data(self, start, end, retention):
        """Skip-mode clamp keeps exactly the unpurged suffix: result >= start,
        >= horizon, and never exceeds... the batch end."""
        opts = _Options({"retentionMs": str(retention), "failOnDataLoss": "false"})
        s2 = _apply_retention(opts, start, end)
        assert s2 >= start
        assert s2 >= end - retention
        assert s2 == max(start, end - retention)


class TestOperatorLaws:
    def test_exact_dedup_idempotent(self, spark):
        """dedup(dedup(X)) == dedup(X): applying exact dedup to its own
        survivors is the identity (every group has size 1)."""
        from spark_sql_custom_mq_datasource_spark.operators.dedup import exact_dedup

        docs = spark.createDataFrame(
            [(i, f"text {i % 7}") for i in range(50)], "doc_id long, text string"
        )
        first = exact_dedup(docs, ["text"], "doc_id")
        survivors = docs.join(
            first.select("keep_id"), docs.doc_id == first.keep_id, "left_semi"
        )
        second = exact_dedup(survivors, ["text"], "doc_id")
        assert second.count() == first.count()
        assert second.where("group_sz > 1").count() == 0

    def test_topk_contained_in_larger_k(self, spark):
        """top-3 neighbors are a prefix of top-5 for every query."""
        from spark_sql_custom_mq_datasource_spark.operators.similarity import (
            ann_bruteforce_topk,
        )
        import random

        rnd = random.Random(7)
        rows = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(60)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        queries = emb.where("vec_id < 3")
        k3 = {
            (r["qid"], r["rk"]): r["neighbor_id"]
            for r in ann_bruteforce_topk(emb, queries, 3).collect()
        }
        k5 = {
            (r["qid"], r["rk"]): r["neighbor_id"]
            for r in ann_bruteforce_topk(emb, queries, 5).collect()
        }
        assert all(k5[key] == nid for key, nid in k3.items())


class TestCrossEnginePortability:
    """Fuzz the md5 word-hash convention both engines must agree on — it is
    the foundation under every dedup/split/DSIR/decontaminate oracle. A
    drift here would silently break dozens of hash checks at once."""

    def test_word_hash_matches_duckdb_on_random_strings(self, spark):
        import random
        import string

        import duckdb
        import pandas as pd
        from pyspark.sql import functions as F

        from spark_sql_custom_mq_datasource_spark.functions.text import word_hash

        rng = random.Random(5)
        alphabet = string.ascii_letters + string.digits + "_-./:@ßéü漢"
        words = list(
            {
                "".join(rng.choices(alphabet, k=rng.randint(1, 16)))
                for _ in range(400)
            }
        )
        pdf = pd.DataFrame({"w": words})
        got = {
            r["w"]: r["h"]
            for r in spark.createDataFrame(pdf)
            .select("w", word_hash(F.col("w")).alias("h"))
            .collect()
        }
        con = duckdb.connect()
        con.register("t", pdf)
        exp = dict(
            con.execute(
                "SELECT w, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) FROM t"
            ).fetchall()
        )
        assert got == exp

    def test_q20_quantization_matches_duckdb_on_random_doubles(self, spark):
        """floor(x * 2^20 + 0.5) over arbitrary doubles — the scalar every
        float-valued oracle is funneled through."""
        import random

        import duckdb
        import pandas as pd
        from pyspark.sql import functions as F

        rng = random.Random(11)
        xs = [
            rng.uniform(-1e6, 1e6) * (10 ** rng.randint(-6, 0))
            for _ in range(500)
        ] + [0.0, -0.0, 1e-12, -1e-12]
        pdf = pd.DataFrame({"i": range(len(xs)), "x": xs})
        got = {
            r["i"]: r["q"]
            for r in spark.createDataFrame(pdf)
            .select(
                "i",
                F.floor(F.col("x") * F.lit(1048576.0) + F.lit(0.5))
                .cast("bigint")
                .alias("q"),
            )
            .collect()
        }
        con = duckdb.connect()
        con.register("t", pdf)
        exp = dict(
            con.execute(
                "SELECT i, CAST(floor(x * 1048576.0 + 0.5) AS BIGINT) FROM t"
            ).fetchall()
        )
        assert got == exp
