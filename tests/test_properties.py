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


class TestLateRound5Laws:
    def test_runtime_filter_join_equals_plain_join_on_random_frames(self, spark):
        """Transparency law: the bitmap pre-filter may never change the
        join result, whatever the key distribution (incl. collisions in
        the 65536-bucket space, forced here with huge sparse keys)."""
        import random

        from pyspark.sql import functions as F
        from spark_sql_custom_mq_datasource_spark.operators.joins import (
            runtime_filter_join,
        )

        rng = random.Random(42)
        fact_keys = [rng.randrange(0, 1 << 40) for _ in range(500)]
        dim_keys = rng.sample(fact_keys, 30) + [
            rng.randrange(0, 1 << 40) for _ in range(30)
        ]
        fact = spark.createDataFrame([(k,) for k in fact_keys], "fk long")
        dim = spark.createDataFrame(
            [(k, f"d{k}") for k in set(dim_keys)], "dk long, name string"
        )
        got = sorted(
            (r["fk"], r["name"])
            for r in runtime_filter_join(fact, dim, "fk", "dk").collect()
        )
        want = sorted(
            (r["fk"], r["name"]) for r in fact.join(dim, fact.fk == dim.dk).collect()
        )
        assert got == want and len(want) >= 30

    def test_chunking_total_coverage_law(self, spark):
        """stride == window (no overlap): chunk sizes partition each doc's
        tokens exactly, for arbitrary doc lengths incl. 1 and multiples of
        the stride."""
        from pyspark.sql import functions as F
        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            chunk_documents,
        )

        docs = spark.createDataFrame(
            [(n, " ".join(f"w{i}" for i in range(n))) for n in (1, 7, 8, 9, 16, 33)],
            "doc_id long, text string",
        )
        per_doc = {
            r["doc_id"]: r["s"]
            for r in chunk_documents(docs, window=8, stride=8)
            .groupBy("doc_id")
            .agg(F.sum("chunk_tokens").alias("s"))
            .collect()
        }
        assert per_doc == {n: n for n in (1, 7, 8, 9, 16, 33)}

    def test_scd2_versions_partition_time(self, spark):
        """For every key: intervals are disjoint, chained, and exactly one
        is open — under a shuffled insert order (order independence)."""
        import datetime as dt
        import random

        from spark_sql_custom_mq_datasource_spark.sources.maintenance import (
            scd2_build,
        )

        rng = random.Random(7)
        rows = []
        for key in range(5):
            days = rng.sample(range(1, 28), rng.randint(1, 6))
            rows += [
                (key, float(d), dt.datetime(2024, 1, d)) for d in days
            ]
        rng.shuffle(rows)
        chg = spark.createDataFrame(rows, "user_id long, value double, ts timestamp")
        out = scd2_build(chg, "user_id", "ts", ["value"]).collect()
        by_key: dict = {}
        for r in out:
            by_key.setdefault(r["user_id"], []).append(r)
        for key, ivs in by_key.items():
            ivs.sort(key=lambda r: r["valid_from"])
            opens = [r for r in ivs if r["valid_to"] is None]
            assert len(opens) == 1 and opens[0] is ivs[-1]
            for a, b in zip(ivs, ivs[1:]):
                assert a["valid_to"] == b["valid_from"]


class TestRound6KernelProperties:
    def test_lm_nll_matches_python_recompute_on_random_corpora(self, spark):
        """score_perplexity == a brute-force pure-Python recomputation of
        the same hashed Laplace model — one seeded random corpus per law
        (a Spark job per hypothesis example would be minutes)."""
        import hashlib
        import math
        import random

        from spark_sql_custom_mq_datasource_spark.operators.lm import (
            LM_BUCKETS,
            Q20,
            score_perplexity,
        )

        rng = random.Random(13)
        vocab = ["alpha", "beta", "gamma", "delta", "x1", "y2"]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
            for i in range(40)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        def bucket(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % LM_BUCKETS

        c1: dict = {}
        c2: dict = {}
        trans = []
        for doc_id, text in rows:
            ws = text.strip().split(" ")
            for a, b in zip(ws, ws[1:]):
                u, bb = bucket(a), bucket(a + " " + b)
                c1[u] = c1.get(u, 0) + 1
                c2[bb] = c2.get(bb, 0) + 1
                trans.append((doc_id, len(ws) - 1, u, bb))
        want: dict = {}
        for doc_id, n, u, bb in trans:
            q = math.floor(
                -math.log((c2[bb] + 1.0) / (c1[u] + LM_BUCKETS)) * Q20 + 0.5
            )
            want[doc_id] = (n, want.get(doc_id, (n, 0))[1] + q)

        got = {
            r["doc_id"]: (r["n_trans"], r["nll_q20"])
            for r in score_perplexity(docs).collect()
        }
        assert got == want

    def test_funnel_fold_matches_bruteforce_on_random_event_logs(self, spark):
        """The single-scan funnel fold == the naive conditional-min chain
        on randomized per-user event logs (including same-timestamp ties,
        missing stages, out-of-order arrival)."""
        import datetime as dt
        import random

        from spark_sql_custom_mq_datasource_spark.plans.registry import (
            QUERIES,
            get_queries,
        )
        from spark_sql_custom_mq_datasource_spark.plans.product_analytics import (
            FUNNEL,
        )

        rng = random.Random(29)
        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for user in range(25):
            for _ in range(rng.randint(0, 12)):
                rows.append(
                    (
                        eid,
                        user,
                        rng.choice(list(FUNNEL) + ["other"]),
                        base + dt.timedelta(hours=rng.randint(0, 48)),  # ties likely
                        1.0,
                        "{}",
                    )
                )
                eid += 1
        if not rows:
            rows = [(0, 0, FUNNEL[0], base, 1.0, "{}")]
        ev = spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, ts timestamp,"
            " value double, props string",
        )

        # brute force: per user, t1 = min s1; t2 = min s2 with ts > t1; ...
        per_user: dict = {}
        for _, user, et, ts, _, _ in rows:
            per_user.setdefault(user, []).append((et, ts))
        counts = [0, 0, 0]
        for user, evs in per_user.items():
            prev = None
            for si, stage in enumerate(FUNNEL):
                cand = [
                    ts
                    for (et, ts) in evs
                    if et == stage and (prev is None or ts > prev)
                ]
                if not cand:
                    break
                prev = min(cand)
                counts[si] += 1

        # run the registered query body against this synthetic frame by
        # monkeypatching the table loader's cache slot
        from spark_sql_custom_mq_datasource_spark.plans import util as u

        key = (u.session_key(spark), "__synthetic_funnel__", "events")
        u._cache[key] = ev
        try:
            get_queries()
            got = {
                r["stage"]: r["users"]
                for r in QUERIES["q_funnel_stages"]
                .fn(spark, "__synthetic_funnel__")
                .collect()
            }
        finally:
            u._cache.pop(key, None)
        assert got == {1: counts[0], 2: counts[1], 3: counts[2]}


class TestRound7KernelProperties:
    def test_temperature_apportionment_law_on_random_counts(self, spark, tmp_path):
        """Largest-remainder law: targets sum EXACTLY to the corpus size
        and each target differs from its exact (real-valued) share by
        less than 1 — checked against a pure-Python recompute on random
        per-source counts."""
        import math
        import random

        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            q_mix_temperature,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        rng = random.Random(7)
        counts = {f"s{i:02d}": rng.randint(1, 400) for i in range(12)}
        rows = [
            (i, "t", src)
            for i, src in enumerate(
                s for src, n in counts.items() for s in [src] * n
            )
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string, source string")
        sf = str(tmp_path)
        d.write.parquet(f"{sf}/documents.parquet")
        _cache.clear()
        out = {r["source"]: r for r in q_mix_temperature(spark, sf).collect()}
        _cache.clear()

        n_total = sum(counts.values())
        wt_q = {s: math.floor(math.sqrt(n) * 1048576 + 0.5) for s, n in counts.items()}
        sw = sum(wt_q.values())
        assert sum(r["target_docs"] for r in out.values()) == n_total
        for s, r in out.items():
            exact = n_total * wt_q[s] / sw
            assert abs(r["target_docs"] - exact) < 1.0
        # python largest-remainder recompute matches exactly
        base = {s: (n_total * wt_q[s]) // sw for s in counts}
        rem = {s: (n_total * wt_q[s]) % sw for s in counts}
        leftover = n_total - sum(base.values())
        for s in sorted(counts, key=lambda s: (-rem[s], s))[:leftover]:
            base[s] += 1
        assert {s: r["target_docs"] for s, r in out.items()} == base

    def test_debounce_matches_bruteforce_on_random_logs(self, spark, tmp_path):
        """Burst law: an event survives iff its gap to the PREVIOUS event
        of the same (user, type) exceeds the debounce window (chained
        gaps extend a burst) — checked against a python brute force over
        a random event log with deliberately clustered timestamps."""
        import datetime as dt
        import random

        from spark_sql_custom_mq_datasource_spark.plans.analytics import (
            DEBOUNCE_GAP_S,
            q_events_debounce,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        rng = random.Random(77)
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(600):
            uid = rng.randint(1, 5)
            typ = rng.choice(["view", "click"])
            # cluster half the events tightly so bursts actually chain
            sec = rng.randint(0, 3000) if rng.random() < 0.5 else rng.randint(0, 200000)
            rows.append((i, t0 + dt.timedelta(seconds=sec), uid, typ, 1.0, "{}"))
        d = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        sf = str(tmp_path)
        d.write.parquet(f"{sf}/events.parquet")
        _cache.clear()
        got = {
            r["event_type"]: (r["n_kept"], r["n_dropped"])
            for r in q_events_debounce(spark, sf).collect()
        }
        _cache.clear()

        kept = {"view": 0, "click": 0}
        dropped = {"view": 0, "click": 0}
        by_key: dict = {}
        for i, ts, uid, typ, _v, _p in rows:
            by_key.setdefault((uid, typ), []).append((ts, i))
        for (uid, typ), evs in by_key.items():
            prev = None
            for ts, _i in sorted(evs):
                if prev is None or (ts - prev).total_seconds() > DEBOUNCE_GAP_S:
                    kept[typ] += 1
                else:
                    dropped[typ] += 1
                prev = ts
        assert got == {
            t: (kept[t], dropped[t]) for t in kept if kept[t] + dropped[t] > 0
        }


class TestBpeEncodingProperties:
    """Round-11: the SEP-anchored string-replace merge must equal the
    algorithmic left-to-right non-overlapping symbol merge for ANY symbol
    sequence — including pathological self-overlap (a,a on 'aaa') and
    symbols that are substrings/suffixes of each other ('xa','by' vs
    pair (a,b)). Python str.replace shares the leftmost-non-overlapping
    contract with Spark's and DuckDB's replace, so hypothesis can drive
    the encoding trick hard without a Spark job per example."""

    SEP = "\x1f"

    @staticmethod
    def _merge_ref(syms: list[str], a: str, b: str) -> list[str]:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    @given(
        syms=st.lists(
            st.text(alphabet="abx", min_size=1, max_size=3), min_size=1, max_size=12
        ),
        a=st.text(alphabet="abx", min_size=1, max_size=3),
        b=st.text(alphabet="abx", min_size=1, max_size=3),
    )
    @settings(max_examples=500, deadline=None)
    def test_anchored_replace_equals_symbol_merge(self, syms, a, b):
        from spark_sql_custom_mq_datasource_spark.functions.text import (
            _BPE_BOUND,
            _BPE_SEP,
        )

        seq = _BPE_BOUND + _BPE_BOUND.join(syms) + _BPE_BOUND
        replaced = seq.replace(
            _BPE_SEP + a + _BPE_BOUND + b + _BPE_SEP,
            _BPE_SEP + a + b + _BPE_SEP,
        )
        got = replaced.split(_BPE_BOUND)[1:-1]
        assert got == self._merge_ref(syms, a, b)

    @staticmethod
    def _train_ref(
        words: list[tuple[str, int]], n_merges: int
    ) -> list[tuple[int, str, str, str, int]]:
        """Pure-Python BPE trainer: overlapping adjacent-pair counts
        weighted by word count, argmax by (n desc, (a, SEP, b) asc),
        left-to-right non-overlapping apply."""
        sep = "\x1f"
        vocab = [([c for c in w], cnt) for w, cnt in words]
        merges = []
        for step in range(1, n_merges + 1):
            counts: dict[tuple[str, str], int] = {}
            for syms, cnt in vocab:
                for i in range(len(syms) - 1):
                    counts[(syms[i], syms[i + 1])] = (
                        counts.get((syms[i], syms[i + 1]), 0) + cnt
                    )
            if not counts:
                break
            (a, b), n = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0] + sep + kv[0][1])
            )
            merges.append((step, a, b, a + b, n))
            vocab = [
                (TestBpeEncodingProperties._merge_ref(syms, a, b), cnt)
                for syms, cnt in vocab
            ]
        return merges

    def test_spark_trainer_equals_reference_on_seeded_vocabs(self, spark):
        """Seeded random vocabularies (one Spark loop per case, so a
        handful of cases, not hypothesis-many): the distributed trainer
        must reproduce the pure-Python reference merge-for-merge."""
        import random

        from spark_sql_custom_mq_datasource_spark.functions.text import (
            _BPE_BOUND,
            bpe_train_vocab,
        )

        rng = random.Random(11)
        for case in range(4):
            words = sorted(
                {
                    "".join(
                        rng.choice("abcde") for _ in range(rng.randint(2, 7))
                    )
                    for _ in range(rng.randint(3, 25))
                }
            )
            vocab = [(w, rng.randint(1, 9)) for w in words]
            want = self._train_ref(vocab, 4)
            df = spark.createDataFrame(
                [
                    (w, _BPE_BOUND + _BPE_BOUND.join(w) + _BPE_BOUND, c)
                    for w, c in vocab
                ],
                "word string, seq string, cnt bigint",
            )
            got, _ = bpe_train_vocab(df, 4)
            assert got == want, f"case {case}: {got} != {want}"


class TestPigeonholeBandingProperties:
    """The exactness claim of every hamming-banded dedup (word SimHash,
    payload phash): ANY pair of 60-bit signatures within hamming k=3
    agrees on at least one of the k+1=4 contiguous 15-bit bands, so the
    (band, key) equi-join loses nothing. Pure integer math — hypothesis
    drives it hard with no Spark job."""

    BITS, MAX_HAMMING = 60, 3

    @staticmethod
    def _band_keys(h: int, bits: int, n_bands: int) -> list[int]:
        band_bits = bits // n_bands
        mask = (1 << band_bits) - 1
        return [(h >> (k * band_bits)) & mask for k in range(n_bands)]

    @given(
        h=st.integers(0, (1 << 60) - 1),
        flips=st.lists(st.integers(0, 59), min_size=0, max_size=3, unique=True),
    )
    @settings(max_examples=1000, deadline=None)
    def test_within_hamming_k_shares_a_band(self, h, flips):
        g = h
        for j in flips:
            g ^= 1 << j
        a = self._band_keys(h, self.BITS, self.MAX_HAMMING + 1)
        b = self._band_keys(g, self.BITS, self.MAX_HAMMING + 1)
        assert any(x == y for x, y in zip(a, b))
        assert bin(h ^ g).count("1") == len(flips)

    @given(h=st.integers(0, (1 << 60) - 1))
    @settings(max_examples=300, deadline=None)
    def test_band_keys_partition_all_bits(self, h):
        """Reassembling the 4 band keys reproduces the signature — the
        bands cover all 60 bits with no overlap (so the pigeonhole
        argument applies to the WHOLE hash, not a subset)."""
        keys = self._band_keys(h, self.BITS, self.MAX_HAMMING + 1)
        assert sum(k << (i * 15) for i, k in enumerate(keys)) == h


class TestPhashKernelProperties:
    """Round-12: the vectorized gram-hash kernels (strided pack, chunked
    vote, splitmix64 production path) driven hard WITHOUT a Spark job per
    example — the pure-Python per-payload reference is the definition the
    _SQL_PHASH oracle re-derives (VERDICT r11 item 5)."""

    @staticmethod
    def _phash_ref(b: bytes, gram: int = 4, bits: int = 60) -> int:
        import hashlib

        n = len(b) - gram + 1
        if n <= 0:
            return 0
        votes = [0] * bits
        for i in range(n):
            h = int(hashlib.md5(b[i : i + gram]).hexdigest()[:15], 16)
            for j in range(bits):
                votes[j] += 2 * ((h >> j) & 1) - 1
        return sum(1 << j for j in range(bits) if votes[j] > 0)

    @staticmethod
    def _phash_vec(b: bytes, gram: int = 4, bits: int = 60) -> int:
        """The vectorized md5 path exactly as payload_phash composes it,
        memo-free (the high-entropy simulation: every gram hashes cold)."""
        import hashlib

        import numpy as np

        from spark_sql_custom_mq_datasource_spark.operators.multimodal import (
            _pack_grams,
            _vote_bits,
        )

        if len(b) - gram + 1 <= 0:
            return 0
        g = _pack_grams(b, gram)
        uniq, inv = np.unique(g, return_inverse=True)
        hs_u = np.array(
            [
                int(hashlib.md5(int(u).to_bytes(gram, "big")).hexdigest()[:15], 16)
                for u in uniq
            ],
            dtype=np.uint64,
        )
        return _vote_bits(hs_u[inv], bits)

    @given(payload=st.binary(min_size=0, max_size=400))
    @settings(max_examples=300, deadline=None)
    def test_vectorized_md5_path_matches_reference(self, payload):
        """Strided pack + unique + chunked unpackbits vote must reproduce
        the per-gram loop definition bit-for-bit on arbitrary bytes —
        including all-identical-byte runs and <gram payloads."""
        assert self._phash_vec(payload) == self._phash_ref(payload)

    @given(payload=st.binary(min_size=4, max_size=400))
    @settings(max_examples=300, deadline=None)
    def test_mix64_bounded_and_deterministic(self, payload):
        """The production mix64 path: 60-bit bounded, deterministic, and
        gram-order sensitive the same way the md5 path is (a pure
        function of the packed gram sequence)."""
        import numpy as np

        from spark_sql_custom_mq_datasource_spark.operators.multimodal import (
            _mix64,
            _pack_grams,
            _vote_bits,
        )

        g = _pack_grams(payload, 4)
        with np.errstate(over="ignore"):
            a = _vote_bits(_mix64(g, 60), 60)
            b = _vote_bits(_mix64(_pack_grams(bytes(payload), 4), 60), 60)
        assert a == b
        assert 0 <= a < (1 << 60)

    def test_mix64_bits_balanced_in_distribution(self):
        """'Equal in distribution' to a uniform gram hash: over a fixed
        seeded high-entropy corpus, every one of the 60 vote bits must be
        set in 35-65% of payloads (a biased bit would skew banding
        selectivity). Deterministic seed — not flaky."""
        import numpy as np

        from spark_sql_custom_mq_datasource_spark.operators.multimodal import (
            _mix64,
            _pack_grams,
            _vote_bits,
        )

        rng = np.random.default_rng(42)
        hashes = []
        for _ in range(400):
            payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
            with np.errstate(over="ignore"):
                hashes.append(_vote_bits(_mix64(_pack_grams(payload, 4), 60), 60))
        for j in range(60):
            frac = sum((h >> j) & 1 for h in hashes) / len(hashes)
            assert 0.35 <= frac <= 0.65, f"bit {j} biased: {frac}"
