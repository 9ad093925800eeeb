"""Round-4 additions: benchmark decontamination and int8 embedding
quantization."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_sql_custom_mq_datasource_spark.operators.curation import (
    DECONTAM_EVAL_MOD,
    decontaminate_pairs,
)
from spark_sql_custom_mq_datasource_spark.operators.dedup import (
    shingle_sets_cached,
)
from spark_sql_custom_mq_datasource_spark.operators.similarity import quantize_int8
from spark_sql_custom_mq_datasource_spark.plans.util import t


class TestDecontaminate:
    def test_exact_dup_of_eval_doc_is_fully_contained(self, spark, sf_dir):
        """The sf0.001 corpus has exact/near dups of doc 0 (an eval doc);
        they must surface with containment ~1."""
        sets = shingle_sets_cached(spark, sf_dir)
        ev = sets.where(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
        top = (
            decontaminate_pairs(sets, ev, threshold=0.0)
            .orderBy(F.desc("containment"))
            .limit(1)
            .collect()
        )
        assert top and top[0]["containment"] >= 0.9

    def test_self_pairs_excluded(self, spark, sf_dir):
        sets = shingle_sets_cached(spark, sf_dir)
        ev = sets.where(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
        pairs = decontaminate_pairs(sets, ev, threshold=0.0)
        assert pairs.where(F.col("doc_id") == F.col("eval_id")).count() == 0

    def test_eval_side_is_broadcast(self, spark, sf_dir):
        """The benchmark index must ride a broadcast join — the corpus-side
        probe must not shuffle at 100 TB."""
        sets = shingle_sets_cached(spark, sf_dir)
        ev = sets.where(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
        plan = (
            decontaminate_pairs(sets, ev)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestQuantizeInt8:
    def test_codes_bounded_and_extreme_hit(self, spark, sf_dir):
        emb = t(spark, sf_dir, "embeddings")
        q = emb.select("vec_id", quantize_int8("embedding").alias("q"))
        stats = q.select(
            F.array_max("q.codes").alias("mx"), F.array_min("q.codes").alias("mn")
        ).agg(
            F.max("mx").alias("gmax"),
            F.min("mn").alias("gmin"),
            # every vector's max-|x| element must map to ±127
            F.min(F.greatest(F.col("mx"), -F.col("mn"))).alias("extreme"),
        ).collect()[0]
        assert stats["gmax"] <= 127 and stats["gmin"] >= -127
        assert stats["extreme"] == 127

    def test_reconstruction_error_within_half_step(self, spark, sf_dir):
        emb = t(spark, sf_dir, "embeddings")
        q = emb.select("embedding", quantize_int8("embedding").alias("q"))
        worst = q.select(
            F.array_max(
                F.zip_with(
                    "embedding",
                    "q.codes",
                    lambda x, c: F.abs(x.cast("double") - c * F.col("q.scale"))
                    / F.col("q.scale"),
                )
            ).alias("rel_err")
        ).agg(F.max("rel_err")).collect()[0][0]
        assert worst <= 0.5 + 1e-9


class TestStratifiedSample:
    def test_sample_is_subset_and_deterministic(self, spark, sf_dir):
        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            SAMPLE_RATES,
            stratified_sample,
        )

        docs = t(spark, sf_dir, "documents")
        s1 = {r["doc_id"] for r in stratified_sample(docs, SAMPLE_RATES).select("doc_id").collect()}
        s2 = {r["doc_id"] for r in stratified_sample(docs, SAMPLE_RATES).select("doc_id").collect()}
        assert s1 == s2  # content-free hash => identical across runs
        assert s1 < {r["doc_id"] for r in docs.select("doc_id").collect()}

    def test_rate_100_keeps_all(self, spark, sf_dir):
        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            stratified_sample,
        )

        docs = t(spark, sf_dir, "documents")
        kept = stratified_sample(docs, {"en": 100}).count()
        assert kept == docs.count()  # unknown strata default to keep-all too


class TestIncrementalDedup:
    def test_survivors_disjoint_from_corpus_hashes(self, spark, sf_dir):
        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            incremental_dedup,
        )

        docs = t(spark, sf_dir, "documents")
        cut = docs.agg((F.max("doc_id") * 3 / 4).cast("bigint")).collect()[0][0]
        corpus = docs.where(F.col("doc_id") <= cut)
        batch = docs.where(F.col("doc_id") > cut)
        surv = incremental_dedup(batch, corpus)
        # no survivor's hash exists in the corpus, and survivors are unique
        clash = surv.join(
            corpus.select(F.md5(F.lower("text")).alias("_h")).distinct(), "_h"
        ).count()
        assert clash == 0
        assert surv.groupBy("_h").count().agg(F.max("count")).collect()[0][0] == 1


class TestTokenBudgetMix:
    def test_allocations_sum_to_budget_and_respect_caps(self, spark, sf_dir):
        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            MIX_BUDGET_TOKENS,
            token_budget_mix,
        )
        from spark_sql_custom_mq_datasource_spark.functions.text import token_count

        inv = (
            t(spark, sf_dir, "documents")
            .groupBy("source")
            .agg(F.sum(token_count("text")).cast("bigint").alias("avail"))
        )
        rows = token_budget_mix(inv, MIX_BUDGET_TOKENS).collect()
        total_avail = sum(r["avail"] for r in rows)
        assert all(r["alloc"] <= r["avail"] for r in rows)
        assert sum(r["alloc"] for r in rows) == min(MIX_BUDGET_TOKENS, total_avail)

    def test_budget_above_inventory_allocates_everything(self, spark, sf_dir):
        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            token_budget_mix,
        )
        from spark_sql_custom_mq_datasource_spark.functions.text import token_count

        inv = (
            t(spark, sf_dir, "documents")
            .groupBy("source")
            .agg(F.sum(token_count("text")).cast("bigint").alias("avail"))
        )
        rows = token_budget_mix(inv, 10**12).collect()
        assert all(r["alloc"] == r["avail"] for r in rows)


class TestTokenBudgetMixProperties:
    """Seeded random scenarios vs a pure-Python Hamilton reference — the
    Spark window arithmetic must reproduce largest-remainder allocation
    exactly, including caps and tie-breaks."""

    @staticmethod
    def _reference(inv: dict[str, int], budget: int) -> dict[str, int]:
        total = sum(inv.values())
        if total == 0:
            return {s: 0 for s in inv}
        base = {
            s: min(a, (a * budget) // total) for s, a in inv.items()
        }
        rem = {s: a * budget - ((a * budget) // total) * total for s, a in inv.items()}
        residue = min(budget, total) - sum(base.values())
        order = sorted(inv, key=lambda s: (-rem[s], s))
        alloc = dict(base)
        for s in order[: max(0, residue)]:
            alloc[s] = min(inv[s], alloc[s] + 1)
        return alloc

    def test_random_scenarios_match_reference(self, spark):
        import random

        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            token_budget_mix,
        )

        rng = random.Random(1234)
        for case in range(6):
            n = rng.randint(1, 8)
            inv = {f"s{i}": rng.randint(0, 5000) for i in range(n)}
            budget = rng.choice([0, 1, 100, sum(inv.values()) or 1, 10**9])
            df = spark.createDataFrame(
                [(s, a) for s, a in inv.items()], "source string, avail long"
            )
            got = {
                r["source"]: r["alloc"] for r in token_budget_mix(df, budget).collect()
            }
            exp = self._reference(inv, budget)
            assert got == exp, f"case {case}: inv={inv} budget={budget}"
            assert sum(got.values()) == min(budget, sum(inv.values()))


class TestDegenerateInputGuards:
    """ADVICE r04 item 3: degenerate inputs must produce defined output,
    not silent NULL cascades."""

    def test_quantize_all_zero_vector_yields_zero_codes(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
            "vec_id long, embedding array<float>",
        )
        rows = {
            r["vec_id"]: r
            for r in df.select(
                "vec_id", quantize_int8("embedding").alias("q")
            ).select("vec_id", "q.scale", "q.codes").collect()
        }
        assert rows[1]["scale"] == 0.0
        assert rows[1]["codes"] == [0, 0, 0]  # defined, not NULL
        assert rows[2]["codes"] == [64, -127, 32]

    def test_token_budget_mix_empty_inventory(self, spark):
        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            token_budget_mix,
        )

        df = spark.createDataFrame(
            [("a", 0), ("b", 0)], "source string, avail long"
        )
        got = {r["source"]: r["alloc"] for r in token_budget_mix(df, 100).collect()}
        assert got == {"a": 0, "b": 0}  # defined zeros, not NULLs


class TestCacheClearHook:
    def test_clear_dedup_caches_releases_everything(self, spark, sf_dir):
        """ADVICE r04 item 2: multi-fixture sessions need a reclaim hook for
        the DISK_ONLY materializations."""
        from spark_sql_custom_mq_datasource_spark.operators.dedup import (
            _sets_cache,
            clear_dedup_caches,
            shingle_sets_cached,
        )

        from spark_sql_custom_mq_datasource_spark.plans.util import session_key

        shingle_sets_cached(spark, sf_dir).count()  # materialize
        assert any(k[0] == session_key(spark) for k in _sets_cache)
        clear_dedup_caches(spark)
        assert not any(k[0] == session_key(spark) for k in _sets_cache)
        # and the session-level cache is empty (anonymous persists dropped)
        jcm = spark._jsparkSession.sharedState().cacheManager()
        assert jcm.isEmpty()
        # cache rebuilds transparently on next use
        assert shingle_sets_cached(spark, sf_dir).count() > 0


class TestChunkDocuments:
    def test_overlap_tail_and_short_doc(self, spark):
        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            chunk_documents,
        )

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i j"), (2, "x")], "doc_id long, text string"
        )
        out = (
            chunk_documents(docs, window=8, stride=4)
            .orderBy("doc_id", "chunk_id")
            .collect()
        )
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_tokens"])
            )
        # doc 1: n=10 -> starts 0,4,8 -> lengths 8,6,2 (tail kept, no loss)
        assert by_doc[1] == [(0, 8), (1, 6), (2, 2)]
        # doc 2: single token -> one chunk of 1
        assert by_doc[2] == [(0, 1)]

    def test_every_token_covered(self, spark):
        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            chunk_documents,
        )

        docs = spark.createDataFrame(
            [(7, " ".join(f"t{i}" for i in range(23)),)], "doc_id long, text string"
        )
        total = (
            chunk_documents(docs, window=8, stride=8)
            .agg(F.sum("chunk_tokens").alias("s"))
            .collect()[0]["s"]
        )
        # stride == window (no overlap): chunk tokens partition the doc
        assert total == 23


class TestTemperatureTargets128Bit:
    def test_apportionment_exact_beyond_int64(self, spark):
        """ADVICE r07 item 1: tot*wt_q must not wrap at int64. A 6e9-doc
        corpus with a dominant source drives the product to ~5.6e26 —
        far past int64 — and every value must still match exact Python
        big-int arithmetic, with targets summing to the corpus size."""
        import math

        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            temperature_targets,
        )

        counts = {"web": 6_000_000_000, "books": 40_000_000, "code": 7}
        c = spark.createDataFrame(
            [(s, n) for s, n in counts.items()], "source string, n long"
        )
        got = {
            r["source"]: (r["n_docs"], r["weight_q20"], r["target_docs"])
            for r in temperature_targets(c).collect()
        }
        # exact reference in Python big ints
        wt = {s: int(math.floor(math.sqrt(n) * 1048576 + 0.5)) for s, n in counts.items()}
        sw, tot = sum(wt.values()), sum(counts.values())
        base = {s: (tot * wt[s]) // sw for s in counts}
        rem = {s: (tot * wt[s]) % sw for s in counts}
        residue = tot - sum(base.values())
        order = sorted(counts, key=lambda s: (-rem[s], s))
        target = {
            s: base[s] + (1 if order.index(s) < residue else 0) for s in counts
        }
        for s in counts:
            assert got[s] == (counts[s], (wt[s] * 1048576) // sw, target[s]), s
        assert sum(v[2] for v in got.values()) == tot


class TestFertilityWhitespaceGuard:
    def test_whitespace_only_lang_group_yields_null_in_both_engines(
        self, spark, tmp_path
    ):
        """ADVICE r07 item 5: a lang whose texts contain no
        letters/digits/punctuation has SUM(n_units)=0 — the ratio must
        be NULL (not an error) in BOTH engines, and the engines must
        agree on every cell."""
        import duckdb

        from spark_sql_custom_mq_datasource_spark.plans.registry import (
            QUERIES,
            get_queries,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache

        get_queries()
        rows = [
            (1, "xx", "   ", 3),          # whitespace-only: n_units = 0
            (2, "xx", " \t ", 3),
            (3, "en", "hello world ok", 14),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, text string, n_chars int"
        )
        sf = str(tmp_path)
        df.write.parquet(f"{sf}/documents.parquet")
        _cache.clear()
        q = QUERIES["q_tokenizer_fertility"]
        srows = {r["lang"]: tuple(r) for r in q.fn(spark, sf).collect()}
        _cache.clear()
        # split(trim(ws-only)) yields [""], so n_words = 1 per doc and
        # fertility is a defined 0; chars-per-unit divides by the zero
        # unit count and must be the guarded NULL in both engines
        assert srows["xx"][4] == 0
        assert srows["xx"][5] is None
        assert srows["en"][5] is not None
        con = duckdb.connect()
        # Spark wrote a directory dataset — glob its part files
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet/*.parquet')"
        )
        res = con.execute(q.oracle)
        drows = {r[0]: tuple(r) for r in res.fetchall()}
        assert srows == drows
