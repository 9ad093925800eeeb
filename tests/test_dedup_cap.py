"""Stop-shingle document-frequency cap (VERDICT.md r03 item 8) and the ANN
query-collect guard (item 9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_sql_custom_mq_datasource_spark.operators.dedup import (
    STOP_SHINGLE_MAX_DF,
    jaccard_pairs_from_sets,
    shingle_sets_cached,
)
from spark_sql_custom_mq_datasource_spark.operators.similarity import (
    MAX_COLLECTED_QUERIES,
    _collect_query_matrix,
    ann_bruteforce_topk,
)
from spark_sql_custom_mq_datasource_spark.plans.util import t


class TestStopShingleCap:
    def test_cap_filter_lands_in_plan(self, spark, sf_dir):
        """The df cap must be a real filter in the optimized plan (pushed
        below the index self-join), not a post-hoc row drop."""
        sets = shingle_sets_cached(spark, sf_dir)
        plan = jaccard_pairs_from_sets(sets, max_shingle_df=3)._jdf.queryExecution().optimizedPlan().toString()
        assert "df#" in plan and "<= 3" in plan, plan

    def test_pruning_cap_preserves_pairs(self, spark):
        """A cap that actually prunes index shingles (df<=3 removes the
        ~10% hottest at sf0.01) must not lose any qualifying pair when the
        cap sits above the dup-cluster size: verification is exact over the
        full shingle arrays and such pairs still share sub-cap shingles.
        Pinned to sf0.01 — at sf0.001 dup clusters are larger than 3, so a
        df<=3 cap correctly demotes those wholesale-boilerplate pairs (the
        documented recall trade-off), which is the wrong corpus for an
        equality check."""
        sets = shingle_sets_cached(spark, "/root/testdata/sf0.01")
        base = sorted(
            (r.da, r.db, r.common)
            for r in jaccard_pairs_from_sets(sets).collect()
        )
        capped = sorted(
            (r.da, r.db, r.common)
            for r in jaccard_pairs_from_sets(sets, max_shingle_df=3).collect()
        )
        assert capped == base

    def test_registered_query_cap_is_noop_at_fixture_scale(self, spark, sf_dir):
        """The registered query's conservative cap must sit above the
        fixture's max shingle df, keeping the DuckDB oracle exact."""
        sets = shingle_sets_cached(spark, sf_dir)
        max_df = (
            sets.select(F.explode("hset").alias("s"))
            .groupBy("s")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert max_df < STOP_SHINGLE_MAX_DF


class TestAnnCollectGuard:
    def test_oversized_query_set_raises(self, spark, sf_dir, monkeypatch):
        import spark_sql_custom_mq_datasource_spark.operators.similarity as sim

        monkeypatch.setattr(sim, "MAX_COLLECTED_QUERIES", 3)
        emb = t(spark, sf_dir, "embeddings")
        assert emb.count() > 3
        with pytest.raises(ValueError, match="MAX_COLLECTED_QUERIES"):
            sim.ann_bruteforce_topk(emb, emb).collect()

    def test_transfer_is_bounded_not_just_checked(self, spark, sf_dir):
        """The guard must bound the driver transfer itself: the plan under
        the collect carries a limit of cap+1."""
        emb = t(spark, sf_dir, "embeddings")
        limited = emb.select("vec_id", "embedding").limit(MAX_COLLECTED_QUERIES + 1)
        assert f"{MAX_COLLECTED_QUERIES + 1}" in limited._jdf.queryExecution().optimizedPlan().toString()

    def test_guard_passes_contract_sized_queries(self, spark, sf_dir):
        emb = t(spark, sf_dir, "embeddings")
        qids, qmat = _collect_query_matrix(emb.where(F.col("vec_id") < 5))
        assert len(qids) == 5 and qmat.shape[0] == 5
        topk = ann_bruteforce_topk(emb, emb.where(F.col("vec_id") < 5))
        assert topk.groupBy("qid").count().agg(F.max("count")).collect()[0][0] <= 5


class TestAdversarialSkew:
    """VERDICT r04 item 5: demonstrate — not just argue — that the
    stop-shingle cap keeps candidate generation bounded on a corpus built
    to defeat prefix filtering alone: documents composed ENTIRELY of
    boilerplate sentences drawn zipf-style from a tiny pool, so every
    shingle (including each doc's 'rarest') is hot."""

    N_DOCS = 400
    POOL = 6  # boilerplate sentence pool size — tiny, so EVERY shingle is hot

    @staticmethod
    def _boiler_corpus(spark):
        import random

        rng = random.Random(7)
        sentences = [
            " ".join(f"w{b}_{i}" for i in range(6)) for b in range(TestAdversarialSkew.POOL)
        ]
        rows = [
            (d, " ".join(rng.choices(sentences, k=4)))
            for d in range(TestAdversarialSkew.N_DOCS)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_cap_bounds_candidate_fanout(self, spark):
        from spark_sql_custom_mq_datasource_spark.operators.dedup import (
            _candidate_pairs,
            _shingle_sets,
        )

        sets = _shingle_sets(self._boiler_corpus(spark)).persist()
        try:
            uncapped = _candidate_pairs(sets, threshold=0.8).count()
            capped = _candidate_pairs(sets, threshold=0.8, max_shingle_df=8).count()
            # Uncapped: every doc's prefix shingles are hot (prefix filtering
            # alone can't save a pure-boilerplate corpus) -> near-quadratic
            # candidate blowup, >10 pairs per doc even at only 400 docs.
            assert uncapped > 10 * self.N_DOCS, uncapped
            # Capped: the inverted index keeps only df<=8 shingles, so the
            # worst single-shingle fan-out is 8*7/2 pairs and the total is
            # a small multiple of the corpus size, not O(n^2). (Here it is
            # 0: every shingle is wholesale boilerplate — exactly the class
            # of pair the cap deliberately routes to exact dedup.)
            assert capped < 2 * self.N_DOCS, (uncapped, capped)
        finally:
            sets.unpersist()

    def test_capped_index_max_fanout_per_key(self, spark):
        """Per-join-key balance: after the cap, no shingle key can fan out
        past cap^2 — the skew that would stall one task is structurally
        removed from the join input."""
        from pyspark.sql import functions as F
        from spark_sql_custom_mq_datasource_spark.operators.dedup import (
            _shingle_sets,
        )

        cap = 8
        sets = _shingle_sets(self._boiler_corpus(spark))
        sh = sets.select("doc_id", F.explode("hset").alias("s"))
        freq = sh.groupBy("s").agg(F.count("*").alias("df"))
        max_df_uncapped = freq.agg(F.max("df")).collect()[0][0]
        max_df_capped = (
            freq.where(F.col("df") <= cap).agg(F.max("df")).collect()[0][0]
        )
        assert max_df_uncapped > 100  # the corpus IS skewed
        # None when the cap empties the index entirely (all-boilerplate) —
        # vacuously balanced; otherwise every key is at or under the cap.
        assert max_df_capped is None or max_df_capped <= cap


class TestIncrementalMinhashEquivalence:
    def test_planted_straddling_pairs_match_full_recompute(
        self, spark, tmp_path
    ):
        """Adversarial corpus for the incremental index: near-dup pairs
        planted to straddle the corpus/batch cut (including one at
        J=8/9, just above threshold, and one at J=8/11, below), plus an
        in-batch pair and an exact cross-cut dup. The incremental result
        must equal the full-recompute classification per source."""
        from spark_sql_custom_mq_datasource_spark.operators.dedup import (
            JACCARD_THRESHOLD,
            jaccard_pairs,
            q_dedup_incremental_minhash,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import _cache
        from pyspark.sql import functions as F

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        far = "one two three four five six seven eight nine ten eleven"
        rows = [
            # corpus (cut = floor(100*3/4) = 75)
            (10, "s1", base),
            (20, "s2", far),
            (30, "s1", "completely different text with its own words here"),
            # batch: exact dup of corpus doc
            (80, "s1", base),
            # batch: near dup of corpus doc, J = 8/9 >= 0.8
            (85, "s2", base + " extra"),
            # batch: NOT a dup, J = 8/11 < 0.8 (three appended words)
            (90, "s1", base + " one two three"),
            # batch: in-batch pair (95 earlier, 99 dup) — text disjoint
            # from every corpus doc so the pair stays batch-internal
            (95, "s2", "special pair body shared by two batch docs only"),
            (99, "s2", "special pair body shared by two batch docs only"),
            (100, "s1", "a fresh unique batch document nothing like others"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        sf = str(tmp_path)
        df.write.parquet(f"{sf}/documents.parquet")
        _cache.clear()
        got = {
            r["source"]: (
                r["n_batch"],
                r["n_dup_vs_corpus"],
                r["n_dup_in_batch"],
                r["n_new_unique"],
            )
            for r in q_dedup_incremental_minhash(spark, sf).collect()
        }
        # full recompute with the exact inverted-index path
        pairs = jaccard_pairs(df, JACCARD_THRESHOLD).collect()
        cut = 75
        vs_corpus = {p.db for p in pairs if p.da <= cut and p.db > cut}
        in_batch = {
            p.db for p in pairs if p.da > cut and p.db > cut
        } - vs_corpus
        batch = [(r[0], r[1]) for r in rows if r[0] > cut]
        want = {}
        for src in ("s1", "s2"):
            ids = [i for i, s in batch if s == src]
            want[src] = (
                len(ids),
                sum(1 for i in ids if i in vs_corpus),
                sum(1 for i in ids if i in in_batch),
                sum(1 for i in ids if i not in vs_corpus and i not in in_batch),
            )
        _cache.clear()
        from spark_sql_custom_mq_datasource_spark.operators import dedup as dd

        # release the tmp corpus's session shingle cache
        for k in [k for k in dd._sets_cache if k[1] == sf]:
            dd._sets_cache.pop(k).unpersist()
        assert got == want
        # sanity: the adversarial plants actually exercise every class
        assert want["s1"] == (3, 1, 0, 2)   # 80 dup, 90 survives (J<0.8)
        assert want["s2"] == (3, 1, 1, 1)   # 85 vs corpus, 99 in-batch
