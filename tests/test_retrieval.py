"""BM25 retrieval + Gopher quality gate (round-5 additions)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_sql_custom_mq_datasource_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    Q20,
    bm25_topk,
)


class TestBM25:
    def test_scores_match_hand_computation(self, spark):
        corpus = [
            (0, "apple banana apple cherry"),
            (1, "banana cherry cherry cherry durian"),
            (2, "apple apple apple apple"),
            (3, "durian elderberry fig grape"),
        ]
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        queries = spark.createDataFrame([(0, "apple cherry")], "qid int, qtext string")
        got = {
            (r["qid"], r["doc_id"]): (r["rank"], r["score_q20"])
            for r in bm25_topk(docs, queries).collect()
        }

        # reference computation, mirroring the quantize-then-sum contract
        toks = {d: t.split(" ") for d, t in corpus}
        n_docs = len(toks)
        avgdl = sum(len(v) for v in toks.values()) / n_docs
        dfs = {
            t: sum(1 for v in toks.values() if t in v)
            for t in ["apple", "cherry"]
        }
        expected = {}
        for d, words in toks.items():
            score = 0
            for t in ["apple", "cherry"]:
                tf = words.count(t)
                if tf == 0:
                    continue
                idf = math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
                c = (
                    idf
                    * (tf * (BM25_K1 + 1.0))
                    / (tf + BM25_K1 * (1 - BM25_B + BM25_B * len(words) / avgdl))
                )
                score += math.floor(c * Q20 + 0.5)
            if score:
                expected[d] = score
        assert {d: s for (_, d), (_, s) in got.items()} == expected
        # ranking: descending score, doc_id tiebreak
        ranks = sorted(got.values())
        scores_in_rank_order = [s for _, s in ranks]
        assert scores_in_rank_order == sorted(scores_in_rank_order, reverse=True)

    def test_plan_is_broadcast_shaped(self, spark, sf_dir):
        """The only joins are broadcasts (query terms, df, 1-row stats):
        the corpus is shuffled exactly once (inverted-index groupBy) and
        never sort-merge-joined."""
        from spark_sql_custom_mq_datasource_spark.operators.retrieval import (
            q_bm25_topk,
        )

        plan = (
            q_bm25_topk(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_topk_bounded_per_query(self, spark, sf_dir):
        from spark_sql_custom_mq_datasource_spark.operators.retrieval import (
            BM25_TOP_K,
            q_bm25_topk,
        )

        out = q_bm25_topk(spark, sf_dir)
        per_q = out.groupBy("qid").count().collect()
        assert all(r["count"] <= BM25_TOP_K for r in per_q)
        assert len(per_q) == 3


class TestGopherQuality:
    def test_accept_discriminates_on_fixture(self, spark, sf_dir):
        from spark_sql_custom_mq_datasource_spark.functions.text import (
            q_quality_gopher,
        )

        counts = {
            r["accept"]: r["count"]
            for r in q_quality_gopher(spark, sf_dir).groupBy("accept").count().collect()
        }
        assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0

    def test_metrics_on_known_doc(self, spark):
        from spark_sql_custom_mq_datasource_spark.functions.text import (
            q_quality_gopher,
        )
        import tempfile, os

        # "a a a a b" -> wc=5, top word 4/5, 2-grams [a a, a a, a a, a b]
        # -> dup2 = (4 - 2) / 4 = 0.5
        d = tempfile.mkdtemp(prefix="gopher_")
        spark.createDataFrame(
            [(0, "a a a a b", "en", "s", 9)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        row = q_quality_gopher(spark, d).collect()[0]
        assert row["wc"] == 5
        assert row["dup2_q20"] == int(0.5 * 1048576 + 0.5)
        assert row["topword_q20"] == math.floor(4 / 5 * 1048576 + 0.5)
        assert row["accept"] is False  # too short, too repetitive


class TestDSIR:
    def test_target_like_docs_score_higher(self, spark):
        """Docs whose tokens match the target slice's vocabulary must
        outweigh docs made of pool-only vocabulary."""
        import os
        import tempfile

        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            DSIR_EVAL_MOD,
            dsir_weights,
        )

        # target doc (id 0 ≡ 0 mod 97) uses vocab A; pool docs use A or B
        rows = [
            (0, "alpha beta gamma alpha beta gamma"),
            (1, "alpha beta gamma alpha"),  # target-like pool doc
            (2, "omega psi chi phi"),  # pool-only vocab
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        w = {r["doc_id"]: r["weight_q20"] for r in dsir_weights(docs).collect()}
        assert set(w) == {1, 2}  # target doc excluded from output
        assert w[1] > w[2]

    def test_fixture_weights_are_finite_and_complete(self, spark, sf_dir):
        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            DSIR_EVAL_MOD,
            q_dsir_importance,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import t

        out = q_dsir_importance(spark, sf_dir)
        n_pool = (
            t(spark, sf_dir, "documents")
            .where(F.col("doc_id") % DSIR_EVAL_MOD != 0)
            .count()
        )
        assert out.count() == n_pool
        assert out.where(F.col("weight_q20").isNull()).count() == 0


class TestStreamQualityGate:
    def test_matches_batch_gopher_rules(self, spark, sf_dir):
        """The streaming gate's per-(lang, accept) counts must equal the
        batch q_quality_gopher aggregated the same way — stream/batch
        parity for the stateless quality map."""
        from spark_sql_custom_mq_datasource_spark.functions.text import (
            q_quality_gopher,
        )
        from spark_sql_custom_mq_datasource_spark.plans.registry import (
            get_queries,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import t

        q_stream_quality_gate = get_queries()["q_stream_quality_gate"]

        docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
        batch = {
            (r["lang"], r["accept"]): r["n"]
            for r in q_quality_gopher(spark, sf_dir)
            .join(docs, "doc_id")
            .groupBy("lang", "accept")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        stream = {
            (r["lang"], r["accept"]): r["n_docs"]
            for r in q_stream_quality_gate(spark, sf_dir).collect()
        }
        assert stream == batch


class TestRound5DegenerateInputs:
    """Round-5 operators on empty/degenerate inputs: defined results, no
    NULL cascades, no runtime errors (the same contract ADVICE r04 item 3
    imposed on quantize/token_budget_mix)."""

    def test_bm25_query_with_no_matching_terms(self, spark):
        docs = spark.createDataFrame(
            [(0, "alpha beta gamma")], "doc_id long, text string"
        )
        queries = spark.createDataFrame(
            [(0, "nonexistent words here")], "qid int, qtext string"
        )
        assert bm25_topk(docs, queries).count() == 0

    def test_bm25_empty_corpus(self, spark):
        docs = spark.createDataFrame([], "doc_id long, text string")
        queries = spark.createDataFrame([(0, "alpha")], "qid int, qtext string")
        assert bm25_topk(docs, queries).count() == 0

    def test_dsir_empty_target_slice(self, spark):
        """No doc_id ≡ 0 (mod 97): the target distribution is all-smoothing;
        weights must still be defined for every pool doc."""
        from spark_sql_custom_mq_datasource_spark.operators.curation import (
            dsir_weights,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
        )
        rows = dsir_weights(docs).collect()
        assert len(rows) == 2
        assert all(r["weight_q20"] is not None for r in rows)

    def test_substring_spans_empty_corpus(self, spark):
        from spark_sql_custom_mq_datasource_spark.operators.dedup import (
            substring_dup_spans,
        )

        docs = spark.createDataFrame([], "doc_id long, text string")
        assert substring_dup_spans(docs).count() == 0


class TestHeavyHitters:
    def test_mg_guarantee_on_skewed_stream(self, spark):
        """An item with frequency > N/k must survive the sketch and be
        exactly counted; tail items below the floor must be excluded."""
        from spark_sql_custom_mq_datasource_spark.functions.text import (
            heavy_hitters,
        )

        rows = [("hot",)] * 500 + [(f"tail{i}",) for i in range(400)]
        grams = spark.createDataFrame(rows, "gram string").repartition(8)
        got = {r["gram"]: r["cnt"] for r in heavy_hitters(grams, top=5, k=10).collect()}
        # N=900, floor=90: only "hot" qualifies, with its EXACT count
        assert got == {"hot": 500}

    def test_matches_plain_exact_topk_on_fixture(self, spark, sf_dir):
        """On the fixture the sketch path must equal the exact top-k with
        the same frequency floor (the oracle's own semantics)."""
        from spark_sql_custom_mq_datasource_spark.functions.text import (
            HH_TOP,
            MG_K,
            q_heavy_hitters_2gram,
        )
        from spark_sql_custom_mq_datasource_spark.plans.util import tp

        docs = tp(spark, sf_dir, "documents")
        g2 = F.expr(
            "transform(sequence(0, size(split(trim(text), ' ')) - 2),"
            " i -> concat(split(trim(text), ' ')[i], ' ',"
            "             split(trim(text), ' ')[i+1]))"
        )
        grams = docs.where(F.size(F.split(F.trim("text"), " ")) >= 2).select(
            F.explode(g2).alias("gram")
        )
        n = grams.count()
        exact = (
            grams.groupBy("gram")
            .count()
            .where(F.col("count") * MG_K > n)
            .orderBy(F.desc("count"), "gram")
            .limit(HH_TOP)
            .collect()
        )
        sketched = q_heavy_hitters_2gram(spark, sf_dir).collect()
        assert [(r["gram"], r["count"]) for r in exact] == [
            (r["gram"], r["cnt"]) for r in sketched
        ]

    def test_sketch_trailer_total_is_exact(self, spark):
        """The corpus total rides the sketch pass (r17): each partition's
        trailer row (gram NULL, n = its input row count) must sum to the
        EXACT grams count, with one trailer per partition."""
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from spark_sql_custom_mq_datasource_spark.functions.text import (
            _mg_partial,
        )

        rows = [(f"g{i % 37}",) for i in range(1000)]
        grams = spark.createDataFrame(rows, "gram string").repartition(8)
        sketch = grams.mapInPandas(
            _mg_partial(10),
            StructType(
                [StructField("gram", StringType()), StructField("n", LongType())]
            ),
        )
        agg = sketch.agg(
            F.sum("n").alias("total"),
            F.count(F.when(F.col("gram").isNull(), 1)).alias("trailers"),
        ).collect()[0]
        assert agg["total"] == 1000
        assert agg["trailers"] == 8


class TestPersistedLSHIndex:
    def test_persisted_probe_matches_in_memory_path(self, spark, sf_dir):
        """The durable index must answer identically to the in-memory
        bucket join — index persistence cannot change results."""
        from spark_sql_custom_mq_datasource_spark.plans.registry import get_queries

        qs = get_queries()
        mem = [tuple(r) for r in qs["q_ann_lsh_bucketed"](spark, sf_dir).collect()]
        disk = [tuple(r) for r in qs["q_ann_lsh_persisted"](spark, sf_dir).collect()]
        assert mem == disk

    def test_index_layout_is_bucket_partitioned(self, spark, sf_dir):
        import os

        from spark_sql_custom_mq_datasource_spark.operators.similarity import (
            lsh_index_path,
        )

        path = lsh_index_path(spark, sf_dir)
        buckets = [d for d in os.listdir(path) if d.startswith("bucket=")]
        assert len(buckets) > 1  # real partition directories, prunable


class TestMergeUpsert:
    def test_update_insert_delete_semantics(self, spark):
        from spark_sql_custom_mq_datasource_spark.sources.maintenance import (
            merge_upsert,
        )

        base = spark.createDataFrame(
            [(1, "a", False), (2, "b", False), (3, "c", False)],
            "k long, v string, _deleted boolean",
        )
        updates = spark.createDataFrame(
            [(2, "B", False), (4, "d", False), (3, None, True)],
            "k long, v string, _deleted boolean",
        )
        got = {
            r["k"]: r["v"] for r in merge_upsert(base, updates, "k").collect()
        }
        # 1 untouched, 2 updated, 3 tombstoned away, 4 inserted
        assert got == {1: "a", 2: "B", 4: "d"}


class TestTfidf:
    def test_matches_hand_computation(self, spark):
        import math

        from spark_sql_custom_mq_datasource_spark.operators.retrieval import (
            tfidf_top_terms,
        )

        corpus = [
            (0, "apple apple banana"),
            (1, "banana cherry"),
            (2, "cherry cherry cherry durian"),
        ]
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {
            (r["doc_id"], r["term"]): (r["rank"], r["tfidf_q20"])
            for r in tfidf_top_terms(docs, k=2).collect()
        }
        toks = {d: t.split(" ") for d, t in corpus}
        n = len(toks)
        dfs = {"apple": 1, "banana": 2, "cherry": 2, "durian": 1}
        expected = {}
        for d, words in toks.items():
            scores = {}
            for t in set(words):
                idf = math.log((1.0 + n) / (1.0 + dfs[t])) + 1.0
                scores[t] = math.floor(words.count(t) * idf * Q20 + 0.5)
            top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
            for rank, (t, s) in enumerate(top, 1):
                expected[(d, t)] = (rank, s)
        assert got == expected


class TestPersistedBm25Index:
    def test_probe_prunes_buckets_and_matches_inline(self, spark, tmp_path):
        from pyspark.sql import functions as F
        from spark_sql_custom_mq_datasource_spark.operators.retrieval import (
            BM25_INDEX_BUCKETS,
            bm25_topk,
            bm25_topk_from_index,
            write_bm25_index,
        )

        corpus = [
            (i, f"apple banana w{i} cherry") for i in range(40)
        ] + [(100, "durian elderberry")]
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        queries = spark.createDataFrame(
            [(0, "apple durian")], "qid int, qtext string"
        )
        path = str(tmp_path / "idx")
        write_bm25_index(docs, path)

        got = sorted(
            map(tuple, bm25_topk_from_index(spark, path, queries).collect())
        )
        want = sorted(map(tuple, bm25_topk(docs, queries).collect()))
        assert got == want and len(want) > 0

        # the probe's scan must carry a partition filter on bkt (directory
        # pruning — probe I/O is O(query buckets), not O(index))
        probe = bm25_topk_from_index(spark, path, queries)
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "bkt" in plan
