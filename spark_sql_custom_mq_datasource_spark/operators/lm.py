"""Perplexity-style quality scoring via a corpus-trained hashed bigram LM.

The CCNet/Gopher-era quality signal the gate rules in functions/text.py
cannot express: score each document by how (un)predictable its token
transitions are under a language model trained on the corpus itself.
CCNet uses a KenLM 5-gram; the Spark-scalable, dependency-free analogue
is a hashed bigram model with Laplace smoothing — the same shape DSIR
(operators/curation.py) uses for importance weighting, applied here to
per-transition negative log-likelihood.

Model
  C1[h(w1)]      — count of transitions starting at w1 (hashed, B buckets)
  C2[h(w1,w2)]   — count of transitions (w1,w2)       (hashed, B buckets)
  P(w2|w1)     ≈ (C2 + 1) / (C1 + B)   (Laplace over the hashed vocab;
                                         defined for unseen transitions)
  doc NLL       = Σ −ln P over the doc's transitions; avg = NLL / n.

Hash collisions make this a heuristic score, not a normalized LM — the
standard trade (hashing trick) that bounds the model at B rows per table
regardless of vocabulary, so it BROADCASTS at any corpus size.

Scale design (100 TB corpus, 1000 executors)
  * Training is ONE pass over the corpus: per-doc transition-hash arrays
    (a projection), exploded once, aggregated twice (C1, C2) — two
    shuffles over (int64, count) pairs, output ≤ B rows each.
  * Scoring is a second scan whose model joins are broadcasts (≤ B rows);
    per-transition contributions are Q20-quantized and SUMMED AS INT64
    (the repo convention: integer addition is associative, so Spark's and
    DuckDB's aggregation orders cannot diverge; an ln() ulp would have to
    land within ~1e-10 of a quantization boundary to flip a value).
  * Word hashes are md5-derived (functions/text.word_hash), identical in
    Spark and DuckDB — the oracle retrains the same model in SQL.

Reference parity note: the reference repo is a source-only mock MQ
(/root/reference/src/main/java/org/example/); this module is part of the
LLM-data-pipeline brief (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..plans.util import t, tp

LM_BUCKETS = 65536  # hashed-vocab size B: model tables bounded at B rows
LM_DOC_MOD = 25  # registered query reports this deterministic doc slice
Q20 = 1048576.0


def _words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), " ")


def _bucket(col: Column) -> Column:
    """md5-derived 60-bit hash -> non-negative bucket id < LM_BUCKETS."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint"),
        F.lit(LM_BUCKETS),
    )


def transition_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, n_trans, u, b) — one row per token transition: u = bucket
    of the first word, b = bucket of the joined bigram. Built as a per-row
    array projection (no shuffle); the explode is the corpus fan-out.

    Shape note: the token pairing is slice+zip_with (the lambda only
    builds a struct from already-computed elements) and the md5 hashing
    happens AFTER the explode on scalar string columns — putting
    element_at(split(text), i) inside an array lambda re-splits the whole
    text once per transition through projection collapse (the documented
    HOF re-inline trap; measured 10 s -> ~1 s at sf0.01)."""
    ws = _words("text")
    n = F.size(ws)
    pairs = F.zip_with(
        F.slice(ws, 1, n - 1),
        F.slice(ws, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.where(n >= 2)
        .select("doc_id", (n - 1).cast("bigint").alias("n_trans"), pairs.alias("ps"))
        .select("doc_id", "n_trans", F.explode("ps").alias("p"))
        .select(
            "doc_id",
            "n_trans",
            _bucket(F.col("p.w1")).alias("u"),
            _bucket(F.concat_ws(" ", F.col("p.w1"), F.col("p.w2"))).alias("b"),
        )
    )


def train_bigram_lm(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(c1, c2): prefix counts keyed by u, transition counts keyed by b.
    Both bounded at LM_BUCKETS rows — broadcastable at any corpus size."""
    trans = transition_hashes(docs)
    c1 = trans.groupBy("u").agg(F.count("*").alias("c1"))
    c2 = trans.groupBy("b").agg(F.count("*").alias("c2"))
    return c1, c2


def score_perplexity(docs: DataFrame) -> DataFrame:
    """(doc_id, n_trans, nll_q20, avg_nll) per doc with >= 2 tokens:
    corpus-self-trained bigram NLL. nll_q20 is the exact int64 sum of
    Q20-quantized per-transition −ln P; avg_nll is ONE double division
    of identical ints on both engines."""
    trans = transition_hashes(docs)
    # DISK_ONLY: the transition table feeds training (twice) and scoring;
    # without a persist the tokenize+md5 projection re-runs per consumer
    # (the substring-span lesson, VERDICT r05 item 1).
    from pyspark.storagelevel import StorageLevel

    trans = trans.persist(StorageLevel.DISK_ONLY)
    c1 = trans.groupBy("u").agg(F.count("*").alias("c1"))
    c2 = trans.groupBy("b").agg(F.count("*").alias("c2"))
    nll = -F.log(
        (F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.lit(float(LM_BUCKETS)))
    )
    per_trans = (
        trans.join(F.broadcast(c1), "u")
        .join(F.broadcast(c2), "b")
        .select(
            "doc_id",
            "n_trans",
            F.floor(nll * F.lit(Q20) + F.lit(0.5)).cast("bigint").alias("q"),
        )
    )
    return per_trans.groupBy("doc_id", "n_trans").agg(
        F.sum("q").alias("nll_q20"),
        (F.sum("q").cast("double") / F.lit(Q20) / F.col("n_trans")).alias("avg_nll"),
    )


_SQL_PERPLEXITY = f"""
  WITH w AS (
    SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
  ),
  trans AS (
    SELECT doc_id, CAST(len(ws) - 1 AS BIGINT) AS n_trans,
           CAST(('0x' || substr(md5(ws[i]), 1, 15)) AS BIGINT)
             % {LM_BUCKETS} AS u,
           CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i + 1]), 1, 15)) AS BIGINT)
             % {LM_BUCKETS} AS b
    FROM w, unnest(generate_series(1, len(ws) - 1)) AS s(i)
    WHERE len(ws) >= 2
  ),
  c1 AS (SELECT u, COUNT(*) AS c1 FROM trans GROUP BY u),
  c2 AS (SELECT b, COUNT(*) AS c2 FROM trans GROUP BY b),
  q AS (
    SELECT t.doc_id, t.n_trans,
           CAST(floor(-ln((c2.c2 + 1.0) / (c1.c1 + {LM_BUCKETS}.0))
                      * {Q20} + 0.5) AS BIGINT) AS q
    FROM trans t JOIN c1 ON t.u = c1.u JOIN c2 ON t.b = c2.b
  )
  SELECT doc_id, n_trans, CAST(SUM(q) AS BIGINT) AS nll_q20,
         CAST(SUM(q) AS DOUBLE) / {Q20} / n_trans AS avg_nll
  FROM q
  WHERE doc_id % {LM_DOC_MOD} = 0
  GROUP BY doc_id, n_trans
  ORDER BY doc_id
"""


@register(
    "q_lm_perplexity",
    _SQL_PERPLEXITY,
    headline=True,
    doc="bigram-LM perplexity quality score (CCNet-style, hashed model): "
    "train Laplace-smoothed hashed bigram counts on the corpus (one "
    "pass, two bounded aggregates), score every doc's transition NLL "
    "via broadcast joins; reports the deterministic doc_id%25 slice.",
)
def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    return (
        score_perplexity(docs)
        .where(F.col("doc_id") % LM_DOC_MOD == 0)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Persisted model: train once, score many. The deployment shape of a
# quality model at 100 TB is NOT self-scoring a corpus in one job — it is
# a reference model trained on a trusted corpus, persisted, and applied
# to every incoming batch (the streaming twin in streaming/pipelines.py
# scores micro-batches against exactly this artifact). The model is two
# bounded tables, so "persist" is two tiny parquet writes and "load" is
# two broadcastable reads.
# --------------------------------------------------------------------------


def write_bigram_lm(docs: DataFrame, path: str) -> None:
    """Persist the trained model: c1/ and c2/ parquet (≤ LM_BUCKETS rows
    each) under `path`."""
    import os

    c1, c2 = train_bigram_lm(docs)
    c1.write.mode("overwrite").parquet(os.path.join(path, "c1"))
    c2.write.mode("overwrite").parquet(os.path.join(path, "c2"))


def score_with_lm(docs: DataFrame, c1: DataFrame, c2: DataFrame) -> DataFrame:
    """Score docs against an EXTERNAL model (loaded or just-trained) —
    the shared kernel of the persisted and streaming paths. Transitions
    absent from the model (unseen prefix bucket) fall back to the
    Laplace floor: c1 = 0, c2 = 0 via left joins + coalesce."""
    trans = transition_hashes(docs)
    nll = -F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(LM_BUCKETS)))
    )
    per_trans = (
        trans.join(F.broadcast(c1), "u", "left")
        .join(F.broadcast(c2), "b", "left")
        .select(
            "doc_id",
            "n_trans",
            F.floor(nll * F.lit(Q20) + F.lit(0.5)).cast("bigint").alias("q"),
        )
    )
    return per_trans.groupBy("doc_id", "n_trans").agg(
        F.sum("q").alias("nll_q20"),
        (F.sum("q").cast("double") / F.lit(Q20) / F.col("n_trans")).alias("avg_nll"),
    )


def load_bigram_lm(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    import os

    return (
        spark.read.parquet(os.path.join(path, "c1")),
        spark.read.parquet(os.path.join(path, "c2")),
    )


@register(
    "q_lm_perplexity_persisted",
    _SQL_PERPLEXITY,
    doc="perplexity scoring against a PERSISTED bigram model (train once "
    "-> two bounded parquet tables -> broadcast-loaded at scoring time); "
    "must return exactly the inline self-scored result (same oracle).",
)
def q_lm_perplexity_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.util import work_dir

    docs = tp(spark, sf_dir, "documents")
    path = work_dir("lm_model")
    write_bigram_lm(docs, path)
    c1, c2 = load_bigram_lm(spark, path)
    return (
        score_with_lm(docs, c1, c2)
        .where(F.col("doc_id") % LM_DOC_MOD == 0)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Deterministic per-group bottom-k sampling: the "cap every source at k
# docs" curation step. Hash-ranked (md5 of the id), so the sample is
# uniform-ish, reproducible under reprocessing/backfill (no RNG state to
# coordinate across 1000 executors), and stable when rows are appended
# outside the winning set. One shuffle on the group key; per-group top-k
# via window (never a global sort).
# --------------------------------------------------------------------------

SAMPLE_K = 20


@register(
    "q_sample_per_source_bottomk",
    f"""
    WITH ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT source, CAST(rk AS INTEGER) AS rk, doc_id
    FROM ranked WHERE rk <= {SAMPLE_K}
    ORDER BY source, rk
    """,
    doc="deterministic per-source bottom-k sample: rank docs inside each "
    "source by md5(doc_id) (uniform, RNG-free, reproducible), keep k — "
    "the per-source cap step of corpus mixing; one shuffle, windowed "
    "top-k, no global sort.",
)
def q_sample_per_source_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= SAMPLE_K)
        .select("source", F.col("rk").cast("int").alias("rk"), "doc_id")
        .orderBy("source", "rk")
    )


# --------------------------------------------------------------------------
# Curriculum binning by perplexity: split the corpus into difficulty tiers
# for ordered training (easy -> hard). Fixed-domain NLL edges, not
# rank-based ntile: a global ntile needs a single-partition sort of the
# corpus (the exact plan shape the repo bans), while fixed edges are a
# pure projection — and the comparison is against the bit-identical
# avg_nll double, so no cross-engine percentile-interpolation ulp can
# flip a bin. On a real pipeline the edges come from a one-pass
# percentile_approx sweep; they are pinned here so the gate is exact.
# --------------------------------------------------------------------------

CURRICULUM_EDGES = (7.60, 7.66, 7.72)  # 4 tiers over the fixture NLL range


def curriculum_bin(avg_nll: Column) -> Column:
    b = F.lit(1)
    for e in CURRICULUM_EDGES:
        b = b + F.when(avg_nll >= F.lit(e), 1).otherwise(0)
    return b.cast("int")


@register(
    "q_curriculum_by_perplexity",
    f"""
    {_SQL_PERPLEXITY.split("SELECT doc_id, n_trans")[0]}
    , per_doc AS (
      SELECT doc_id, n_trans, CAST(SUM(q) AS BIGINT) AS nll_q20,
             CAST(SUM(q) AS DOUBLE) / {Q20} / n_trans AS avg_nll
      FROM q GROUP BY doc_id, n_trans
    )
    SELECT (1 + CASE WHEN avg_nll >= {CURRICULUM_EDGES[0]} THEN 1 ELSE 0 END
              + CASE WHEN avg_nll >= {CURRICULUM_EDGES[1]} THEN 1 ELSE 0 END
              + CASE WHEN avg_nll >= {CURRICULUM_EDGES[2]} THEN 1 ELSE 0 END)
             AS tier,
           COUNT(*) AS n_docs,
           CAST(SUM(n_trans) AS BIGINT) AS total_trans,
           CAST(SUM(nll_q20) AS BIGINT) AS nll_q20_sum
    FROM per_doc
    GROUP BY tier ORDER BY tier
    """,
    doc="curriculum tiers by LM perplexity: every doc scored, assigned to "
    "one of 4 fixed-edge difficulty tiers (easy->hard ordered training); "
    "pure projection binning — no global sort, no rank window over the "
    "corpus.",
)
def q_curriculum_by_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    scored = score_perplexity(docs)
    return (
        scored.select(
            curriculum_bin(F.col("avg_nll")).alias("tier"),
            "n_trans",
            "nll_q20",
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_trans").cast("bigint").alias("total_trans"),
            F.sum("nll_q20").cast("bigint").alias("nll_q20_sum"),
        )
        .orderBy("tier")
    )


# --------------------------------------------------------------------------
# Weighted deterministic sampling (Efraimidis–Spirakis with hash-derived
# uniforms): draw k docs per source with probability proportional to a
# weight — here token count, the "sample long docs preferentially" mix
# knob. ES key = u^(1/w) with u ~ U(0,1); taking u from md5(doc_id)
# makes the draw reproducible under reprocessing and stable under
# appends, like the uniform bottom-k above. The ranking key is
# Q20-quantized (ln ulps between JVM and libm must not flip an order)
# with doc_id as the tiebreak — the same contract BM25 scores use.
# One shuffle on the group key, windowed top-k, no global sort.
# --------------------------------------------------------------------------

WSAMPLE_K = 10
_U_SCALE = float(1 << 52)


def _uniform_from_id(col: Column) -> Column:
    """Deterministic u in (0, 1): low 52 bits of the md5-derived hash,
    +1 to exclude zero (ln(0) is -inf)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast("bigint")
    return (h + F.lit(1.0)) / F.lit(_U_SCALE + 2.0)


@register(
    "q_sample_weighted_per_source",
    f"""
    WITH w AS (
      SELECT doc_id, source,
             CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS wt,
             (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                   AS BIGINT) + 1.0) / {_U_SCALE + 2.0} AS u
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, source,
             CAST(floor(ln(u) / wt * 1048576.0 + 0.5) AS BIGINT) AS key_q20
      FROM w WHERE wt > 0
    ),
    ranked AS (
      SELECT source, doc_id, key_q20,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY key_q20 DESC, doc_id) AS rk
      FROM keyed
    )
    SELECT source, CAST(rk AS INTEGER) AS rk, doc_id, key_q20
    FROM ranked WHERE rk <= {WSAMPLE_K}
    ORDER BY source, rk
    """,
    doc="weighted deterministic sampling (Efraimidis-Spirakis, hash "
    "uniforms): k docs per source drawn with probability proportional "
    "to token count — reproducible (no RNG state), append-stable, "
    "Q20-quantized ranking keys with id tiebreak so a cross-engine ln "
    "ulp cannot flip the order.",
)
def q_sample_weighted_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    wt = F.size(F.split(F.trim("text"), " ")).cast("double")
    u = _uniform_from_id(F.col("doc_id"))
    # maximizing u^(1/w)  ==  maximizing ln(u)/w  (ln is monotone; the
    # division keeps magnitudes in a Q20-friendly range)
    keyed = docs.where(wt > 0).select(
        "doc_id",
        "source",
        F.floor(F.log(u) / wt * F.lit(1048576.0) + F.lit(0.5))
        .cast("bigint")
        .alias("key_q20"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("key_q20"), "doc_id")
    return (
        keyed.select("source", "doc_id", "key_q20", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= WSAMPLE_K)
        .select("source", F.col("rk").cast("int").alias("rk"), "doc_id", "key_q20")
        .orderBy("source", "rk")
    )
