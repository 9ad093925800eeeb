"""Training-data curation operators — the pipeline stages between "raw
corpus" and "training set" (BASELINE.json north star: the operations a
large-scale LLM data pipeline needs beyond the reference's own surface).

Four stages, each oracle-checked and each built on a scale-safe primitive:

  split      deterministic train/val/test assignment by content-free doc
             hash — no global state, no sampling seed coordination across
             executors, stable under reprocessing/backfill (the property
             that matters at 100 TB: a doc's split NEVER changes when the
             corpus around it does).
  curate     quality-filter → language-filter → exact-dedup → stats: the
             canonical filter funnel, all map-side until the dedup's one
             hash shuffle.
  mix        weighted upsampling of low-resource slices via
             explode(array_repeat(...)) — replication is declared in the
             plan (map-side fan-out, no shuffle), not done by a driver loop.
  pack       greedy in-order packing of docs into fixed token-capacity
             bins (context windows) via one running-sum window per source —
             the standard "sequence packing" approximation; bin id =
             floor((cumsum - tokens) / capacity).

Hash portability: the split hash is md5-derived (word_hash convention,
functions/text.py) so DuckDB computes the identical assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..plans.util import t, tp
from ..functions.text import token_count

SPLIT_BUCKETS = 100
TRAIN_LT, VAL_LT = 90, 95  # train <90, val 90-94, test 95-99
PACK_CAPACITY = 512  # tokens per packed sequence (fixture-sized)
MIX_WEIGHTS = {"en": 1, "de": 2, "es": 2, "fr": 2, "zh": 3}  # upsample low-resource


def split_bucket(doc_id: Column | str) -> Column:
    """Deterministic, content-free bucket in [0, SPLIT_BUCKETS): md5 of the
    stringified id, first 60 bits, mod buckets. Engine-portable and stable
    under any corpus mutation around the doc."""
    c = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(SPLIT_BUCKETS))


_SQL_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) "
    f"% {SPLIT_BUCKETS}"
)


def assign_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    b = split_bucket(id_col)
    return df.withColumn(
        "split",
        F.when(b < TRAIN_LT, "train").when(b < VAL_LT, "val").otherwise("test"),
    )


@register(
    "q_split_train_val_test",
    f"""
    WITH s AS (
      SELECT lang,
             CASE WHEN {_SQL_BUCKET} < {TRAIN_LT} THEN 'train'
                  WHEN {_SQL_BUCKET} < {VAL_LT} THEN 'val'
                  ELSE 'test' END AS split,
             len(string_split(trim(text), ' ')) AS n_tokens
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY split, lang ORDER BY split, lang
    """,
    doc="deterministic hash-based train/val/test split (90/5/5), stable "
    "under reprocessing; per-(split, lang) doc and token counts.",
)
def q_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = assign_split(tp(spark, sf_dir, "documents"))
    return (
        docs.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count("text")).alias("total_tokens"),
        )
        .orderBy("split", "lang")
    )


# --------------------------------------------------------------------------
# Curation funnel. The quality expression is the q_text_quality one
# (functions/text.py); the threshold keeps roughly the better half.
# --------------------------------------------------------------------------

_SQL_QUALITY = """
    round(0.4 * least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
        + 0.3 * (1.0 - least(5.0 * (CAST((length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))) AS DOUBLE) / length(text)), 1.0))
        + 0.3 * least(4.0 * (CAST(len(list_filter(string_split(trim(text), ' '),
              w -> lower(w) IN ('the','a','of','and','to','in','is','it','for','on')))
              AS DOUBLE) / len(string_split(trim(text), ' '))), 1.0), 6)
"""


@register(
    "q_curation_pipeline",
    f"""
    WITH scored AS (
      SELECT doc_id, source, text, {_SQL_QUALITY} AS q
      FROM documents
      WHERE lang IN ('en', 'de')
    ), kept AS (
      SELECT source, md5(lower(text)) AS h, MIN(doc_id) AS keep_id,
             MIN(q) AS q, MIN(len(string_split(trim(text), ' '))) AS n_tokens
      FROM scored
      WHERE q >= 0.5
      GROUP BY source, md5(lower(text))
    )
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(q AS DECIMAL(10,6))) AS DOUBLE) / COUNT(*) AS avg_quality
    FROM kept GROUP BY source ORDER BY source
    """,
    doc="curation funnel: lang filter -> quality >= 0.5 -> exact dedup "
    "(min-id per content hash) -> per-source stats. All map-side until the "
    "dedup's single hash shuffle.",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import quality_score

    docs = tp(spark, sf_dir, "documents").where(F.col("lang").isin("en", "de"))
    scored = docs.select(
        "doc_id", "source", "text", quality_score("text").alias("q")
    ).where(F.col("q") >= 0.5)
    kept = scored.groupBy("source", F.md5(F.lower("text")).alias("h")).agg(
        F.min("doc_id").alias("keep_id"),
        F.min("q").alias("q"),
        F.min(token_count("text")).alias("n_tokens"),
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (
                F.sum(F.col("q").cast("decimal(10,6)")).cast("double") / F.count("*")
            ).alias("avg_quality"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Weighted mixing / upsampling.
# --------------------------------------------------------------------------


def upsample_by_weight(df: DataFrame, weight: Column) -> DataFrame:
    """Repeat each row `weight` times — declared replication (array_repeat +
    explode, map-side fan-out inside the scan stage), never a driver loop
    or a union of W scans."""
    return df.withColumn("_copy", F.explode(F.array_repeat(F.lit(1), weight))).drop(
        "_copy"
    )


@register(
    "q_mix_upsample",
    f"""
    WITH w AS (
      SELECT lang,
             CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 WHEN 'es' THEN 2
                       WHEN 'fr' THEN 2 WHEN 'zh' THEN 3 ELSE 1 END AS wt,
             len(string_split(trim(text), ' ')) AS n_tokens
      FROM documents
    )
    SELECT lang, COUNT(*) AS rows_before, CAST(SUM(wt) AS BIGINT) AS rows_after,
           CAST(SUM(wt * n_tokens) AS BIGINT) AS tokens_after
    FROM w GROUP BY lang ORDER BY lang
    """,
    doc="weighted language mixing: upsample low-resource langs by declared "
    "row replication (explode(array_repeat)); oracle checks the mixed "
    "cardinalities arithmetically.",
)
def q_mix_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents").select("lang", "text")
    wt = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in MIX_WEIGHTS.items()],
        F.lit(1),
    )
    before = docs.groupBy("lang").agg(F.count("*").alias("rows_before"))
    mixed = (
        upsample_by_weight(docs.withColumn("wt", wt), F.col("wt"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("rows_after"),
            F.sum(token_count("text")).alias("tokens_after"),
        )
    )
    return before.join(mixed, "lang").orderBy("lang")


# --------------------------------------------------------------------------
# Sequence packing.
# --------------------------------------------------------------------------


def pack_bins(
    df: DataFrame, part_col: str, order_col: str, tokens_col: str, capacity: int
) -> DataFrame:
    """Greedy in-order packing: bin = floor((running_sum - tokens)/capacity).
    One window (sort within partition key) — no state, no loops; docs longer
    than capacity get bins to themselves plus spillover, matching the
    standard concat-then-chunk packing used for LLM pretraining batches."""
    w = Window.partitionBy(part_col).orderBy(order_col)
    run = F.sum(tokens_col).over(w)
    return df.withColumn(
        "bin", F.floor((run - F.col(tokens_col)) / F.lit(capacity))
    )


@register(
    "q_pack_sequences",
    f"""
    WITH tok AS (
      SELECT source, doc_id, len(string_split(trim(text), ' ')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT source,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tokens) / {PACK_CAPACITY}.0) AS BIGINT) AS bin,
             n_tokens
      FROM tok
    )
    SELECT source, bin, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY source, bin ORDER BY source, bin
    """,
    doc="sequence packing: greedy in-order fill of fixed token-capacity "
    "context windows via one running-sum window per source.",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents").select(
        "source", "doc_id", token_count("text").alias("n_tokens")
    )
    packed = pack_bins(docs, "source", "doc_id", "n_tokens", PACK_CAPACITY)
    return (
        packed.groupBy("source", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("bin_tokens"))
        .orderBy("source", "bin")
    )


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------
#
# The step every serious training pipeline runs between curation and
# training: find training docs whose n-gram content overlaps an evaluation
# benchmark and drop them, so eval scores measure generalization rather
# than memorization. Semantics: containment(train, eval) =
# |shingles(train) ∩ shingles(eval)| / |shingles(train)| — asymmetric on
# purpose (a short eval item fully contained in a long train doc must
# flag, which symmetric Jaccard misses).
#
# Scale shape (100 TB corpus, MB-scale benchmarks): the eval side is tiny
# by nature, so its exploded shingle index is BROADCAST — the corpus-side
# scan never shuffles for the probe; the only exchange is the partial-agg
# on (train doc, eval doc) matches, whose row count is bounded by actual
# overlap, not corpus size. The fixture stands in a benchmark as every
# 97th doc.

DECONTAM_EVAL_MOD = 97
# 0.05 because the fixture docs are short (10-30 shingles) and the synthetic
# corpus has little genuine cross-doc overlap — a production pipeline over
# 8-grams would sit at 0.3-0.8. At this threshold the fixture yields real
# rows at every SF, so the oracle checks values, not an empty set.
DECONTAM_THRESHOLD = 0.05


def decontaminate_pairs(
    sets: DataFrame,
    eval_sets: DataFrame,
    threshold: float = DECONTAM_THRESHOLD,
) -> DataFrame:
    """(train doc_id, eval_id, common, containment) for containment >= t.

    `sets`/`eval_sets` are (doc_id, hset, n) shingle-set frames
    (operators.dedup._shingle_sets shape)."""
    train_sh = sets.select("doc_id", "n", F.explode("hset").alias("s"))
    eval_sh = eval_sets.select(
        F.col("doc_id").alias("eval_id"), F.explode("hset").alias("s")
    )
    matches = (
        train_sh.join(F.broadcast(eval_sh), "s")
        .where(F.col("doc_id") != F.col("eval_id"))
        .groupBy("doc_id", "eval_id", "n")
        .agg(F.count("*").alias("common"))
    )
    return (
        matches.select(
            "doc_id",
            "eval_id",
            F.col("common").cast("int").alias("common"),
            (F.col("common") / F.col("n")).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


@register(
    "q_decontaminate_ngram",
    f"""
    WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(
                    generate_series(1, len(ws) - 2),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
           FROM w WHERE len(ws) >= 3),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    m AS (SELECT t.doc_id, e.doc_id AS eval_id, COUNT(*) AS common
          FROM sh t JOIN sh e ON t.s = e.s
          WHERE e.doc_id % {DECONTAM_EVAL_MOD} = 0 AND t.doc_id <> e.doc_id
          GROUP BY 1, 2)
    SELECT m.doc_id, m.eval_id, CAST(m.common AS INTEGER) AS common,
           CAST(m.common AS DOUBLE) / sz.n AS containment
    FROM m JOIN sz ON m.doc_id = sz.doc_id
    WHERE CAST(m.common AS DOUBLE) / sz.n >= {DECONTAM_THRESHOLD}
    ORDER BY m.doc_id, m.eval_id
    """,
    doc="benchmark decontamination: n-gram containment of each training doc "
    "against a broadcast eval-set shingle index (eval = every 97th doc).",
)
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import shingle_sets_cached

    sets = shingle_sets_cached(spark, sf_dir)
    eval_sets = sets.where(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
    return decontaminate_pairs(sets, eval_sets).orderBy("doc_id", "eval_id")


# --------------------------------------------------------------------------
# Deterministic stratified sampling
# --------------------------------------------------------------------------
#
# Down-sampling over-represented strata is the mirror image of q_mix_upsample:
# keep a per-stratum FRACTION of docs, chosen by content-free hash — no RNG,
# no seed coordination across executors, and (the property that matters for
# reprocessing at 100 TB) a doc's keep/drop decision never changes when the
# corpus around it does. Rates are per-lang percentages; the keep predicate
# is pure map-side (hash < rate), so the sample costs one scan, no shuffle
# before the reporting agg.

SAMPLE_RATES = {"en": 30, "de": 80, "es": 80, "fr": 80, "zh": 100}  # keep-%


def stratified_sample(
    df: DataFrame, rates: dict[str, int], strata_col: str = "lang"
) -> DataFrame:
    """Keep rows where the doc's hash bucket falls under its stratum's rate.
    Unknown strata default to keep-all (rate 100)."""
    rate = None
    for k, v in rates.items():
        cond = F.when(F.col(strata_col) == k, F.lit(v))
        rate = cond if rate is None else rate.when(F.col(strata_col) == k, F.lit(v))
    # empty rates dict => every stratum is "unknown" => keep-all
    rate = F.lit(100) if rate is None else rate.otherwise(F.lit(100))
    return df.where(split_bucket("doc_id") < rate)


def _sql_rate_case() -> str:
    whens = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in SAMPLE_RATES.items()
    )
    return f"CASE {whens} ELSE 100 END"


@register(
    "q_stratified_sample",
    f"""
    WITH kept AS (
      SELECT lang, len(string_split(trim(text), ' ')) AS n_tokens
      FROM documents
      WHERE {_SQL_BUCKET} < {_sql_rate_case()}
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM kept GROUP BY lang ORDER BY lang
    """,
    doc="deterministic stratified down-sampling: per-lang keep-rates applied "
    "via content-free hash buckets (no RNG, reprocessing-stable); map-side "
    "predicate, one reporting agg.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    kept = stratified_sample(docs, SAMPLE_RATES)
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count("text")).alias("total_tokens"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Incremental (batch-vs-corpus) exact dedup
# --------------------------------------------------------------------------
#
# Production dedup is rarely one-shot: a new crawl/batch arrives and must be
# deduped AGAINST the existing corpus without re-deduping the corpus itself.
# Shape: LEFT ANTI join of the new batch's content hashes against the
# corpus's — at 100 TB the corpus side is a bucketed/Z-ordered hash index
# you pre-partition once and reuse per batch; the per-batch cost is a scan
# of the (much smaller) batch plus a hash-partitioned probe. The fixture
# stands in "new batch" as the top doc_id quartile.

INCR_BATCH_FRACTION = 4  # top 1/4 of doc_ids = the "new" batch


def incremental_dedup(
    new_batch: DataFrame, corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Rows of new_batch whose (case-normalized) content hash is absent from
    corpus — plus intra-batch dedup keeping the min doc_id per hash."""
    h = F.md5(F.lower(text_col))
    nb = new_batch.withColumn("_h", h)
    seen = corpus.select(F.md5(F.lower(text_col)).alias("_h")).distinct()
    survivors = nb.join(seen, "_h", "left_anti")
    w_min = F.min("doc_id").over(Window.partitionBy("_h"))
    return (
        survivors.withColumn("_keep", F.col("doc_id") == w_min)
        .where("_keep")
        .drop("_keep")
    )


@register(
    "q_dedup_incremental",
    """
    WITH lim AS (SELECT CAST(FLOOR(max(doc_id) * 3.0 / 4) AS BIGINT) AS cut FROM documents),
    corpus AS (SELECT DISTINCT md5(lower(text)) AS h
               FROM documents, lim WHERE doc_id <= lim.cut),
    batch AS (SELECT doc_id, md5(lower(text)) AS h, source
              FROM documents, lim WHERE doc_id > lim.cut),
    surv AS (
      SELECT b.doc_id, b.h, b.source FROM batch b
      WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
    ),
    kept AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      FROM surv
    )
    SELECT source, COUNT(*) AS n_new_unique
    FROM kept WHERE rn = 1
    GROUP BY source ORDER BY source
    """,
    doc="incremental dedup: LEFT ANTI probe of the new batch's content "
    "hashes against the existing corpus, then intra-batch min-id dedup; "
    "the corpus side is the reusable hash index at scale.",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    # FLOOR on both sides: Spark's double->bigint cast truncates while
    # DuckDB's CAST rounds to nearest — explicit floor pins one semantic
    cut = (
        docs.agg(F.floor(F.max("doc_id") * 3 / 4).cast("bigint").alias("cut"))
        .collect()[0]["cut"]
    )
    corpus = docs.where(F.col("doc_id") <= cut)
    batch = docs.where(F.col("doc_id") > cut)
    return (
        incremental_dedup(batch, corpus)
        .groupBy("source")
        .agg(F.count("*").alias("n_new_unique"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Token-budget mixing (largest-remainder allocation)
# --------------------------------------------------------------------------
#
# The planning step behind every training-mix spec: given per-source token
# inventories and a global token budget, allocate the budget across sources
# proportionally to weights, capped by each source's inventory, with the
# integer residue distributed by largest remainder (Hamilton's method) so
# allocations sum EXACTLY to min(budget, total available). All integer
# arithmetic — deterministic, oracle-exact, and the distributed part (the
# inventory aggregation) is the only part that touches the corpus: the
# allocation itself runs over one row per source.

MIX_BUDGET_TOKENS = 6000


def token_budget_mix(inventory: DataFrame, budget: int) -> DataFrame:
    """inventory: (source, avail) -> (source, avail, alloc).

    Weighted share = budget * avail / total (integer floor), residue by
    largest fractional remainder, ties broken by source name; every alloc
    capped at avail. One pass of window arithmetic over |sources| rows."""
    total = F.sum("avail").over(Window.partitionBy())
    share_num = F.col("avail") * F.lit(budget)
    # total == 0 (empty inventory) would NULL-cascade through the division;
    # short-circuit to base 0 so every alloc is a defined 0 (ADVICE r04).
    base = F.when(total == F.lit(0), F.lit(0)).otherwise(F.floor(share_num / total))
    rem = share_num - base * total  # fractional remainder, scaled by total
    shared = inventory.select(
        "source",
        "avail",
        F.least(base, F.col("avail")).cast("bigint").alias("base"),
        rem.alias("rem"),
        total.alias("total"),
    )
    # residue = budget - sum(base), handed out one token per source in
    # descending remainder order (classic largest-remainder completion)
    wsum = F.sum("base").over(Window.partitionBy())
    wrank = F.row_number().over(Window.partitionBy().orderBy(F.desc("rem"), "source"))
    return (
        shared.withColumn("residue", F.least(F.lit(budget), F.col("total")) - wsum)
        .withColumn("rk", wrank)
        .select(
            "source",
            "avail",
            F.least(
                F.col("avail"),
                F.col("base")
                + F.when(F.col("rk") <= F.col("residue"), F.lit(1)).otherwise(F.lit(0)),
            )
            .cast("bigint")
            .alias("alloc"),
        )
    )


@register(
    "q_token_budget_mix",
    f"""
    WITH inv AS (
      SELECT source, CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS avail
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(avail) AS total FROM inv),
    based AS (
      SELECT source, avail,
             LEAST(CAST(FLOOR(avail * {MIX_BUDGET_TOKENS} / total) AS BIGINT), avail) AS base,
             avail * {MIX_BUDGET_TOKENS} - CAST(FLOOR(avail * {MIX_BUDGET_TOKENS} / total) AS BIGINT) * total AS rem,
             total
      FROM inv, tot
    ),
    ranked AS (
      SELECT source, avail, base, total,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
             SUM(base) OVER () AS base_sum
      FROM based
    )
    SELECT source, avail,
           LEAST(avail, base + CASE WHEN rk <= LEAST({MIX_BUDGET_TOKENS}, total) - base_sum
                                    THEN 1 ELSE 0 END) AS alloc
    FROM ranked ORDER BY source
    """,
    doc="token-budget mix planning: largest-remainder (Hamilton) allocation "
    "of a global token budget across sources, capped by inventory; integer-"
    "exact, distributed only where it touches the corpus (the inventory agg).",
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    inv = (
        tp(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(token_count("text")).cast("bigint").alias("avail"))
    )
    return token_budget_mix(inv, MIX_BUDGET_TOKENS).orderBy("source")


# --------------------------------------------------------------------------
# DSIR-style importance weighting (data selection)
# --------------------------------------------------------------------------
#
# Data Selection with Importance Resampling (Xie et al., NeurIPS 2023):
# score each raw-pool document by how much more likely its hashed-unigram
# features are under a TARGET distribution (here: the benchmark eval slice,
# the same every-97th-doc set decontamination uses) than under the raw
# pool itself:  w(doc) = Σ_tokens [ln p_target(bucket) - ln p_pool(bucket)].
#
# The hashing is the scale trick: features are word-hash buckets modulo
# DSIR_BUCKETS, so the importance model is a BOUNDED lookup table
# (DSIR_BUCKETS rows, broadcast) no matter how large the live vocabulary
# is — a 100 TB corpus shuffles its tokens exactly once (the per-doc
# weight groupBy); the two bucket-count aggregates collapse map-side to
# DSIR_BUCKETS partial rows. Laplace (+1) smoothing keeps every bucket's
# probability finite in both distributions.
#
# Portability: per-bucket log-ratios are quantized to 2^-20 micro-units
# (int64) and per-doc weights are integer SUMS of those — associative, so
# Spark and DuckDB agg orders cannot diverge (same contract as BM25).

DSIR_BUCKETS = 8192
DSIR_EVAL_MOD = 97  # target slice = benchmark docs (mirrors DECONTAM_EVAL_MOD)


def dsir_bucket(word: Column) -> Column:
    from ..functions.text import word_hash

    return word_hash(word) % DSIR_BUCKETS


def dsir_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, weight_q20) for every raw-pool (non-target) doc."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("w")
    ).select("doc_id", dsir_bucket(F.col("w")).alias("b"))
    is_target = F.col("doc_id") % DSIR_EVAL_MOD == 0
    tgt = toks.where(is_target).groupBy("b").agg(F.count("*").alias("ct"))
    pool = toks.where(~is_target).groupBy("b").agg(F.count("*").alias("cp"))
    # coalesce: an EMPTY target (or pool) slice sums to NULL, which would
    # NULL-cascade through every log-ratio; 0 keeps the Laplace-smoothed
    # distribution defined (uniform over buckets).
    tot_t = tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    tot_p = pool.agg(F.coalesce(F.sum("cp"), F.lit(0)).alias("tp"))
    # full outer over the bounded bucket space; missing side -> count 0
    lr = (
        tgt.join(pool, "b", "full_outer")
        .select(
            "b",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cp", F.lit(0)).alias("cp"),
        )
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_p))
        .select(
            "b",
            F.floor(
                (
                    F.log(
                        (F.col("ct") + F.lit(1.0))
                        / (F.col("tt") + F.lit(float(DSIR_BUCKETS)))
                    )
                    - F.log(
                        (F.col("cp") + F.lit(1.0))
                        / (F.col("tp") + F.lit(float(DSIR_BUCKETS)))
                    )
                )
                * F.lit(1048576.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lr_q20"),
        )
    )
    return (
        toks.where(~is_target)
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("lr_q20").alias("weight_q20"),
        )
    )


_SQL_DSIR = f"""
  WITH toks AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(unnest(string_split(trim(text), ' '))), 1, 15))
                AS BIGINT) % {DSIR_BUCKETS} AS b
    FROM documents
  ),
  tgt AS (SELECT b, COUNT(*) AS ct FROM toks
          WHERE doc_id % {DSIR_EVAL_MOD} = 0 GROUP BY b),
  pool AS (SELECT b, COUNT(*) AS cp FROM toks
           WHERE doc_id % {DSIR_EVAL_MOD} <> 0 GROUP BY b),
  tot AS (SELECT (SELECT SUM(ct) FROM tgt) AS tt,
                 (SELECT SUM(cp) FROM pool) AS tp),
  lr AS (
    SELECT COALESCE(tgt.b, pool.b) AS b,
           CAST(floor((ln((COALESCE(ct, 0) + 1.0) / (tt + {DSIR_BUCKETS}.0))
                     - ln((COALESCE(cp, 0) + 1.0) / (tp + {DSIR_BUCKETS}.0)))
                     * 1048576.0 + 0.5) AS BIGINT) AS lr_q20
    FROM tgt FULL OUTER JOIN pool ON tgt.b = pool.b CROSS JOIN tot
  )
  SELECT toks.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(lr_q20) AS BIGINT) AS weight_q20
  FROM toks JOIN lr ON toks.b = lr.b
  WHERE toks.doc_id % {DSIR_EVAL_MOD} <> 0
  GROUP BY toks.doc_id
  ORDER BY toks.doc_id
"""


@register(
    "q_dsir_importance",
    _SQL_DSIR,
    doc="DSIR-style importance weighting: hashed-unigram bucket log-ratio "
    "of target (benchmark slice) vs raw pool, Laplace-smoothed, quantized "
    "per-bucket and integer-summed per doc; the importance model is a "
    "bounded broadcast table regardless of vocabulary size.",
)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    return dsir_weights(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# Context-window chunking (tokenize-and-chunk with overlap)
# --------------------------------------------------------------------------

CHUNK_WINDOW = 16  # tokens per chunk
CHUNK_STRIDE = 8  # chunk start spacing (window - stride = overlap)


def chunk_documents(
    docs: DataFrame, window: int = CHUNK_WINDOW, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Split each doc into overlapping token windows: chunk k covers tokens
    [k*stride, k*stride + window) for every k with k*stride < n_tokens
    (tail chunks run short rather than being dropped — no token is lost).

    The 1->N mapping every training pipeline runs between curation and
    batching. Pure per-row Catalyst projection (sequence + explode +
    slice): zero shuffles, fan-out bounded by n_tokens/stride per row, so
    at 100 TB it is scan-shaped and embarrassingly parallel."""
    ws = F.split(F.trim("text"), " ")
    n = F.size(ws)
    ks = F.sequence(F.lit(0), F.floor((n - 1) / F.lit(stride)).cast("int"))
    return (
        docs.select("doc_id", ws.alias("ws"), F.explode(ks).alias("k"))
        .select(
            "doc_id",
            F.col("k").cast("int").alias("chunk_id"),
            F.slice("ws", F.col("k") * stride + 1, window).alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("chunk").cast("int").alias("chunk_tokens"),
            F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
        )
    )


_SQL_CHUNK = f"""
  WITH w AS (
    SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
  ),
  k AS (
    SELECT doc_id, ws,
           unnest(generate_series(0, CAST(floor((len(ws) - 1) / {CHUNK_STRIDE})
                                          AS INTEGER))) AS k
    FROM w
  ),
  c AS (
    SELECT doc_id, k AS chunk_id,
           ws[k * {CHUNK_STRIDE} + 1 : k * {CHUNK_STRIDE} + {CHUNK_WINDOW}] AS chunk
    FROM k
  )
  SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
         CAST(len(chunk) AS INTEGER) AS chunk_tokens,
         md5(array_to_string(chunk, ' ')) AS chunk_md5
  FROM c ORDER BY doc_id, chunk_id
"""


@register(
    "q_chunk_documents",
    _SQL_CHUNK,
    doc="context-window chunking: each doc split into overlapping "
    f"{CHUNK_WINDOW}-token windows every {CHUNK_STRIDE} tokens (tail kept "
    "short, no token lost) — per-row sequence+explode+slice, zero "
    "shuffles; md5 value-checks exact chunk content.",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs).orderBy("doc_id", "chunk_id")


# --------------------------------------------------------------------------
# Decontamination APPLY: drop the flagged training docs and report the
# surviving corpus per source — the verdict-to-action half (the detection
# half is q_decontaminate_ngram). At scale: the flagged set is bounded by
# actual benchmark overlap (tiny), so the removal is a broadcast-able
# LEFT ANTI join against it; eval-member docs themselves are excluded
# from the training corpus too (they ARE the benchmark).
# --------------------------------------------------------------------------


@register(
    "q_decontaminate_apply",
    f"""
    WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(
                    generate_series(1, len(ws) - 2),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
           FROM w WHERE len(ws) >= 3),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    m AS (SELECT t.doc_id, COUNT(*) AS common, ANY_VALUE(sz.n) AS n
          FROM sh t JOIN sh e ON t.s = e.s
          JOIN sz ON t.doc_id = sz.doc_id
          WHERE e.doc_id % {DECONTAM_EVAL_MOD} = 0 AND t.doc_id <> e.doc_id
          GROUP BY t.doc_id, e.doc_id),
    flagged AS (SELECT DISTINCT doc_id FROM m
                WHERE CAST(common AS DOUBLE) / n >= {DECONTAM_THRESHOLD}),
    clean AS (
      SELECT d.source FROM documents d
      WHERE d.doc_id % {DECONTAM_EVAL_MOD} <> 0
        AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
    )
    SELECT source, COUNT(*) AS n_docs FROM clean GROUP BY source ORDER BY source
    """,
    doc="decontamination apply: corpus minus benchmark members minus "
    "flagged-overlap docs via LEFT ANTI against the (tiny, broadcast) "
    "flagged set; per-source surviving counts.",
)
def q_decontaminate_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.util import t
    from .dedup import shingle_sets_cached

    sets = shingle_sets_cached(spark, sf_dir)
    eval_sets = sets.where(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
    flagged = decontaminate_pairs(sets, eval_sets).select("doc_id").distinct()
    docs = t(spark, sf_dir, "documents")
    clean = (
        docs.where(F.col("doc_id") % DECONTAM_EVAL_MOD != 0)
        .join(F.broadcast(flagged), "doc_id", "left_anti")
    )
    return (
        clean.groupBy("source").agg(F.count("*").alias("n_docs")).orderBy("source")
    )


# --------------------------------------------------------------------------
# END-TO-END curation pipeline: the whole preprocessing chain a training
# run actually executes, composed from the engine's own operators as ONE
# declarative DAG — Gopher quality gate -> exact dedup -> near-dup drop
# -> benchmark decontamination -> context-window chunking -> per-source
# inventory. Each stage is individually oracle-checked elsewhere; this
# query checks their COMPOSITION (stage boundaries, survivor sets, and
# the chunk fan-out of the final corpus).
#
# Scale shape: the gate is scan-shaped; exact dedup is one hash shuffle;
# the near-dup drop reuses the PPJoin candidate index restricted to gate
# survivors (drop rule: any doc appearing as the GREATER member of a
# verified >= 0.8 pair — equals keep-min-per-component on the planted
# clique-shaped dup groups and is deterministic on any topology); the
# decontamination probe broadcasts the eval index; chunking is a per-row
# explode. Nothing quadratic, nothing driver-side.
# --------------------------------------------------------------------------


@register(
    "q_pipeline_end_to_end",
    f"""
    WITH base AS (
      SELECT doc_id, source, text, string_split(trim(text), ' ') AS ws
      FROM documents
    ),
    g2 AS (
      SELECT doc_id, list_transform(generate_series(1, len(ws) - 1),
                                    i -> ws[i] || ' ' || ws[i+1]) AS g2
      FROM base
    ),
    rep2 AS (
      SELECT doc_id, CAST(floor((len(g2) - len(list_distinct(g2))) * 1048576.0
                                / len(g2) + 0.5) AS BIGINT) AS dup2
      FROM g2 WHERE len(g2) > 0
    ),
    wcnt AS (SELECT doc_id, w, COUNT(*) AS n
             FROM (SELECT doc_id, unnest(ws) AS w FROM base) GROUP BY 1, 2),
    wstat AS (
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS wc,
             CAST(floor(MAX(n) * 1048576.0 / SUM(n) + 0.5) AS BIGINT) AS topw,
             CAST(floor(SUM(n * length(w)) * 1048576.0 / SUM(n) + 0.5) AS BIGINT)
               AS mwl
      FROM wcnt GROUP BY doc_id
    ),
    gated AS (
      SELECT b.doc_id, b.source, b.text, len(b.ws) AS n_tokens
      FROM base b JOIN rep2 USING (doc_id) JOIN wstat USING (doc_id)
      WHERE wc >= 20 AND dup2 <= 83886 AND topw <= 157286
        AND mwl BETWEEN 3145728 AND 6291456
    ),
    exact_keep AS (SELECT MIN(doc_id) AS doc_id FROM gated
                   GROUP BY md5(lower(text))),
    s2 AS (SELECT g.* FROM gated g SEMI JOIN exact_keep k ON g.doc_id = k.doc_id),
    shfull AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(ws) - 2),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
      FROM base WHERE len(ws) >= 3
    ),
    szfull AS (SELECT doc_id, COUNT(*) AS n FROM shfull GROUP BY doc_id),
    sh2 AS (SELECT sf.* FROM shfull sf SEMI JOIN s2 ON sf.doc_id = s2.doc_id),
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common
      FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    dropd AS (
      SELECT DISTINCT p.db AS doc_id
      FROM pairs p JOIN szfull x ON p.da = x.doc_id
                   JOIN szfull y ON p.db = y.doc_id
      WHERE CAST(p.common AS DOUBLE) / (x.n + y.n - p.common)
              >= {0.8}
    ),
    s3 AS (SELECT s2.* FROM s2 ANTI JOIN dropd USING (doc_id)),
    evalsh AS (SELECT doc_id AS eval_id, s FROM shfull
               WHERE doc_id % {DECONTAM_EVAL_MOD} = 0),
    flagged AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT sf.* FROM shfull sf SEMI JOIN s3 ON sf.doc_id = s3.doc_id) t
      JOIN evalsh e ON t.s = e.s AND t.doc_id <> e.eval_id
      JOIN szfull z ON t.doc_id = z.doc_id
      GROUP BY t.doc_id, e.eval_id, z.n
      HAVING CAST(COUNT(*) AS DOUBLE) / z.n >= {DECONTAM_THRESHOLD}
    ),
    s4 AS (SELECT s3.* FROM s3 ANTI JOIN flagged USING (doc_id))
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(floor((n_tokens - 1) / {CHUNK_STRIDE}) AS BIGINT) + 1)
                AS BIGINT) AS n_chunks
    FROM s4 GROUP BY source ORDER BY source
    """,
    headline=True,
    doc="END-TO-END pipeline: Gopher gate -> exact dedup (min-id per "
    "content hash) -> near-dup drop (verified Jaccard >= 0.8, greater "
    "member dropped) -> benchmark decontamination (containment vs the "
    "eval slice) -> context-window chunking of the survivors; per-source "
    "docs/tokens/chunks. Composes the individually-checked operators "
    "into one declarative DAG.",
)
def q_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import (
        GOPHER_DUP2_MAX_Q20,
        GOPHER_MIN_WORDS,
        GOPHER_MWL_MAX_Q20,
        GOPHER_MWL_MIN_Q20,
        GOPHER_TOPWORD_MAX_Q20,
    )
    from .dedup import jaccard_pairs_from_sets, shingle_sets_cached

    docs = tp(spark, sf_dir, "documents")
    q20 = F.lit(1048576.0)

    # stage 1: Gopher gate (same kernels as q_quality_gopher). Every
    # metric is a PER-ROW function of the doc's own tokens: the 2-gram
    # repetition is an array HOF, word stats are folds over the sorted
    # token array (the max-run-length of a sorted array IS the top word
    # count). All of them inline into ONE projection over the corpus
    # scan — the previous shape computed rep2/wstat as separate per-row
    # projections and doc_id-self-JOINED them back (two SortMergeJoins,
    # three corpus scans, three exchanges); the fused gate is one scan,
    # zero exchanges, integers identical by construction. q20 stays
    # float for the final quantization only.
    g2 = F.expr(
        "transform(sequence(0, size(split(trim(text), ' ')) - 2),"
        " i -> concat(split(trim(text), ' ')[i], ' ',"
        "             split(trim(text), ' ')[i+1]))"
    )
    ws = F.array_sort(F.split(F.trim("text"), " "))
    run_state = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best"),
    )

    def run_step(acc, w):
        run = F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_cnt = F.aggregate(ws, run_state, run_step, lambda acc: acc["best"])
    len_sum = F.aggregate(
        ws, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    )
    gated = (
        docs.select(
            "doc_id",
            "source",
            "text",
            F.size(F.split(F.trim("text"), " ")).cast("bigint").alias("n_tokens"),
            F.size(g2).alias("_g2n"),
            F.floor(
                (F.size(g2) - F.size(F.array_distinct(g2))) * q20 / F.size(g2)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("dup2"),
            F.size(ws).cast("bigint").alias("wc"),
            F.floor(top_cnt * q20 / F.size(ws) + F.lit(0.5))
            .cast("bigint")
            .alias("topw"),
            F.floor(len_sum * q20 / F.size(ws) + F.lit(0.5))
            .cast("bigint")
            .alias("mwl"),
        )
        .where(
            (F.col("_g2n") > 0)
            & (F.col("wc") >= GOPHER_MIN_WORDS)
            & (F.col("dup2") <= GOPHER_DUP2_MAX_Q20)
            & (F.col("topw") <= GOPHER_TOPWORD_MAX_Q20)
            & (F.col("mwl") >= GOPHER_MWL_MIN_Q20)
            & (F.col("mwl") <= GOPHER_MWL_MAX_Q20)
        )
        .select("doc_id", "source", "text", "n_tokens")
    )
    # DISK_ONLY: the gated slice feeds the exact-dedup grouping AND the
    # survivor joins of every later stage; the persist trades one
    # serialize for re-running the gate per consumer. (The original A/B,
    # 10.8 -> 9.9 s warm at sf0.1, predates the r17 gate fusion — the
    # gate is now ONE scan+projection, so the persist's margin is
    # thinner; kept because 5 downstream consumers re-reading one
    # serialized slice still beats 5 re-runs of the scan+HOF projection.)
    from pyspark.storagelevel import StorageLevel

    gated = gated.persist(StorageLevel.DISK_ONLY)

    # Stage boundaries carry SURVIVOR ID-SETS through eager
    # localCheckpoints (the snapshot_diff discipline — executor-side
    # blocks, GC-reclaimed, nothing outlives the query). Without them,
    # every downstream stage re-derives its predecessors' subtrees per
    # consumer and the composed plan goes multiplicative — measured
    # 4,322 plan lines / 94 SortMergeJoins at r16 HEAD, with Catalyst
    # re-optimizing the duplicated gate/dedup/PPJoin branches on every
    # reference. The id-sets are 1-column doc_id tables (the §8
    # "decide with small rows" shape: bytes per survivor, never the
    # text), each stage's row content re-reads the ONE persisted gated
    # slice, and the checkpoint truncates both planning and recompute.

    # stage 2: exact dedup (min id per content hash)
    exact_keep = gated.groupBy(F.md5(F.lower("text")).alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    s2_ids = exact_keep.select("doc_id").localCheckpoint(eager=True)
    s2 = gated.join(s2_ids, "doc_id", "left_semi")

    # stage 3: near-dup drop over the survivors (PPJoin candidates,
    # verified Jaccard; the greater member of each pair drops).
    # s2's doc_ids == s2_ids (exact_keep ids are drawn from gated), so
    # the shingle slice semi-joins the checkpointed id-set directly.
    sets = shingle_sets_cached(spark, sf_dir)
    sets2 = sets.join(s2_ids, "doc_id", "left_semi")
    pairs = jaccard_pairs_from_sets(sets2, max_shingle_df=None)
    dropd = pairs.select(F.col("db").alias("doc_id")).distinct()
    s3_ids = s2_ids.join(dropd, "doc_id", "left_anti").localCheckpoint(
        eager=True
    )
    s3 = gated.join(s3_ids, "doc_id", "left_semi")

    # stage 4: decontamination vs the eval slice of the FULL corpus
    eval_sets = sets.where(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
    train_sets = sets.join(s3_ids, "doc_id", "left_semi")
    flagged = (
        decontaminate_pairs(train_sets, eval_sets)
        .select("doc_id")
        .distinct()
    )
    s4_ids = s3_ids.join(flagged, "doc_id", "left_anti").localCheckpoint(
        eager=True
    )
    s4 = gated.join(s4_ids, "doc_id", "left_semi")

    # stage 5: chunk the final corpus and inventory per source
    chunks_per_doc = (
        chunk_documents(s4.select("doc_id", "text"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_chunks"))
    )
    return (
        s4.join(chunks_per_doc, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("n_chunks").cast("bigint").alias("n_chunks"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Temperature-scaled mixture targets — the standard multilingual/multi-
# source reweighting (α-sampling, Conneau & Lample 2019 §3; Raffel et al.
# 2020 §3.4.3): sample source s with probability ∝ n_s^α, α ∈ (0, 1),
# which up-weights small sources relative to byte-proportional sampling
# without letting any source dominate. α = 0.5 here. Targets are
# integerized by largest-remainder apportionment so they sum EXACTLY to
# the corpus size.
#
# Engine portability: weights are quantized to int64 BEFORE any ratio
# (wt_q = floor(sqrt(n)·2^20 + 0.5)); shares, remainders, and the
# apportionment run in exact 128-bit integer arithmetic — the products
# tot*wt_q and wt_q*2^20 overflow int64 once tot*sqrt(n_source) passes
# ~8.8e12 (a ~1e9-doc corpus with a dominant source; ADVICE r07 item 1),
# where non-ANSI Spark would wrap silently while DuckDB errors. DuckDB
# computes them in HUGEINT, Spark in DECIMAL(38,0) (both exact 128-bit);
# base ≤ tot and rem < sw both fit int64, so the RESULTS cast back
# losslessly and the engines agree bit-for-bit at any corpus size.
#
# Scale shape: one count-by-source aggregate (|sources| rows) carries the
# whole computation; the windows run over that tiny aggregate.
# --------------------------------------------------------------------------

MIX_ALPHA_SQRT = True  # α = 0.5 realized as sqrt(n)


@register(
    "q_mix_temperature",
    """
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
    w AS (SELECT source, n,
                 CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576.0 + 0.5)
                      AS BIGINT) AS wt_q
          FROM c),
    s AS (SELECT source, n, wt_q,
                 SUM(wt_q) OVER () AS sw, SUM(n) OVER () AS tot
          FROM w),
    sh AS (SELECT source, n, wt_q, sw, tot,
                  CAST((CAST(tot AS HUGEINT) * wt_q) // sw AS BIGINT) AS base,
                  CAST((CAST(tot AS HUGEINT) * wt_q) % sw AS BIGINT) AS rem
           FROM s),
    r AS (SELECT *,
                 ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
                 SUM(base) OVER () AS base_sum
          FROM sh)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           CAST((CAST(wt_q AS HUGEINT) * 1048576) // sw AS BIGINT) AS weight_q20,
           CAST(base + CASE WHEN rk <= tot - base_sum THEN 1 ELSE 0 END
                AS BIGINT) AS target_docs
    FROM r ORDER BY source
    """,
    doc="temperature-scaled (α=0.5) mixture targets per source with "
    "exact largest-remainder apportionment: weights ∝ sqrt(n_docs), "
    "quantized to int64 before any ratio so both engines agree exactly; "
    "targets sum to the corpus size by construction. One |sources|-row "
    "aggregate carries everything.",
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count("*").alias("n"))
    return temperature_targets(c)


def temperature_targets(c: DataFrame) -> DataFrame:
    """α=0.5 largest-remainder apportionment over a (source, n) counts
    DataFrame — exposed separately so the 128-bit arithmetic can be
    unit-tested at corpus sizes (tot·wt_q > int64) no fixture reaches."""
    w = c.withColumn(
        "wt_q",
        F.floor(F.sqrt(F.col("n").cast("double")) * F.lit(1048576.0) + F.lit(0.5))
        .cast("bigint"),
    )
    every = Window.partitionBy()
    s = w.select(
        "source",
        "n",
        "wt_q",
        F.sum("wt_q").over(every).alias("sw"),
        F.sum("n").over(every).alias("tot"),
    )
    sh = s.select(
        "source",
        "n",
        "wt_q",
        "sw",
        "tot",
        F.expr(
            "CAST((CAST(tot AS DECIMAL(38,0)) * wt_q) div sw AS BIGINT)"
        ).alias("base"),
        F.expr(
            "CAST((CAST(tot AS DECIMAL(38,0)) * wt_q) % sw AS BIGINT)"
        ).alias("rem"),
    )
    r = sh.select(
        "*",
        F.row_number().over(Window.orderBy(F.desc("rem"), "source")).alias("rk"),
        F.sum("base").over(every).alias("base_sum"),
    )
    return r.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.expr(
            "CAST((CAST(wt_q AS DECIMAL(38,0)) * 1048576) div sw AS BIGINT)"
        ).alias("weight_q20"),
        (
            F.col("base")
            + F.when(
                F.col("rk") <= F.col("tot") - F.col("base_sum"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("target_docs"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# Leakage-free train/val/test split — the training-hygiene twin of the
# random split: assigning SPLITS BY DOCUMENT leaks duplicated content
# across the boundary (a val doc whose twin sits in train is a free
# answer). The fix every serious pipeline ships: group near-identical
# docs (here: the word-set fingerprint, the same normalization the
# cross-source leakage matrix uses), elect a representative per group,
# and hash THE REPRESENTATIVE into a split so every member of a dup
# group lands on the same side by construction.
#
# Portability: the split hash is the first hex nibble of
# md5(cast(rep AS string)) — identical strings, identical md5, in both
# engines; 13/16 nibbles → train, 2/16 → val, 1/16 → test.
#
# Scale shape: one fingerprint aggregate (min-doc_id window over the
# fingerprint key, one shuffle), then a pure projection; no joins.
# --------------------------------------------------------------------------


@register(
    "q_split_leakage_free",
    """
    WITH f AS (
      SELECT doc_id,
             md5(array_to_string(
               list_sort(list_distinct(string_split(trim(text), ' '))), ' '))
               AS fp
      FROM documents
    ),
    r AS (SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS rep
          FROM f),
    s AS (SELECT doc_id, rep,
                 CASE WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1)
                           BETWEEN '0' AND 'c' THEN 'train'
                      WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1)
                           IN ('d', 'e') THEN 'val'
                      ELSE 'test' END AS split
          FROM r)
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_groups
    FROM s GROUP BY split ORDER BY split
    """,
    doc="dup-group-aware train/val/test split: word-set-fingerprint "
    "groups elect a min-doc_id representative (one window shuffle) and "
    "the REPRESENTATIVE's md5 nibble decides the split, so duplicate "
    "content can never straddle a split boundary; counts per split plus "
    "distinct groups. No joins, no RNG state.",
)
def q_split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(F.split(F.trim("text"), " ")))
        )
    )
    f = docs.select("doc_id", fp.alias("fp"))
    r = f.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("fp")).alias("rep"),
    )
    nib = F.substring(F.md5(F.col("rep").cast("string")), 1, 1)
    s = r.select(
        "doc_id",
        "rep",
        F.when(nib.between("0", "c"), "train")
        .when(nib.isin("d", "e"), "val")
        .otherwise("test")
        .alias("split"),
    )
    return (
        s.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("rep").cast("bigint").alias("n_groups"),
        )
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# Chunk-level (training-sequence) exact dedup — the granularity real
# pretraining pipelines dedup at AFTER document dedup: two distinct
# documents often share a boilerplate block that document-level Jaccard
# keeps (the docs differ) but that still repeats verbatim in the token
# stream the model trains on. Chunks here are NON-overlapping
# CHUNK_WINDOW-token windows (overlap would duplicate by construction);
# the keeper of each repeated chunk is its earliest (doc_id, chunk_id)
# occurrence, and the read-out attributes kept/dropped chunks per
# source — the "how many tokens does sequence-level dedup save" number.
#
# Scale shape: the chunking is a pure per-row projection (zero
# shuffles); global keeper election is ONE md5-key window shuffle; the
# rollup touches |sources| rows. Linear in corpus tokens.
# --------------------------------------------------------------------------


@register(
    "q_dedup_chunk_exact",
    f"""
    WITH w AS (
      SELECT doc_id, source, string_split(trim(text), ' ') AS ws
      FROM documents
    ),
    k AS (
      SELECT doc_id, source, ws,
             unnest(generate_series(
               0, CAST(floor((len(ws) - 1) / {CHUNK_WINDOW}) AS INTEGER)))
               AS k
      FROM w
    ),
    c AS (
      SELECT doc_id, source, k AS chunk_id,
             md5(array_to_string(
               ws[k * {CHUNK_WINDOW} + 1 : k * {CHUNK_WINDOW} + {CHUNK_WINDOW}],
               ' ')) AS h
      FROM k
    ),
    r AS (
      SELECT source,
             ROW_NUMBER() OVER (PARTITION BY h
                                ORDER BY doc_id, chunk_id) AS rk
      FROM c
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped
    FROM r GROUP BY source ORDER BY source
    """,
    doc="sequence-level exact dedup: non-overlapping "
    f"{CHUNK_WINDOW}-token chunks, global keeper = earliest "
    "(doc_id, chunk_id) per chunk hash (one md5-key window shuffle over "
    "a zero-shuffle chunk projection); kept/dropped chunks per source — "
    "the cross-document boilerplate that doc-level dedup can't see.",
)
def q_dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = tp(spark, sf_dir, "documents").select("doc_id", "source", "text")
    ws = F.split(F.trim("text"), " ")
    ks = F.sequence(
        F.lit(0),
        F.floor((F.size(ws) - 1) / F.lit(CHUNK_WINDOW)).cast("int"),
    )
    c = docs.select(
        "doc_id", "source", ws.alias("ws"), F.explode(ks).alias("k")
    ).select(
        "doc_id",
        "source",
        F.col("k").cast("int").alias("chunk_id"),
        F.md5(
            F.array_join(
                F.slice("ws", F.col("k") * CHUNK_WINDOW + 1, CHUNK_WINDOW), " "
            )
        ).alias("h"),
    )
    r = c.select(
        "source",
        F.row_number()
        .over(Window.partitionBy("h").orderBy("doc_id", "chunk_id"))
        .alias("rk"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("rk") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("rk") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Balanced shard assignment — the dataset-build step before training:
# route every document to one of SHARD_N output shards so that shard
# TOKEN loads (not doc counts) come out even, deterministically, with
# no global coordination. The classic greedy global-LPT needs a global
# rank (a partition-less window — the exact single-task funnel this
# repo keeps removing); instead docs are bucketed into token-length
# BANDS (a pure projection), ranked WITHIN their band (a band-keyed
# window — distributes), and dealt round-robin with a band-dependent
# offset so band boundaries don't align hot shards. Within a band all
# docs have near-equal size, so round-robin is near-optimal there, and
# band sums stack independently — imbalance is bounded by one band-width
# per shard. The read-out is per-shard docs, tokens, and the Q20 skew
# vs the ideal equal split (1048576 = perfectly balanced).
#
# Scale: one projection + one (band)-keyed window + one |shards|-row
# rollup; the skew ratio's corpus total is a window over the SHARD_N-row
# aggregate. No global window ever sees corpus rows.
# --------------------------------------------------------------------------

SHARD_N = 16
SHARD_BAND_TOKENS = 8  # band = tokens div 8: within-band sizes differ < 8


@register(
    "q_shard_balanced",
    f"""
    WITH d AS (
      SELECT doc_id, len(string_split(trim(text), ' ')) AS tokens
      FROM documents
    ),
    b AS (SELECT doc_id, tokens, tokens // {SHARD_BAND_TOKENS} AS band FROM d),
    r AS (SELECT doc_id, tokens, band,
                 ROW_NUMBER() OVER (PARTITION BY band
                                    ORDER BY tokens DESC, doc_id) AS rk
          FROM b),
    a AS (SELECT tokens, CAST((rk - 1 + band) % {SHARD_N} AS INTEGER) AS shard
          FROM r),
    s AS (SELECT shard, COUNT(*) AS n_docs, SUM(tokens) AS token_sum
          FROM a GROUP BY shard)
    SELECT shard, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(token_sum AS BIGINT) AS token_sum,
           CAST(floor(token_sum * {SHARD_N} * 1048576.0
                      / SUM(token_sum) OVER () + 0.5) AS BIGINT) AS skew_q20
    FROM s ORDER BY shard
    """,
    doc=f"balanced shard assignment: docs dealt to {SHARD_N} shards "
    "round-robin within token-length bands (band-keyed window — no "
    "global rank ever funnels corpus rows through one task), band "
    "offsets de-align boundaries; per-shard docs/tokens plus Q20 skew "
    "vs the ideal equal split.",
)
def q_shard_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), " ")).alias("tokens")
    )
    b = d.withColumn(
        "band", (F.col("tokens") / SHARD_BAND_TOKENS).cast("bigint")
    )
    rk = F.row_number().over(
        Window.partitionBy("band").orderBy(F.desc("tokens"), F.asc("doc_id"))
    )
    a = b.select(
        "tokens",
        ((rk - 1 + F.col("band")) % SHARD_N).cast("int").alias("shard"),
    )
    s = a.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("token_sum"),
    )
    # the skew total is a window over the SHARD_N-row aggregate
    tot = F.sum("token_sum").over(Window.partitionBy())
    return s.select(
        "shard",
        "n_docs",
        "token_sum",
        F.floor(
            F.col("token_sum") * F.lit(float(SHARD_N)) * F.lit(1048576.0) / tot
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("skew_q20"),
    ).orderBy("shard")


# --------------------------------------------------------------------------
# Length-bucketed batching audit — the training-efficiency read-out:
# batches pad every sequence to its bucket boundary, so padding waste
# is a direct GPU-hours tax. For the standard power-of-two bucket
# ladder (8/16/32/64, docs truncated at the 64-token context), report
# per bucket: docs, real tokens, padding tokens, and the Q20 waste
# fraction pad/(pad+tokens) — the number that decides whether to add a
# bucket boundary. Pure projection + one |buckets|-row aggregate.
# --------------------------------------------------------------------------

PAD_BUCKETS = (8, 16, 32, 64)  # doc truncated at the last boundary


@register(
    "q_batch_padding_audit",
    f"""
    WITH d AS (
      SELECT LEAST(len(string_split(trim(text), ' ')), {PAD_BUCKETS[-1]})
               AS t
      FROM documents
    ),
    b AS (
      SELECT t,
             CASE WHEN t <= 8 THEN 8 WHEN t <= 16 THEN 16
                  WHEN t <= 32 THEN 32 ELSE 64 END AS bucket
      FROM d
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(t) AS BIGINT) AS token_sum,
           CAST(SUM(bucket - t) AS BIGINT) AS pad_sum,
           CAST(floor(SUM(bucket - t) * 1048576.0
                      / NULLIF(SUM(CAST(bucket AS BIGINT)), 0) + 0.5)
                AS BIGINT) AS waste_q20
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc="length-bucketed batching audit: docs truncated at the 64-token "
    "context and padded to the 8/16/32/64 bucket ladder; per bucket the "
    "doc count, real tokens, padding tokens, and Q20 waste fraction — "
    "the GPU-efficiency number bucket ladders are tuned by. Pure "
    "projection + one tiny aggregate.",
)
def q_batch_padding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    t_col = F.least(
        F.size(F.split(F.trim("text"), " ")), F.lit(PAD_BUCKETS[-1])
    )
    bucket = (
        F.when(t_col <= 8, 8)
        .when(t_col <= 16, 16)
        .when(t_col <= 32, 32)
        .otherwise(64)
    )
    b = docs.select(t_col.alias("t"), bucket.alias("bucket"))
    return (
        b.groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("t").cast("bigint").alias("token_sum"),
            F.sum(F.col("bucket") - F.col("t")).cast("bigint").alias("pad_sum"),
            F.floor(
                F.sum(F.col("bucket") - F.col("t"))
                * F.lit(1048576.0)
                / F.when(
                    F.sum(F.col("bucket").cast("bigint")) != 0,
                    F.sum(F.col("bucket").cast("bigint")),
                )
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("waste_q20"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Per-source quota cap — the domain-balancing admission policy every web-
# scale corpus applies before mixing (cap any one domain/source's share;
# CCNet/RefinedWeb keep the best K documents per domain rather than a
# uniform draw): within each source, KEEP the QUOTA_PER_SOURCE highest-
# quality documents, quality ties broken by doc_id so the cut is
# deterministic under reprocessing. Differs from q_sample_per_source
# (uniform md5-ranked cap) in ranking by CONTENT quality — it's a curation
# policy, not a sampling primitive.
#
# Scale: one source-keyed window shuffle; the quality score is a pure
# projection computed map-side before the exchange. Quality is Q20-
# quantized BEFORE ranking so the per-source order (and therefore the
# kept set) is integer-deterministic and engine-portable.
# --------------------------------------------------------------------------

QUOTA_PER_SOURCE = 15

_SQL_QUALITY_Q20 = """
  CAST(floor(round(0.4 * least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
      + 0.3 * (1.0 - least(5.0 * (CAST((length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))) AS DOUBLE) / length(text)), 1.0))
      + 0.3 * least(4.0 * (CAST(len(list_filter(string_split(trim(text), ' '),
            w -> lower(w) IN ('the','a','of','and','to','in','is','it','for','on')))
            AS DOUBLE) / len(string_split(trim(text), ' '))), 1.0), 6)
      * 1048576.0 + 0.5) AS BIGINT)
"""


@register(
    "q_source_quota_cap",
    f"""
    WITH q AS (SELECT doc_id, source, {_SQL_QUALITY_Q20} AS quality_q20
               FROM documents),
    r AS (SELECT doc_id, source, quality_q20,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY quality_q20 DESC, doc_id) AS rk
          FROM q)
    SELECT doc_id, source, quality_q20, CAST(rk AS INTEGER) AS rk
    FROM r WHERE rk <= {QUOTA_PER_SOURCE}
    ORDER BY source, rk
    """,
    doc="per-source quota cap: keep the QUOTA_PER_SOURCE highest-quality "
    "docs per source (quality Q20-quantized before ranking, doc_id "
    "tie-break) — the domain-balancing admission policy applied before "
    "mixture design; one source-keyed window shuffle, quality computed "
    "map-side.",
)
def q_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import quality_score

    docs = tp(spark, sf_dir, "documents")
    q20 = (
        F.floor(quality_score("text") * F.lit(1048576.0) + F.lit(0.5))
        .cast("bigint")
        .alias("quality_q20")
    )
    w = Window.partitionBy("source").orderBy(F.desc("quality_q20"), "doc_id")
    return (
        docs.select("doc_id", "source", q20)
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= QUOTA_PER_SOURCE)
        .orderBy("source", "rk")
    )


# --------------------------------------------------------------------------
# Bloom-filter benchmark decontamination (round 14).
#
# q_decontaminate_ngram broadcasts the RAW eval shingle index — right while
# the benchmark suite is MBs. When the "benchmark" side grows (dozens of
# eval suites, held-out corpora, the customer's full test split), the raw
# index stops fitting a broadcast but its BLOOM FILTER still does: m bits
# summarize any number of shingles at a fixed false-positive budget. The
# production pattern (Spark's own runtime bloom-filter join, Iceberg/Delta
# bloom indexes) is: (1) aggregate the eval shingles into packed bloom
# words, (2) broadcast the words and test every corpus gram MAP-SIDE with
# pure int arithmetic, (3) exact-confirm only the bloom-positive grams.
# Bloom filters have NO false negatives, so step 3 makes the result exactly
# the exact-join answer — the oracle value-checks it — while step 2 cuts
# the shuffled/probed volume to (true matches + FP-rate * corpus grams).
#
# Semantics here are UNION containment (vs q_decontaminate_ngram's pairwise
# leakage matrix): a training doc is contaminated by how much of it appears
# in ANY eval item — the form pipelines actually gate on before training.
#
# Everything is JVM-side: positions via xxhash64 double hashing
# (Kirsch-Mitzenmacher, h2 forced odd so probes cycle the power-of-two bit
# space), the word table is a |m/64|-row aggregate collected bounded and
# re-attached as ONE array column through a 1-row broadcast (not a literal
# tree — the LSH analysis-cost lesson), membership is k AND-ed bit tests.
# --------------------------------------------------------------------------

BLOOM_BITS = 1 << 15  # m: sized to the benchmark side (bounded by nature)
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_K = 4
_BLOOM_SALT = 0x5F3759DF


def _bloom_pos_sql(scol: str) -> list[str]:
    """SQL for the k bit positions of an int64 key, all arithmetic < 2^18.

    Double hashing (Kirsch-Mitzenmacher): pos_i = h1 + i*h2 mod m, with h2
    forced odd so the probe stride cycles the power-of-two bit space."""
    h1 = f"pmod(xxhash64({scol}), {BLOOM_BITS})"
    h2 = f"pmod(xxhash64({scol}, {_BLOOM_SALT}L), {BLOOM_BITS})"
    h2o = f"({h2} + 1 - pmod({h2}, 2))"
    return [f"pmod({h1} + {i} * {h2o}, {BLOOM_BITS})" for i in range(BLOOM_K)]


def bloom_build(spark: SparkSession, keys: DataFrame, col: str) -> DataFrame:
    """1-row (bw array<bigint>) bloom word table for a key DataFrame.

    The groupBy(word) bit_or is a |m/64|-row aggregate regardless of key
    count; the collect is bounded by BLOOM_WORDS."""
    pos_arr = "array(" + ", ".join(_bloom_pos_sql(col)) + ")"
    words = (
        keys.select(F.explode(F.expr(pos_arr)).alias("pos"))
        .selectExpr(
            "CAST(pos DIV 64 AS INT) AS w",
            "shiftleft(1L, CAST(pos % 64 AS INT)) AS bit",
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bw = [0] * BLOOM_WORDS
    for r in words:
        bw[int(r["w"])] = int(r["bits"])
    return spark.createDataFrame([(bw,)], "bw array<bigint>")


def bloom_might_contain(scol: str, bwcol: str) -> Column:
    """AND of k bit probes against the attached word-array column; takes
    COLUMN NAMES (the probes are SQL expressions — shiftleft by a column
    amount has no Column-API form)."""
    probes = [
        f"(element_at({bwcol}, CAST(({pos}) DIV 64 AS INT) + 1)"
        f" & shiftleft(1L, CAST(({pos}) % 64 AS INT))) != 0"
        for pos in _bloom_pos_sql(scol)
    ]
    return F.expr(" AND ".join(probes))


def decontaminate_bloom(
    spark: SparkSession,
    sets: DataFrame,
    eval_sets: DataFrame,
    threshold: float,
) -> DataFrame:
    """(doc_id, common, n_shingles, containment) per contaminated train doc,
    UNION semantics, bloom-prefiltered + exact-confirmed (exact result)."""
    eval_hashes = (
        eval_sets.select(F.explode("hset").alias("s")).distinct()
    )
    bw = bloom_build(spark, eval_hashes, "s")
    train_sh = sets.select("doc_id", "n", F.explode("hset").alias("s"))
    candidates = train_sh.crossJoin(F.broadcast(bw)).where(
        bloom_might_contain("s", "bw")
    )
    # Exact-confirm WITHOUT a forced broadcast hint (VERDICT r14 wrong 1):
    # the whole point of the bloom is that the raw eval index may outgrow
    # a broadcast — forcing one here would foreclose AQE's shuffle-join
    # fallback on exactly the heavy-benchmark case the operator exists
    # for. The bloom already cut the left side to true matches + the FP
    # budget, so either join strategy is cheap; at fixture scale AQE
    # picks broadcast anyway (plans unchanged).
    confirmed = candidates.join(eval_hashes, "s").groupBy(
        "doc_id", "n"
    ).agg(F.count("*").alias("common"))
    return (
        confirmed.select(
            "doc_id",
            F.col("common").cast("int").alias("common"),
            F.col("n").cast("int").alias("n_shingles"),
            (F.col("common") / F.col("n")).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


@register(
    "q_decontaminate_bloom",
    f"""
    WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(
                    generate_series(1, len(ws) - 2),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
           FROM w WHERE len(ws) >= 3),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % {DECONTAM_EVAL_MOD} = 0),
    m AS (SELECT t.doc_id, COUNT(*) AS common
          FROM sh t JOIN ev ON t.s = ev.s
          WHERE t.doc_id % {DECONTAM_EVAL_MOD} <> 0
          GROUP BY 1)
    SELECT m.doc_id, CAST(m.common AS INTEGER) AS common,
           CAST(sz.n AS INTEGER) AS n_shingles,
           CAST(m.common AS DOUBLE) / sz.n AS containment
    FROM m JOIN sz ON m.doc_id = sz.doc_id
    WHERE CAST(m.common AS DOUBLE) / sz.n >= {DECONTAM_THRESHOLD}
    ORDER BY m.doc_id
    """,
    doc="bloom-prefiltered benchmark decontamination (union containment "
    f"against the whole eval side): the eval shingle set folds into {BLOOM_BITS} "
    "broadcast bloom bits (xxhash64 double hashing, map-side k-bit probe), "
    "only bloom-positive grams reach the exact confirm join — no false "
    "negatives, so the gated result is exactly the exact-join answer while "
    "the probed volume drops to true matches + the FP budget.",
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import shingle_sets_cached

    sets = shingle_sets_cached(spark, sf_dir)
    eval_sets = sets.where(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
    train_sets = sets.where(F.col("doc_id") % DECONTAM_EVAL_MOD != 0)
    return decontaminate_bloom(
        spark, train_sets, eval_sets, DECONTAM_THRESHOLD
    ).orderBy("doc_id")
