"""Deduplication operators for LLM training-data pipelines.

Five dedup families, each a DataFrame→DataFrame function plus a registered
oracle-checked query on the `documents` / `embeddings` fixtures:

  exact          md5 content hash → groupBy (one shuffle on the hash)
  n-gram Jaccard shingle inverted-index join → exact overlap ratio
  MinHash-LSH    64 minhashes → 16 bands of 4 → bucket join → exact verify
  SimHash        60-bit portable fingerprint → 4-band pigeonhole join →
                 hamming ≤ 3 (bands make the candidate step EXACT: any pair
                 with ≤3 differing bits must agree on ≥1 of 4 bands)
  embedding-cos  exact pairwise cosine (correctness baseline; the ANN path
                 for scale lives in operators/similarity.py)

Scale posture (100 TB): nothing here collects to the driver; every step is
a shuffle on a key whose cardinality grows with the data (hash, shingle,
band bucket). The inverted-index joins are the standard way to avoid O(n²):
candidate generation touches only pairs that share a bucket. Hot shingles
(boilerplate) are bounded by the stop-shingle document-frequency cap
(`max_shingle_df` on jaccard_pairs*, default STOP_SHINGLE_MAX_DF in the
registered query); MinHash bands already bound the join fan-out.

Hash portability: shingles are collapsed to xxhash64 longs at creation
(equality-only uses; see hashed_shingles) and MinHash salts that long with
the hash-function index — none of these hashes leave Spark, because LSH
candidates are re-verified with exact Jaccard, so the DuckDB oracle
(computing on raw strings) matches without sharing hash functions. SimHash
must BE the output, so its word hashes derive from md5 (identical in Spark
and DuckDB): int(md5[:15],16), 60 bits, ANSI-overflow-safe.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..plans.util import session_key, t, tp
from ..functions.text import word_hash

NGRAM_N = 3
JACCARD_THRESHOLD = 0.8
# Stop-shingle cap for the registered query: a shingle in >128 docs is
# boilerplate (license headers, templated markup) and only inflates join
# fan-out. Deliberately conservative: at J >= 0.8 a qualifying pair shares
# >= 80% of its shingles, so losing it requires EVERY shared shingle to sit
# in 128+ other docs — such docs are wholesale boilerplate and belong to
# exact dedup. At fixture scale (max df = 7 at sf0.01) the cap prunes
# nothing, keeping the oracle exact; tests pin result-equality under a cap
# that DOES prune (tests/test_dedup_cap.py).
STOP_SHINGLE_MAX_DF = 128
MINHASH_NUM = 64
MINHASH_BAND_ROWS = 4  # 16 bands of 4 — P(catch) ≈ 1 at j ≥ 0.9
SIMHASH_BITS = 60
SIMHASH_MAX_HAMMING = 3
COSINE_DUP_THRESHOLD = 0.4  # fixtures are near-random vectors; max cos ≈ 0.51


# --------------------------------------------------------------------------
# Shared shingling
# --------------------------------------------------------------------------


def shingles(text: Column | str, n: int = NGRAM_N) -> Column:
    """Distinct word n-gram shingles (space-joined strings)."""
    c = F.col(text) if isinstance(text, str) else text
    ws = F.split(F.trim(c), " ")
    idx = F.sequence(F.lit(1), F.size(ws) - (n - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(ws, i + k) for k in range(n)])
    return F.array_distinct(F.transform(idx, gram))


def hashed_shingles(text: Column | str, n: int = NGRAM_N) -> Column:
    """Distinct xxhash64'd word n-gram shingles (array<long>).

    The whole near-dup family — prefix-filter join keys, MinHash input,
    exact set intersection — only ever compares shingles for EQUALITY, so
    each shingle is collapsed to its 64-bit hash the moment it is formed
    and the text never travels further. Set semantics are preserved w.h.p.
    (a collision needs ~2³² distinct shingles per doc by birthday bound);
    the DuckDB oracle intersects the raw strings and the results agree.
    At 100 TB this shrinks the shuffled/cached footprint ~3× and turns
    every downstream compare into a long compare."""
    c = F.col(text) if isinstance(text, str) else text
    ws = F.split(F.trim(c), " ")
    idx = F.sequence(F.lit(1), F.size(ws) - (n - 1))
    gram = lambda i: F.xxhash64(
        F.concat_ws(" ", *[F.element_at(ws, i + k) for k in range(n)])
    )
    return F.array_distinct(F.transform(idx, gram))


def _shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, hset, n): per-doc distinct hashed-shingle array + its size;
    drops docs with < n words. The array form is the workhorse — set size
    comes free (no count window / extra agg), MinHash folds over it without
    an explode, and exact verification intersects two arrays per candidate."""
    return docs.where(F.size(F.split(F.trim("text"), " ")) >= NGRAM_N).select(
        "doc_id", hashed_shingles("text").alias("hset")
    ).withColumn("n", F.size("hset"))


_sets_cache: dict[tuple[int, str], DataFrame] = {}


def shingle_sets_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle sets persisted once per (session, corpus).

    Every near-dup family re-reads the shingle sets 2-4×: candidate
    generation plus both sides of exact verification. Recomputing the
    split+ngram+distinct pipeline each time dominated the dedup queries
    (measured 3× end-to-end at sf0.1). DISK_ONLY, not MEMORY_AND_DISK:
    shingle arrays are large relative to executor heap, and holding
    them on-heap taxes every *other* query with GC pressure (measured 1.5 s
    → 17-42 s on an unrelated scan-agg once the cache was resident).
    Serialized-to-disk partitions cost ~nothing to re-read (OS page cache)
    and leave the heap to the operators actually running — the same
    trade-off holds on a 100 TB cluster where cached text would evict
    shuffle/agg working memory."""
    from pyspark.storagelevel import StorageLevel

    key = (session_key(spark), sf_dir)
    if key not in _sets_cache:
        _sets_cache[key] = _shingle_sets(tp(spark, sf_dir, "documents")).persist(
            StorageLevel.DISK_ONLY
        )
    return _sets_cache[key]


def clear_dedup_caches(spark: SparkSession) -> None:
    """Release every DISK_ONLY materialization this module (and the
    similarity module) parked in the session: the shingle-set cache plus
    the anonymous self-join-shared persists (PPJoin prefix index, MinHash
    bands, SimHash bands, ANN LSH buckets).

    CacheManager dedups identical plans, so entries are bounded per
    distinct (input, params) pair — but a long-lived session iterating
    many sf_dirs/params still accumulates disk cache until shutdown
    (ADVICE r04 item 2). Call this between fixtures/corpora to reclaim
    the space; the next query simply re-materializes."""
    for key in [k for k in _sets_cache if k[0] == session_key(spark)]:
        _sets_cache.pop(key).unpersist()
    # Drops ALL cached plans in the session, including the anonymous
    # persists that have no module-level handle to unpersist individually.
    spark.catalog.clearCache()


_SQL_SHINGLES = """
  WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
  sh AS (SELECT doc_id,
                unnest(list_distinct(list_transform(
                  generate_series(1, len(ws) - 2),
                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
         FROM w WHERE len(ws) >= 3),
  sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)
"""

_SQL_JACCARD_PAIRS = f"""
  {_SQL_SHINGLES},
  pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
  SELECT da, db, CAST(common AS INTEGER) AS common,
         CAST(x.n + y.n - common AS INTEGER) AS union_sz,
         CAST(common AS DOUBLE) / (x.n + y.n - common) AS jaccard
  FROM pairs JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
  WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= {JACCARD_THRESHOLD}
  ORDER BY da, db
"""


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the min-id row per exact content hash. One shuffle, no Python."""
    h = F.md5(F.concat_ws("\x1f", *cols))
    return (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("group_sz"))
    )


@register(
    "q_dedup_exact",
    """
    SELECT md5(lower(text)) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS group_sz
    FROM documents
    GROUP BY md5(lower(text))
    ORDER BY keep_id
    """,
    doc="exact dedup by content hash (case-normalized).",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.lower("text")).alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("group_sz"))
        .orderBy("keep_id")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (exact near-dup baseline)
# --------------------------------------------------------------------------


def _verify_pairs(
    cand: DataFrame, sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard check of candidate (da, db) pairs: one row per pair via
    per-doc shingle ARRAYS + array_intersect — no row explosion, unlike a
    shingle-level re-join. Candidates are few by construction, so the two
    array joins are broadcast-sized at any corpus scale."""
    a = sets.select(
        F.col("doc_id").alias("da"), F.col("hset").alias("sa"), F.col("n").alias("na")
    )
    b = sets.select(
        F.col("doc_id").alias("db"), F.col("hset").alias("sb"), F.col("n").alias("nb")
    )
    common = F.size(F.array_intersect("sa", "sb"))
    j = common.cast("double") / (F.col("na") + F.col("nb") - common)
    return (
        cand.join(a, "da")
        .join(b, "db")
        .select(
            "da",
            "db",
            common.alias("common"),
            (F.col("na") + F.col("nb") - common).alias("union_sz"),
            j.alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact near-dup pairs over a docs DataFrame (uncached entry point)."""
    return jaccard_pairs_from_sets(_shingle_sets(docs), threshold, max_shingle_df)


def jaccard_pairs_from_sets(
    sets: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact near-dup pairs via PREFIX-FILTERED inverted-index join (the
    PPJoin family's prefix principle).

    A naive shingle self-join fans out quadratically on hot shingles
    (Σ freq² pairs). Prefix filtering is lossless for a Jaccard threshold t:
    order each doc's shingles by ascending global frequency; two docs with
    J ≥ t MUST share a shingle within each one's first
    (n - ceil(t·n) + 1) shingles. Joining only those prefix rows — the
    RAREST shingles of each doc — collapses the hot-shingle fan-out while
    provably losing no qualifying pair; survivors are re-verified exactly.
    At 100 TB this is the difference between a runnable join and Σ freq².

    `max_shingle_df` (stop-shingles, off by default) additionally drops
    shingles whose document frequency exceeds the cap from the INVERTED
    INDEX before the self-join — boilerplate n-grams (license headers,
    templated markup) otherwise dominate even the prefix join's residual
    fan-out at web scale. Verification is untouched (exact Jaccard over the
    FULL shingle arrays), so any surviving pair is exact; the cap is a
    recall heuristic only for pairs whose entire prefix is capped-hot —
    i.e. docs made of boilerplate, which are the pairs you *want* handled
    by exact dedup instead. Prefix positions are recomputed over the
    surviving (rarest-first) shingles, so the positional bound stays valid
    relative to the reduced index."""
    cand = _candidate_pairs(sets, threshold, max_shingle_df)
    return _verify_pairs(cand, sets, threshold)


def _candidate_pairs(
    sets: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Candidate (da, db) pairs from the prefix-filtered inverted-index
    self-join — the stage whose fan-out the stop-shingle cap bounds
    (exposed separately so tests can measure it under adversarial skew,
    VERDICT.md r04 item 5)."""
    from pyspark.storagelevel import StorageLevel

    sh = sets.select("doc_id", "n", F.explode("hset").alias("s"))
    freq = sh.groupBy("s").agg(F.count("*").alias("df"))
    if max_shingle_df is not None:
        freq = freq.where(F.col("df") <= max_shingle_df)
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    prefix = (
        sh.join(freq, "s")
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
        .select("doc_id", "s", "pos", "n")
        # Both sides of the self-join read this subtree; without a persist
        # Spark recomputes the explode + freq join + window per alias
        # (canonicalized-exchange reuse does not fire across the alias).
        # The prefix index is tiny — ~(1-t)·|shingles| rows of 4 longs —
        # so this is a cheap materialization even at 100 TB (measured at
        # sf0.1: steady-state 1.40 s → 0.76 s end-to-end). Repeated
        # invocations do NOT accumulate copies: CacheManager dedups by
        # canonical plan (verified — entry count is stable across calls),
        # so cached entries are bounded by distinct (input, params) pairs.
        .persist(StorageLevel.DISK_ONLY)
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    na, nb = F.col("a.n"), F.col("b.n")
    pa, pb = F.col("a.pos"), F.col("b.pos")
    # PPJoin pruning, both lossless at threshold t:
    #  length filter:     J ≥ t ⇒ min(na,nb) ≥ t·max(na,nb)
    #  positional filter: overlap ≤ 1 + min(na−pa, nb−pb), and J ≥ t needs
    #                     overlap ≥ ceil(t/(1+t)·(na+nb))
    min_overlap = F.ceil(F.lit(threshold / (1 + threshold)) * (na + nb))
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.least(na, nb) >= F.ceil(F.lit(threshold) * F.greatest(na, nb)))
            & (1 + F.least(na - pa, nb - pb) >= min_overlap),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    return cand


@register(
    "q_dedup_ngram_jaccard",
    _SQL_JACCARD_PAIRS,
    headline=True,
    doc="exact n-gram Jaccard near-dup pairs (shingle inverted index).",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jaccard_pairs_from_sets(
        shingle_sets_cached(spark, sf_dir), max_shingle_df=STOP_SHINGLE_MAX_DF
    ).orderBy("da", "db")


# --------------------------------------------------------------------------
# Shingle CONTAINMENT (asymmetric near-dup: short doc inside long doc)
# --------------------------------------------------------------------------
#
# Jaccard is blind to containment by construction: a 30-shingle quote
# embedded verbatim in a 3000-shingle article scores J ≈ 0.01 but
# C(short→long) = |A∩B|/|A| = 1.0. Corpus curation needs exactly this
# detector — quoted/excerpted/template-wrapped duplicates whose host is
# much larger. The machinery reuses the Jaccard family's hashed shingle
# sets and inverted index; only the prefix bound and the verify ratio
# change. Prefix filtering stays lossless for containment at threshold t:
# overlap ≥ ceil(t·na) forces at least one shared shingle within A's
# first (na − ceil(t·na) + 1) shingles under ANY fixed global order —
# only the PROBE side (A) needs a prefix cut; B is matched through the
# full inverted index, length-filtered by nb ≥ ceil(t·na) (B must be big
# enough to hold the overlap; there is deliberately no upper bound on nb,
# that asymmetry is the point). Hot boilerplate shingles on the index
# side are bounded by the same stop-shingle DF cap as Jaccard.

CONTAINMENT_THRESHOLD = 0.8


def containment_pairs_from_sets(
    sets: DataFrame,
    threshold: float = CONTAINMENT_THRESHOLD,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(da, db) pairs with |shingles(da) ∩ shingles(db)| / |shingles(da)|
    ≥ threshold and da != db — da's set (near-)contained in db's.
    Candidates from a probe-side-prefix × full-index join; survivors
    re-verified with exact array intersection."""
    from pyspark.storagelevel import StorageLevel

    sh = sets.select("doc_id", "n", F.explode("hset").alias("s"))
    freq = sh.groupBy("s").agg(F.count("*").alias("df"))
    if max_shingle_df is not None:
        freq = freq.where(F.col("df") <= max_shingle_df)
    idx = sh.join(freq, "s").persist(StorageLevel.DISK_ONLY)
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    need = F.ceil(F.lit(threshold) * F.col("n"))
    prefix = (
        idx.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= F.col("n") - need + 1)
        .select("doc_id", "s", "n")
    )
    a, b = prefix.alias("a"), idx.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            # B must be large enough to hold the required overlap
            & (F.col("b.n") >= F.ceil(F.lit(threshold) * F.col("a.n"))),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    av = sets.select(
        F.col("doc_id").alias("da"), F.col("hset").alias("sa"), F.col("n").alias("na")
    )
    bv = sets.select(
        F.col("doc_id").alias("db"), F.col("hset").alias("sb"), F.col("n").alias("nb")
    )
    common = F.size(F.array_intersect("sa", "sb"))
    return (
        cand.join(av, "da")
        .join(bv, "db")
        .select(
            "da",
            "db",
            common.alias("common"),
            "na",
            "nb",
            (common.cast("double") / F.col("na")).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


_SQL_CONTAINMENT_PAIRS = f"""
  {_SQL_SHINGLES},
  pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
            GROUP BY 1, 2)
  SELECT da, db, CAST(common AS INTEGER) AS common,
         CAST(x.n AS INTEGER) AS na, CAST(y.n AS INTEGER) AS nb,
         CAST(common AS DOUBLE) / x.n AS containment
  FROM pairs JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
  WHERE CAST(common AS DOUBLE) / x.n >= {CONTAINMENT_THRESHOLD}
  ORDER BY da, db
"""


@register(
    "q_dedup_containment",
    _SQL_CONTAINMENT_PAIRS,
    doc="asymmetric shingle-containment near-dup pairs (|A∩B|/|A| ≥ 0.8, "
    "short-in-long): probe-side prefix filter × full inverted index, "
    "exact re-verify — catches quoted/excerpted duplicates Jaccard's "
    "symmetric ratio misses.",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return containment_pairs_from_sets(
        shingle_sets_cached(spark, sf_dir), max_shingle_df=STOP_SHINGLE_MAX_DF
    ).orderBy("da", "db")


# --------------------------------------------------------------------------
# MinHash + LSH (the scale path for Jaccard)
# --------------------------------------------------------------------------


def minhash_signatures(sets: DataFrame, num_hashes: int = MINHASH_NUM) -> DataFrame:
    """doc_id → sig: array of [min over shingles of hash_i(s)], i < num_hashes.

    Computed as ONE nested higher-order expression — transform over
    sequence(0, num_hashes-1), array_min(transform(hset, xxhash64(i, h)))
    inside — instead of num_hashes separate projection columns. Same
    values (xxhash64 of the function index + the pre-hashed shingle; no
    string work in the inner loop), but the expression tree is O(1) in
    num_hashes rather than O(num_hashes): the 64-column form spent more
    time in Catalyst analysis than in execution (measured 1.63 s → 0.40 s
    end-to-end at sf0.001, where planning dominates; the win persists at
    any SF because planning cost is data-independent). Still a pure
    projection with zero shuffle.

    Lambda arity matters: the INNER transform lambda must stay unary (h) —
    a binary lambda would be fed (element, array_index) and shadow the
    outer band/function index. The function index `i` is the OUTER
    lambda's variable, captured by true HOF scoping (not a Python closure
    default, which F.transform would silently shadow)."""
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform("hset", lambda h: F.xxhash64(i, h))),
    )
    return sets.select("doc_id", sig.alias("sig"))


def lsh_candidate_pairs(
    sig: DataFrame, num_hashes: int = MINHASH_NUM, band_rows: int = MINHASH_BAND_ROWS
) -> DataFrame:
    """Band the signature array and bucket-join: pairs agreeing on ≥1 band.

    Banding is again one nested HOF over the signature ARRAY (xxhash64 of
    each band_rows-slice gives the bucket id per band) rather than
    hand-built struct columns over named h0..h63 columns — same
    expression-tree-size rationale as minhash_signatures."""
    n_bands = num_hashes // band_rows
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.slice("sig", b * band_rows + 1, band_rows)).alias("sig"),
        ),
    )
    from pyspark.storagelevel import StorageLevel

    banded = (
        sig.select("doc_id", F.explode(bands).alias("b"))
        .select("doc_id", F.col("b.band").alias("band"), F.col("b.sig").alias("sig"))
        # Both self-join sides read this subtree; without a persist each
        # alias recomputes the 64-hash MinHash fold over every shingle set
        # (the dominant cost). n_bands rows of 3 longs per doc — cheap to
        # materialize at any scale.
        .persist(StorageLevel.DISK_ONLY)
    )
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("da"), F.col("r.doc_id").alias("db"))
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """LSH dedup over a docs DataFrame (uncached entry point)."""
    return minhash_pairs_from_sets(_shingle_sets(docs), threshold)


def minhash_pairs_from_sets(
    sets: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """LSH candidates re-verified with exact Jaccard — output is (w.h.p.)
    identical to the exact inverted-index join, but candidate generation
    scales as the number of colliding band buckets, not O(n²) and not
    hot-shingle fan-out."""
    cand = lsh_candidate_pairs(minhash_signatures(sets))
    return _verify_pairs(cand, sets, threshold)


@register(
    "q_dedup_minhash_lsh",
    _SQL_JACCARD_PAIRS,  # exact-verified LSH must reproduce the exact result
    headline=True,
    doc="MinHash(64)+LSH(16x4) candidates, exact-Jaccard verified.",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_pairs_from_sets(shingle_sets_cached(spark, sf_dir)).orderBy(
        "da", "db"
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash(text: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """60-bit SimHash over md5-derived word hashes (engine-portable).

    bit_j(doc) = sign( Σ_words (2·((h(w)>>j)&1) − 1) ), computed as ONE fold
    over the word-hash array carrying a 60-counter vote vector. The previous
    60-separate-folds formulation re-inlined (and so re-computed) the
    word-hash transform once per bit after projection collapse; here the
    transform appears exactly once in the expression tree. Inside the fold,
    the lambda variable h is a plain long — fanning it into 60 bit terms is
    arithmetic, not recomputation."""
    c = F.col(text) if isinstance(text, str) else text
    hs = F.transform(F.split(F.trim(c), " "), word_hash)
    zeros = F.array_repeat(F.lit(0).cast("bigint"), bits)

    def bitvec(h: Column) -> Column:
        return F.array(
            *[
                (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1).cast("bigint")
                for j in range(bits)
            ]
        )

    votes = F.aggregate(
        hs, zeros, lambda acc, h: F.zip_with(acc, bitvec(h), lambda a, b: a + b)
    )
    powers = F.array(*[F.lit(1 << j).cast("bigint") for j in range(bits)])
    return F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    ).alias("simhash")


def hash_bands(
    sig: DataFrame, bits: int = SIMHASH_BITS, max_hamming: int = SIMHASH_MAX_HAMMING
) -> DataFrame:
    """(doc_id, sh) → (doc_id, sh, band, key): the pigeonhole banding
    projection — k+1 bands of bits//(k+1) bits each; any pair within
    hamming k agrees on at least one full band. Shared by the batch pair
    join below and the streaming incremental phash index
    (streaming/pipelines.py), whose persisted index IS this table."""
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                F.shiftright(F.col("sh"), k * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("key"),
            )
            for k in range(n_bands)
        ]
    )
    return sig.select("doc_id", "sh", F.explode(bands).alias("b")).select(
        "doc_id", "sh", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )


def hamming_band_pairs(
    sig: DataFrame, bits: int = SIMHASH_BITS, max_hamming: int = SIMHASH_MAX_HAMMING
) -> DataFrame:
    """(doc_id, sh) signatures → (da, db, hamming) pairs with hamming ≤ k,
    found EXACTLY via pigeonhole banding (zero recall loss). Shared by the
    word-level SimHash dedup and the multimodal payload perceptual-hash
    dedup (operators/multimodal.py)."""
    from pyspark.storagelevel import StorageLevel

    banded = (
        hash_bands(sig, bits=bits, max_hamming=max_hamming)
        # Both self-join sides read this subtree; exchange reuse does not
        # fire across the alias, so without a persist the signature fold
        # over the full payload runs once per side (same discipline as the
        # PPJoin prefix and MinHash banded persists). k+1 rows of 4 longs
        # per doc; DISK_ONLY like the other dedup caches — keep the heap
        # for operators actually running.
        .persist(StorageLevel.DISK_ONLY)
    )
    l, r = banded.alias("l"), banded.alias("r")
    ham = F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh")))
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col("l.doc_id").alias("da"),
            F.col("r.doc_id").alias("db"),
            ham.alias("hamming"),
        )
        .distinct()
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = SIMHASH_MAX_HAMMING) -> DataFrame:
    """Near-dup pairs by word-level SimHash hamming ≤ k (banded, exact)."""
    # exchange barrier: the banding projection references the signature 5×
    # (4 band keys + the output column); without the barrier, projection
    # collapse would inline — and recompute — the simhash fold each time.
    # Signature rows are (doc_id, long): the shuffle is negligible at any
    # corpus size.
    sig = docs.select("doc_id", simhash("text").alias("sh")).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    return hamming_band_pairs(sig, bits=SIMHASH_BITS, max_hamming=max_hamming)


@register(
    "q_dedup_simhash",
    f"""
    WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
    hs AS (SELECT doc_id,
                  list_transform(ws, w -> CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)) AS h
           FROM d),
    sh AS (SELECT doc_id,
                  list_sum(list_transform(generate_series(0, {SIMHASH_BITS - 1}), j ->
                    CASE WHEN list_sum(list_transform(h, x -> 2 * ((x >> j) & 1) - 1)) > 0
                         THEN CAST(1 AS BIGINT) << j ELSE 0 END)) AS simhash
           FROM hs)
    SELECT a.doc_id AS da, b.doc_id AS db,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    ORDER BY da, db
    """,
    doc="SimHash near-dup pairs, hamming ≤ 3 via exact pigeonhole banding.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        simhash_pairs(tp(spark, sf_dir, "documents"))
        .select("da", "db", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("da", "db")
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup (exact baseline; ANN variant in similarity.py)
# --------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Sequential-fold cosine in double — bit-identical across engines that
    fold left-to-right (the oracle uses list_reduce for the same order)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n1 = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    n2 = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (n1 * n2)


_SQL_SEQ_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
    "(acc, v) -> acc + v)"
)


def _sql_norm(v: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        f"(acc, w) -> acc + w))"
    )


def normalized(vec: Column) -> Column:
    """Unit-normalize once in a projection so each pair costs ONE fold
    (dot), not three (dot + two norms) — 3× less interpreted-HOF work in
    the pairwise stage, and the normalization is O(n) not O(n²)."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return F.transform(vec, lambda x: x.cast("double") / norm)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


_SQL_NORMALIZED = (
    "list_transform({v}, x -> CAST(x AS DOUBLE) / " + _sql_norm("{v}") + ")"
)


COSINE_BLOCKS = 8  # all-pairs block grid: each row replicates BLOCKS times


def cosine_pairs_blocked(
    emb: DataFrame, threshold: float = COSINE_DUP_THRESHOLD, n_blocks: int = COSINE_BLOCKS
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via a BLOCKED numpy matmul.

    The naive form (self-join + one fold per pair) evaluates O(n²) 64-dim
    interpreted folds — measured 62 s for 2000 vectors at sf0.1. Blocking is
    the canonical exact-scan shape: hash vectors into n_blocks, replicate
    each row once per block it must meet (n_blocks rows), group by block
    PAIR, and let one applyInPandas call do a (|A|,d)x(d,|B|) float64
    matmul per pair of blocks. Replication factor n_blocks trades shuffle
    volume for dense vectorized compute; at cluster scale pick n_blocks so
    a block pair fits executor memory. Output is the qualifying ID pairs
    only — safe against float reduction-order differences because no float
    is emitted and no fixture pair sits within 1e-12 of the threshold."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("va", LongType()), StructField("vb", LongType())]
    )

    def block_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ka, kb = key
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        own = pdf["own"].to_numpy(dtype=np.int64)
        if ka == kb:
            sims = mat @ mat.T
            ia, ib = np.triu_indices(len(ids), k=1)
            mask = sims[ia, ib] >= threshold
            va, vb = ids[ia[mask]], ids[ib[mask]]
        else:
            a_side, b_side = own == ka, own == kb
            if not a_side.any() or not b_side.any():
                return pd.DataFrame({"va": [], "vb": []}).astype("int64")
            sims = mat[a_side] @ mat[b_side].T
            ia, ib = np.nonzero(sims >= threshold)
            va, vb = ids[a_side][ia], ids[b_side][ib]
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame({"va": lo, "vb": hi})

    own = F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks))
    replicated = (
        emb.select("vec_id", "embedding", own.alias("own"))
        .withColumn("other", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))))
        .select(
            "vec_id",
            "embedding",
            "own",
            F.least("own", "other").alias("ka"),
            F.greatest("own", "other").alias("kb"),
        )
        # No dedup needed: for a fixed `own`, the n_blocks sorted pairs
        # (least, greatest) are pairwise distinct, so each row contributes
        # exactly one copy per block pair it must meet. (A defensive
        # dropDuplicates here cost a full extra shuffle of the replicated
        # corpus — 8x the input — for zero effect.)
    )
    return replicated.groupBy("ka", "kb").applyInPandas(block_pairs, out_schema)


@register(
    "q_dedup_embedding_cosine",
    f"""
    WITH u AS (
      SELECT vec_id, {_SQL_NORMALIZED.format(v="embedding")} AS ue
      FROM embeddings
    )
    SELECT a.vec_id AS va, b.vec_id AS vb
    FROM u a JOIN u b ON a.vec_id < b.vec_id
    WHERE {_SQL_SEQ_DOT.format(a="a.ue", b="b.ue")} >= {COSINE_DUP_THRESHOLD}
    ORDER BY va, vb
    """,
    headline=True,
    doc="exact pairwise embedding-cosine near-dup pairs (ids only) via "
    "blocked numpy matmul over an 8x8 block grid; oracle is the plain "
    "quadratic self-join.",
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return cosine_pairs_blocked(emb).orderBy("va", "vb")


# --------------------------------------------------------------------------
# Near-dup clusters: pairs -> connected components -> canonical keeper.
# --------------------------------------------------------------------------


def connected_components(
    edges: DataFrame, src: str = "da", dst: str = "db", max_iter: int = 20
) -> DataFrame:
    """(id, rep) per node: rep = min doc_id reachable in the pair graph —
    the canonical representative every near-dup cluster keeps.

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels; converges in O(graph
    diameter) rounds (near-dup clusters are shallow — a chain A~B~C is
    diameter 2). Each round is ONE shuffle (join + groupBy min); lineage is
    cut with localCheckpoint so round N's plan doesn't re-run rounds 1..N-1.
    The driver loop holds only a convergence COUNT, never data. Near-dup
    components are shallow, so diameter-bounded label-prop is the right
    default cost; for graphs that may be DEEP (long chains), use
    ``connected_components_star`` — alternating large-star/small-star
    rounds shortcut paths and converge in O(log n) rounds regardless of
    diameter."""
    a, b = F.col(src).alias("a"), F.col(dst).alias("b")
    e = edges.select(a, b)
    # Materialize the symmetrized edge list ONCE: every propagation round
    # scans it, and without the checkpoint each round would re-execute the
    # entire upstream near-dup pipeline that produced the edges. 2·|pairs|
    # rows of two longs — trivially small at any corpus scale.
    sym = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("rep", F.col("id"))
    )
    for _ in range(max_iter):
        nbr = sym.join(labels, sym.b == labels.id).select(
            F.col("a").alias("id"), "rep"
        )
        new = (
            labels.union(nbr).groupBy("id").agg(F.min("rep").alias("rep"))
        ).localCheckpoint(eager=True)
        changed = (
            new.join(labels.withColumnRenamed("rep", "old"), "id")
            .where(F.col("rep") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def connected_components_star(
    edges: DataFrame, src: str = "da", dst: str = "db", max_iter: int = 50
) -> DataFrame:
    """(id, rep) per node via alternating large-star/small-star rounds —
    the deep-component upgrade path for ``connected_components``
    (VERDICT.md r04 item 7).

    Min-label propagation needs O(graph diameter) rounds: a 10^6-node
    chain would take 10^6 shuffles. The star algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) converges in
    O(log n) rounds on ANY topology because each round rewires nodes
    directly to their neighborhood minimum, halving path lengths:

      large-star: for every node u, attach each neighbor v > u to
                  m = min(N(u) ∪ {u})   (strictly decreases big labels)
      small-star: orient each edge to its larger endpoint; attach each
                  smaller neighbor (and u itself) to the same m
                  (collapses local stars onto the minimum)

    Both rounds are one groupBy(min) + one join over the edge list — the
    same shuffle shape as a label-prop round, just O(log n) of them.
    Fixed point: the edge set is a star forest rooted at each component's
    minimum; labels read directly off it."""
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col(src) != F.col(dst)
    )
    nodes = (
        e0.select(F.col("u").alias("id"))
        .union(e0.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Work on the symmetric closure; every round re-derives its own
    # orientation. localCheckpoint per round cuts lineage exactly like the
    # label-prop loop (round N must not replay rounds 1..N-1).
    e = (
        e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # -- large-star ---------------------------------------------------
        m = e.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            e.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        keep = e.where(F.col("v") <= F.col("u")).select("u", "v")
        e1 = large.union(keep).distinct()
        # -- small-star ---------------------------------------------------
        # orient to the larger endpoint: key u >= every neighbor v
        eo = (
            e1.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        ms = eo.groupBy("u").agg(F.min("v").alias("m"))
        attach_nbrs = (
            eo.join(ms, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        attach_self = ms.select(F.col("u"), F.col("m").alias("v"))
        e2 = (
            attach_nbrs.union(attach_self)
            .distinct()
            .localCheckpoint(eager=True)
        )
        # convergence: small-star output is already larger->smaller star
        # edges; stable when symmetric closure equals the previous round's.
        e2_sym = (
            e2.union(e2.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = (
            e2_sym.exceptAll(e).limit(1).count() + e.exceptAll(e2_sym).limit(1).count()
        )
        e = e2_sym
        if changed == 0:
            break
    # star forest: every node's rep is its smaller endpoint (the component
    # min); isolated nodes (none here — edges define the universe) self-rep.
    star = e.where(F.col("v") < F.col("u")).groupBy(F.col("u").alias("id")).agg(
        F.min("v").alias("rep")
    )
    return nodes.join(star, "id", "left").select(
        "id", F.coalesce("rep", "id").alias("rep")
    )


_SQL_CLUSTERS = f"""
  WITH RECURSIVE {_SQL_SHINGLES.lstrip().removeprefix("WITH ")},
  pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
  dups AS (SELECT da, db FROM pairs JOIN sz x ON da = x.doc_id
                                    JOIN sz y ON db = y.doc_id
           WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= {JACCARD_THRESHOLD}),
  edges AS (SELECT da AS a, db AS b FROM dups
            UNION SELECT db, da FROM dups),
  reach(id, r) AS (
    SELECT DISTINCT a, a FROM edges
    UNION
    SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
  ),
  comp AS (SELECT id AS doc_id, MIN(r) AS rep FROM reach GROUP BY id)
  SELECT rep, COUNT(*) AS cluster_size,
         MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
  FROM comp GROUP BY rep ORDER BY rep
"""


@register(
    "q_dedup_clusters",
    _SQL_CLUSTERS,
    doc="near-dup pairs -> connected components (iterative min-label "
    "propagation, one shuffle per round) -> per-cluster keeper stats; "
    "oracle is a recursive-CTE transitive closure.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same stop-shingle cap as q_dedup_ngram_jaccard — the two registered
    # queries must agree on what "the near-dup pairs" are
    pairs = jaccard_pairs_from_sets(
        shingle_sets_cached(spark, sf_dir), max_shingle_df=STOP_SHINGLE_MAX_DF
    ).select("da", "db")
    comp = connected_components(pairs)
    return (
        comp.groupBy("rep")
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("id").alias("min_doc"),
            F.max("id").alias("max_doc"),
        )
        .orderBy("rep")
    )


# --------------------------------------------------------------------------
# Exact substring-span dedup (Lee et al. 2021, "Deduplicating Training Data
# Makes Language Models Better"): find fixed-length token spans that appear
# verbatim in more than one document. The paper builds a corpus suffix
# array; the Spark-scalable equivalent is stride-1 K-token window hashing —
# every K-token window is hashed (md5-derived int64, the repo's portable
# convention), windows shuffle ONCE on the hash, and a window is "dup" if
# its content occurs in >= 2 distinct docs. Per-doc output is the
# duplicated-span fraction — the signal used to strip boilerplate spans or
# drop span-contaminated docs.
#
# Scale: the window explode is O(corpus tokens) rows of (int64, int64) —
# same order as the shingle index; the one shuffle groups by hash. Nothing
# is all-pairs: the doc-frequency table is the duplication volume itself,
# and the re-join to mark windows is an equi join on the hash.
# --------------------------------------------------------------------------

SUBSTRING_K = 16  # span length in tokens


def substring_window_hashes(docs: DataFrame, k: int = SUBSTRING_K) -> DataFrame:
    """(doc_id, n_windows, h) — one row per K-token window position."""
    # The expression must be TOTAL (defined on every row, not just rows the
    # .where() keeps): the optimizer infers `size(win_arr) > 0` from the
    # downstream explode and may evaluate it on short rows, where
    # sequence(0, negative) runs DESCENDING into slice(..., 0, ...) — a
    # runtime error. The IF guard makes short rows yield an empty array.
    win_arr = F.expr(
        f"IF(size(split(trim(text), ' ')) >= {k},"
        f" transform(sequence(0, size(split(trim(text), ' ')) - {k}),"
        f" i -> CAST(conv(substring(md5(array_join("
        f"slice(split(trim(text), ' '), i + 1, {k}), ' ')), 1, 15), 16, 10)"
        f" AS BIGINT)),"
        f" CAST(array() AS ARRAY<BIGINT>))"
    )
    return (
        docs.where(F.size(F.split(F.trim("text"), " ")) >= k)
        .select("doc_id", win_arr.alias("wh"))
        .select(
            "doc_id",
            F.size("wh").cast("bigint").alias("n_windows"),
            F.explode("wh").alias("h"),
        )
    )


def substring_dup_spans(docs: DataFrame, k: int = SUBSTRING_K) -> DataFrame:
    """(doc_id, n_windows, n_dup_windows, dup_frac_q20) for docs with at
    least one span shared verbatim with another doc.

    The window-hash table feeds THREE consumers (doc-frequency, the dup
    re-join, per-doc totals); without a persist the per-token md5 window
    hashing — the expensive part — re-runs per consumer, i.e. three full
    tokenize+hash passes over the corpus at 100 TB (VERDICT r05 item 1).
    DISK_ONLY like the module's other self-join-shared subtrees: the rows
    are just (i64, i64, i64), cheap to re-read, and off-heap so they don't
    tax unrelated operators with GC pressure. Released via
    clear_dedup_caches() -> spark.catalog.clearCache()."""
    from pyspark.storagelevel import StorageLevel

    win = substring_window_hashes(docs, k).persist(StorageLevel.DISK_ONLY)
    shared = (
        win.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("d"))
        .where(F.col("d") >= 2)
        .select("h")
    )
    dup = (
        win.join(shared, "h")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_dup_windows"))
    )
    totals = win.groupBy("doc_id", "n_windows").agg(F.count("*").alias("_chk"))
    return (
        totals.select("doc_id", "n_windows")
        .join(dup, "doc_id")
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.floor(
                F.col("n_dup_windows") * F.lit(1048576.0) / F.col("n_windows")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("dup_frac_q20"),
        )
    )


_SQL_SUBSTRING = f"""
  WITH ws AS (
    SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
  ),
  win AS (
    SELECT doc_id, CAST(len(ws) - {SUBSTRING_K} + 1 AS BIGINT) AS n_windows,
           CAST(('0x' || substr(md5(array_to_string(ws[i:i + {SUBSTRING_K} - 1], ' ')),
                 1, 15)) AS BIGINT) AS h
    FROM ws, unnest(generate_series(1, len(ws) - {SUBSTRING_K} + 1)) AS t(i)
    WHERE len(ws) >= {SUBSTRING_K}
  ),
  shared AS (SELECT h FROM win GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
  dup AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
          FROM win SEMI JOIN shared ON win.h = shared.h GROUP BY doc_id),
  totals AS (SELECT DISTINCT doc_id, n_windows FROM win)
  SELECT t.doc_id, t.n_windows, d.n_dup_windows,
         CAST(floor(d.n_dup_windows * 1048576.0 / t.n_windows + 0.5) AS BIGINT)
           AS dup_frac_q20
  FROM totals t JOIN dup d ON t.doc_id = d.doc_id
  ORDER BY t.doc_id
"""


@register(
    "q_dedup_substring_spans",
    _SQL_SUBSTRING,
    headline=True,
    doc="exact substring-span dedup: stride-1 16-token window hashes, one "
    "shuffle on the hash, per-doc duplicated-span fraction (the scalable "
    "stand-in for suffix-array substring dedup).",
)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    return substring_dup_spans(docs).orderBy("doc_id")


# Substring-span APPLY: drop documents whose duplicated-span fraction
# exceeds the threshold (boilerplate-heavy docs), keep the rest — the
# action step for the detection above. The drop set is bounded by actual
# duplication, so the removal is a broadcast-able LEFT ANTI join exactly
# like the cluster apply below.

SUBSTRING_DROP_Q20 = 524288  # drop when >= 50% of spans are shared


_SQL_SUBSTRING_APPLY = _SQL_SUBSTRING.replace(
    """  SELECT t.doc_id, t.n_windows, d.n_dup_windows,
         CAST(floor(d.n_dup_windows * 1048576.0 / t.n_windows + 0.5) AS BIGINT)
           AS dup_frac_q20
  FROM totals t JOIN dup d ON t.doc_id = d.doc_id
  ORDER BY t.doc_id""",
    f"""  , flagged AS (
    SELECT t.doc_id
    FROM totals t JOIN dup d ON t.doc_id = d.doc_id
    WHERE floor(d.n_dup_windows * 1048576.0 / t.n_windows + 0.5)
            >= {SUBSTRING_DROP_Q20}
  )
  SELECT d.source, COUNT(*) AS n_docs
  FROM documents d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM flagged)
  GROUP BY d.source ORDER BY d.source""",
)
assert "flagged AS" in _SQL_SUBSTRING_APPLY  # the replace must have matched


@register(
    "q_dedup_substring_apply",
    _SQL_SUBSTRING_APPLY,
    doc="substring-span dedup APPLY: docs with >= 50% duplicated spans "
    "(wholesale boilerplate) removed via broadcast LEFT ANTI; per-source "
    "surviving counts. Shares the span detection with "
    "q_dedup_substring_spans by construction (same window-hash table).",
)
def q_dedup_substring_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    flagged = (
        substring_dup_spans(docs)
        .where(F.col("dup_frac_q20") >= SUBSTRING_DROP_Q20)
        .select("doc_id")
    )
    kept = docs.join(F.broadcast(flagged), "doc_id", "left_anti")
    return (
        kept.groupBy("source").agg(F.count("*").alias("n_docs")).orderBy("source")
    )


# --------------------------------------------------------------------------
# Near-dup apply: keep one doc per cluster (the representative), drop the
# rest — the action step the cluster computation exists for. The drop set
# is |cluster members - clusters| rows (bounded by actual duplication, not
# corpus size), so the removal is a broadcast-able LEFT ANTI join.
# --------------------------------------------------------------------------

_SQL_APPLY_CLUSTERS = _SQL_CLUSTERS.replace(
    """  SELECT rep, COUNT(*) AS cluster_size,
         MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
  FROM comp GROUP BY rep ORDER BY rep""",
    """  dropd AS (SELECT doc_id FROM comp WHERE doc_id <> rep),
  clean AS (SELECT d.source FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM dropd))
  SELECT source, COUNT(*) AS n_docs FROM clean GROUP BY source ORDER BY source""",
)
# the comp CTE chain ends without a trailing comma, so the replacement's
# first CTE must attach with one
_SQL_APPLY_CLUSTERS = _SQL_APPLY_CLUSTERS.replace(
    "GROUP BY id)\n  dropd AS", "GROUP BY id),\n  dropd AS"
)
assert ",\n  dropd AS" in _SQL_APPLY_CLUSTERS  # both replaces must have matched


@register(
    "q_dedup_apply_clusters",
    _SQL_APPLY_CLUSTERS,
    doc="near-dup apply: one survivor per cluster (the min-id "
    "representative), all other members removed via broadcast LEFT ANTI; "
    "per-source surviving counts. Shares pair/cluster semantics with "
    "q_dedup_clusters by construction (same SQL prefix, same Spark path).",
)
def q_dedup_apply_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.util import t

    pairs = jaccard_pairs_from_sets(
        shingle_sets_cached(spark, sf_dir), max_shingle_df=STOP_SHINGLE_MAX_DF
    ).select("da", "db")
    comp = connected_components(pairs)
    dropd = comp.where(F.col("id") != F.col("rep")).select(
        F.col("id").alias("doc_id")
    )
    docs = t(spark, sf_dir, "documents")
    clean = docs.join(F.broadcast(dropd), "doc_id", "left_anti")
    return (
        clean.groupBy("source").agg(F.count("*").alias("n_docs")).orderBy("source")
    )


# --------------------------------------------------------------------------
# Hybrid rerank: text-dedup candidates re-scored by embedding cosine —
# the multimodal confirmation step (SemDeDup meets MinHash): lexical
# near-dup pairs whose embeddings DISAGREE are template/boilerplate
# collisions, not semantic duplicates, and a pipeline may keep them.
# Candidate generation stays the bounded PPJoin index; the vector store
# joins in by id (the 100 TB shape: |candidates| << corpus, so the two
# id-joins are cheap; the cosine is one fold per candidate pair).
# --------------------------------------------------------------------------


@register(
    "q_dedup_rerank_cosine",
    f"""
  {_SQL_SHINGLES},
  pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
  j AS (SELECT da, db, common, x.n + y.n - common AS union_sz
        FROM pairs JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
        WHERE CAST(common AS DOUBLE) / (x.n + y.n - common)
                >= {JACCARD_THRESHOLD}),
  u AS (SELECT vec_id, {_SQL_NORMALIZED.format(v="embedding")} AS ue
        FROM embeddings)
  SELECT j.da, j.db, CAST(j.common AS INTEGER) AS common,
         CAST(j.union_sz AS INTEGER) AS union_sz,
         CAST(floor({_SQL_SEQ_DOT.format(a="a.ue", b="b.ue")} * 1048576.0 + 0.5)
              AS BIGINT) AS cos_q20
  FROM j JOIN u a ON j.da = a.vec_id JOIN u b ON j.db = b.vec_id
  ORDER BY j.da, j.db
    """,
    doc="hybrid dedup rerank: exact lexical near-dup pairs (PPJoin "
    "candidates, verified Jaccard) re-scored with the embedding cosine "
    "of both members (Q20) — the text+vector confirmation signal a "
    "semantic-aware pruner thresholds on; |candidates| id-joins against "
    "the vector store, one fold per pair.",
)
def q_dedup_rerank_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No stop-shingle cap here: the oracle joins the UNCAPPED shingle
    # index, and a capped Spark path would miss a pair whose whole
    # rarest-shingle prefix exceeds the df cap (ADVICE r06 item 4). The
    # PPJoin prefix filter alone already bounds the candidate fan-out,
    # and the cap is a recall heuristic, not a semantics requirement.
    pairs = jaccard_pairs_from_sets(
        shingle_sets_cached(spark, sf_dir)
    ).select("da", "db", "common", "union_sz")
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", normalized(F.col("embedding")).alias("ue")
    )
    a = emb.select(F.col("vec_id").alias("da"), F.col("ue").alias("ua"))
    b = emb.select(F.col("vec_id").alias("db"), F.col("ue").alias("ub"))
    return (
        pairs.join(a, "da")
        .join(b, "db")
        .select(
            "da",
            "db",
            F.col("common").cast("int").alias("common"),
            F.col("union_sz").cast("int").alias("union_sz"),
            F.floor(dot(F.col("ua"), F.col("ub")) * F.lit(1048576.0) + F.lit(0.5))
            .cast("bigint")
            .alias("cos_q20"),
        )
        .orderBy("da", "db")
    )


# --------------------------------------------------------------------------
# Cross-source duplicate leakage matrix — for every source pair, how many
# distinct texts (and how many document pairs) they share verbatim. The
# dedup-PLANNING read-out: it tells you where the duplication lives
# (mirrored dumps, cross-crawl overlap) before you pay for a corpus-wide
# dedup, and it is the source-level view of train/eval leakage.
#
# Scale: one corpus scan into a (hash, source) aggregate — the only
# corpus-sized shuffle — then the per-hash source sets pair up via array
# HOFs, NO JOIN AT ALL (a self-join here would broadcast or re-shuffle a
# corpus-derived table; the per-hash pair fan-out is bounded by
# |sources|², which is tiny). Hash is md5 hex, which both engines
# compute bit-for-bit.
# --------------------------------------------------------------------------


@register(
    "q_dedup_cross_source_matrix",
    """
    WITH c AS (
      SELECT md5(array_to_string(
               list_sort(list_distinct(string_split(trim(text), ' '))), ' '))
               AS h,
             source, COUNT(*) AS n
      FROM documents GROUP BY 1, 2
    )
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS n_shared_texts,
           CAST(SUM(a.n * b.n) AS BIGINT) AS n_cross_pairs
    FROM c a JOIN c b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="cross-source duplicate leakage matrix: per source pair, the "
    "distinct shared word-set fingerprints and cross-source doc pairs; one "
    "corpus shuffle into a (hash, source) aggregate, then per-hash "
    "source sets pair via array HOFs — single scan, zero joins "
    "(plan-pinned). The DuckDB oracle states the same result as the "
    "naive self-join.",
)
def q_dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # Fingerprint = md5 of the sorted DISTINCT word set (template/bag
    # normalization): verbatim hashing was vacuous on the fixture corpus
    # (0 cross-source hits at every SF, so the oracle verified nothing —
    # VERDICT r06 "what's wrong" item 1); the word-set fingerprint finds
    # the reworded template twins the corpus actually contains while
    # keeping the zero-join single-scan plan.
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(F.trim("text"), " "))))
    )
    c = docs.groupBy(fp.alias("h"), "source").agg(F.count("*").alias("n"))
    sets = (
        c.groupBy("h")
        .agg(F.collect_list(F.struct("source", "n")).alias("ss"))
        .where(F.size("ss") > 1)
    )

    def pair_up(ss):
        # all ordered (a, b) combos of the per-hash source set; unary
        # lambdas only (binary HOF lambdas receive the array index)
        def outer(x):
            return F.transform(ss, lambda y: F.struct(x.alias("a"), y.alias("b")))

        return F.filter(
            F.flatten(F.transform(ss, outer)),
            lambda p: p["a"]["source"] < p["b"]["source"],
        )

    pairs = sets.select(F.explode(pair_up(F.col("ss"))).alias("p"))
    return (
        pairs.groupBy(
            F.col("p.a.source").alias("source_a"),
            F.col("p.b.source").alias("source_b"),
        )
        .agg(
            F.count("*").alias("n_shared_texts"),
            F.sum(F.col("p.a.n") * F.col("p.b.n")).alias("n_cross_pairs"),
        )
        .orderBy("source_a", "source_b")
    )


# --------------------------------------------------------------------------
# Quality-aware survivor selection — the other half of dedup policy.
# q_dedup_apply_clusters keeps the MIN-ID member of each duplicate
# group (arbitrary but deterministic); real pipelines keep the BEST
# member: near-dup web dumps differ by truncation, and keeping the
# longest (most complete) variant preserves more signal at identical
# dedup rate. Groups here are word-set-fingerprint groups (the same
# normalization as the cross-source matrix / leakage-free split);
# survivor = max token count, doc_id as the tiebreak.
#
# Scale shape: ONE fingerprint-key window shuffle elects the survivor
# (no group+join-back); the per-source inventory aggregates the
# survivor set. No joins, no driver work.
# --------------------------------------------------------------------------


@register(
    "q_dedup_keep_longest",
    """
    WITH f AS (
      SELECT doc_id, source,
             len(string_split(trim(text), ' ')) AS n_tokens,
             md5(array_to_string(
               list_sort(list_distinct(string_split(trim(text), ' '))), ' '))
               AS fp
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY fp
                                ORDER BY n_tokens DESC, doc_id) AS rk
      FROM f
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_survivors,
           CAST(SUM(n_tokens) AS BIGINT) AS token_sum
    FROM r WHERE rk = 1
    GROUP BY source ORDER BY source
    """,
    doc="quality-aware dedup survivors: within each word-set-fingerprint "
    "duplicate group, keep the LONGEST member (doc_id tiebreak) instead "
    "of the arbitrary min-id — the most-complete-variant policy; one "
    "fingerprint-key window shuffle, no joins; per-source survivor "
    "inventory.",
)
def q_dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(F.split(F.trim("text"), " ")))
        )
    )
    f = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), " ")).cast("bigint").alias("n_tokens"),
        fp.alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy(F.desc("n_tokens"), "doc_id")
    return (
        f.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_survivors"),
            F.sum("n_tokens").cast("bigint").alias("token_sum"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Incremental cross-corpus near-dup — the operation a continuously-
# ingesting pipeline runs daily (VERDICT r07 item 7): dedup a NEW batch
# against the EXISTING corpus without recomputing the corpus. The
# corpus's MinHash band signatures and shingle sets are PERSISTED once
# (in production: a byproduct of the last full dedup, appended to by
# each batch — the staged-swap pattern of the incremental BM25 index);
# the batch computes only its own shingles/signatures (O(batch)), and
# candidate generation joins batch bands against index ∪ batch bands —
# never corpus × corpus. Exact-Jaccard verification reads corpus
# shingle sets from the persisted store, so the whole run touches the
# corpus text zero times.
#
# The chained oracle PROVES result == full recompute: the SQL side
# computes exact Jaccard pairs over the whole corpus∪batch and derives
# the same per-source read-out — the incremental path must reproduce it
# bit-for-bit (same guarantee q_dedup_minhash_lsh pins for the batch
# variant: 16x4 banding catches every J>=0.8 pair w.h.p., and
# verification is exact).
# --------------------------------------------------------------------------


def banded_signatures(
    sets: DataFrame,
    num_hashes: int = MINHASH_NUM,
    band_rows: int = MINHASH_BAND_ROWS,
) -> DataFrame:
    """(doc_id, band, sig): the exploded LSH band table of a shingle-set
    DataFrame — the unit the persisted index stores and batches append."""
    n_bands = num_hashes // band_rows
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.slice("sig", b * band_rows + 1, band_rows)).alias("sig"),
        ),
    )
    return (
        minhash_signatures(sets, num_hashes)
        .select("doc_id", F.explode(bands).alias("b"))
        .select("doc_id", F.col("b.band").alias("band"), F.col("b.sig").alias("sig"))
    )


_minhash_index_paths: dict[tuple[int, str, int], str] = {}


def minhash_index_path(spark: SparkSession, sf_dir: str, cut: int) -> str:
    """Build (once per session+fixture+cut) the persisted near-dup index
    of the corpus slice doc_id <= cut: bands/ (doc_id, band, sig) for
    candidate generation and sets/ (doc_id, hset, n) for exact
    verification."""
    import re as _re

    from ..plans.util import work_dir

    key = (session_key(spark), sf_dir, cut)
    if key not in _minhash_index_paths:
        # cut is part of the on-disk name: the memo key includes it, so a
        # second call with a different cut for the same fixture must get a
        # DISTINCT directory — otherwise the rebuild clears the dir the
        # first key's cached path still points at (ADVICE r08 item 2)
        path = work_dir(
            f"minhash_index_{_re.sub(r'[^A-Za-z0-9]+', '_', sf_dir)}_{cut}"
        )
        corpus_sets = shingle_sets_cached(spark, sf_dir).where(
            F.col("doc_id") <= cut
        )
        corpus_sets.write.mode("overwrite").parquet(f"{path}/sets")
        banded_signatures(corpus_sets).write.mode("overwrite").parquet(
            f"{path}/bands"
        )
        _minhash_index_paths[key] = path
    return _minhash_index_paths[key]


@register(
    "q_dedup_incremental_minhash",
    f"""
    {_SQL_SHINGLES},
    lim AS (SELECT CAST(FLOOR(max(doc_id) * 3.0 / 4) AS BIGINT) AS cut
            FROM documents),
    pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    q AS (SELECT da, db FROM pairs
          JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
          WHERE CAST(common AS DOUBLE) / (x.n + y.n - common)
                  >= {JACCARD_THRESHOLD}),
    bd AS (SELECT d.doc_id, d.source FROM documents d, lim
           WHERE d.doc_id > lim.cut
             AND len(string_split(trim(d.text), ' ')) >= {NGRAM_N}),
    fl AS (SELECT q.db AS doc_id,
                  MAX(CASE WHEN q.da <= (SELECT cut FROM lim)
                           THEN 1 ELSE 0 END) AS vs_corpus
           FROM q WHERE q.db > (SELECT cut FROM lim) GROUP BY q.db)
    SELECT bd.source,
           CAST(COUNT(*) AS BIGINT) AS n_batch,
           CAST(SUM(CASE WHEN fl.vs_corpus = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_vs_corpus,
           CAST(SUM(CASE WHEN fl.vs_corpus = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_in_batch,
           CAST(SUM(CASE WHEN fl.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new_unique
    FROM bd LEFT JOIN fl USING (doc_id)
    GROUP BY bd.source ORDER BY bd.source
    """,
    doc="incremental near-dup against a PERSISTED MinHash index: batch "
    "bands probe index+batch bands (O(batch) compute, zero corpus "
    "recompute; verification reads the persisted shingle store), batch "
    "docs classified dup-vs-corpus / dup-in-batch / new-unique per "
    "source; the oracle is the FULL exact-Jaccard recompute, proving "
    "the incremental path equals it.",
)
def q_dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    docs = tp(spark, sf_dir, "documents")
    cut = int(
        docs.agg(F.floor(F.max("doc_id") * 3 / 4).cast("bigint").alias("cut"))
        .collect()[0]["cut"]
    )
    idx = minhash_index_path(spark, sf_dir, cut)
    isets = spark.read.parquet(f"{idx}/sets")
    ibands = spark.read.parquet(f"{idx}/bands")
    # O(batch): the batch slice of the session shingle cache — in a real
    # ingest this is the only shingling that runs at all
    bsets = shingle_sets_cached(spark, sf_dir).where(F.col("doc_id") > cut)
    # both the probe side and the union side read the batch bands;
    # persist so the 64-hash fold runs once (family discipline)
    bbands = banded_signatures(bsets).persist(StorageLevel.DISK_ONLY)
    l, r = bbands.alias("l"), ibands.unionByName(bbands).alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("r.doc_id") < F.col("l.doc_id")),
        )
        .select(F.col("r.doc_id").alias("da"), F.col("l.doc_id").alias("db"))
        .distinct()
    )
    verified = _verify_pairs(
        cand, isets.unionByName(bsets), JACCARD_THRESHOLD
    )
    flags = verified.groupBy("db").agg(
        F.max(F.when(F.col("da") <= cut, 1).otherwise(0)).alias("vs_corpus")
    )
    batch_docs = docs.where(
        (F.col("doc_id") > cut)
        & (F.size(F.split(F.trim("text"), " ")) >= NGRAM_N)
    ).select("doc_id", "source")
    return (
        batch_docs.join(flags, F.col("doc_id") == F.col("db"), "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_batch"),
            F.sum(F.when(F.col("vs_corpus") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_vs_corpus"),
            F.sum(F.when(F.col("vs_corpus") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_in_batch"),
            F.sum(F.when(F.col("db").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new_unique"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Threshold sweep — the retention curve a pipeline owner reads BEFORE
# committing to a dedup threshold: how many documents survive at J >= 0.5
# / 0.7 / 0.8 / 0.9. The expensive part (candidate pairs) is computed
# ONCE at the loosest threshold (PPJoin prefix filtering is exact for the
# threshold it's given, so the 0.5-pair set contains every pair any
# tighter cut needs); classification per threshold is then a broadcast of
# a 4-row literal against the bounded pair set. Threshold comparisons are
# integer-exact (common * den >= num * union), never double ratios.
# --------------------------------------------------------------------------

DEDUP_SWEEP: tuple[tuple[str, int, int], ...] = (
    ("0.50", 1, 2),
    ("0.70", 7, 10),
    ("0.80", 4, 5),
    ("0.90", 9, 10),
)


@register(
    "q_dedup_threshold_sweep",
    f"""
    {_SQL_SHINGLES},
    pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pj AS (SELECT da, db, common, x.n + y.n - common AS u
           FROM pairs JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id),
    thr(threshold, num, den) AS (VALUES
      ('0.50', 1, 2), ('0.70', 7, 10), ('0.80', 4, 5), ('0.90', 9, 10)),
    dup AS (SELECT t.threshold, COUNT(DISTINCT pj.db) AS n_dup
            FROM thr t JOIN pj ON pj.common * t.den >= t.num * pj.u
            GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM documents)
    SELECT t.threshold,
           CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_docs,
           CAST(tot.n - COALESCE(d.n_dup, 0) AS BIGINT) AS n_surviving
    FROM thr t LEFT JOIN dup d ON d.threshold = t.threshold, tot
    ORDER BY t.threshold
    """,
    doc="dedup retention curve: surviving-document counts at Jaccard "
    "thresholds 0.5/0.7/0.8/0.9 from ONE pair computation at the loosest "
    "cut (PPJoin prefix filtering is exact per threshold, so the 0.5 "
    "pair set covers every tighter cut); per-threshold classification is "
    "a 4-row broadcast with integer-exact fraction comparisons.",
)
def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    pairs = jaccard_pairs_from_sets(shingle_sets_cached(spark, sf_dir), 0.5)
    thr = spark.createDataFrame(
        list(DEDUP_SWEEP), "threshold string, num int, den int"
    )
    dup = (
        F.broadcast(thr)
        .join(
            pairs,
            F.col("common") * F.col("den") >= F.col("num") * F.col("union_sz"),
        )
        .groupBy("threshold")
        .agg(F.countDistinct("db").alias("n_dup"))
    )
    total = docs.agg(F.count("*").alias("n_total"))
    return (
        thr.join(dup, "threshold", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "threshold",
            F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup_docs"),
            (F.col("n_total") - F.coalesce("n_dup", F.lit(0)))
            .cast("bigint")
            .alias("n_surviving"),
        )
        .orderBy("threshold")
    )


# --------------------------------------------------------------------------
# Containment SURVIVOR SELECTION — turning containment pairs into a kept
# corpus needs a policy that terminates without iteration: a doc is
# dropped iff it is (near-)contained in a partner with a STRICTLY
# larger shingle set (ties broken by smaller doc_id). The dominance
# order is a strict total preorder, so "dropped" never chains — every
# dropped doc names a LARGER surviving-or-dropped dominator whose own
# dominator is larger still, and the maximal docs always survive;
# single pass, no transitive closure. Exact duplicates (equal sets,
# containment 1.0 both ways) keep the min-id member — the same survivor
# convention as exact dedup.
# --------------------------------------------------------------------------


@register(
    "q_dedup_containment_apply",
    f"""
    {_SQL_SHINGLES},
    pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
              GROUP BY 1, 2),
    dropped AS (
      SELECT DISTINCT da AS doc_id
      FROM pairs JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
      WHERE CAST(common AS DOUBLE) / x.n >= {CONTAINMENT_THRESHOLD}
        AND (y.n > x.n OR (y.n = x.n AND db < da))
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_surviving
    FROM documents d LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
    doc="containment survivor selection: drop docs (near-)contained in a "
    "strictly larger partner (min-id tie-break) — dominance is a strict "
    "order, so one pass terminates without transitive closure; per-"
    "source survivor counts. Docs below the shingling threshold are "
    "untouched survivors.",
)
def q_dedup_containment_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tp(spark, sf_dir, "documents")
    pairs = containment_pairs_from_sets(
        shingle_sets_cached(spark, sf_dir), max_shingle_df=STOP_SHINGLE_MAX_DF
    )
    dropped = (
        pairs.where(
            (F.col("nb") > F.col("na"))
            | ((F.col("nb") == F.col("na")) & (F.col("db") < F.col("da")))
        )
        .select(F.col("da").alias("doc_id"))
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )
    return (
        docs.join(dropped, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("_dropped").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_surviving"),
        )
        .orderBy("source")
    )
