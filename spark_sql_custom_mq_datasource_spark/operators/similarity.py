"""Similarity search over embedding columns (`array<float>`).

Three strategies, mirroring how ANN actually gets done on big corpora:

  brute-force   broadcast the (small) query matrix, scan the corpus with an
                Arrow-batched mapInPandas doing one numpy matmul per batch,
                keep per-batch top-k, reduce to global top-k with a window.
                Exact; scales linearly with corpus size — the 100 TB shape
                (queries ≪ corpus) keeps the broadcast tiny.
  LSH-bucketed  integer-quantized random-hyperplane signatures; candidates
                are same-bucket rows only. Sub-linear candidate sets;
                recall < 1 vs brute force by construction, but the bucket
                assignment itself is exact int64 arithmetic both engines
                reproduce — fully value-checked.
  IVF           coarse quantizer = per-label centroids over scalar-
                quantized vectors ("trained" by one integer-sum groupBy);
                probe the nprobe nearest centroids and scan only their
                clusters. Quantization makes the centroids and folds
                portable — fully value-checked.

All three are value-checked against DuckDB; the exact threshold-join
variant lives in operators/dedup.py (q_dedup_embedding_cosine, blocked
numpy matmul), also with a full oracle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from ..plans.registry import register
from ..plans.util import materialize_small, session_key, t, tp, work_dir

TOPK = 5
N_QUERIES = 5  # fixture queries: vec_id < 5
# 6 planes = 64 buckets: at fixture scale (500-2000 near-random vectors)
# buckets hold ~8-30 candidates — a real sub-linear cut that still yields
# neighbors. More planes = smaller buckets = higher selectivity; tune per
# corpus density.
LSH_PLANES = 6
LSH_SEED = 42
IVF_NPROBE = 2
# Hard ceiling on the query-side driver collect. The query set is small by
# contract (it rides inside a task closure / broadcast); this guard turns
# that contract into an enforced invariant so a mis-wired caller can never
# quietly pull a 100 TB corpus through the driver.
MAX_COLLECTED_QUERIES = 4096


def _collect_query_matrix(queries: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Collect (vec_id, embedding) of the query set with a size guard.

    limit(cap+1) bounds the transfer itself — the driver never fetches more
    than cap+1 rows even when the input is the whole corpus, and one extra
    row is enough to detect the overflow and fail loudly."""
    rows = (
        queries.select("vec_id", "embedding")
        .limit(MAX_COLLECTED_QUERIES + 1)
        .collect()
    )
    if len(rows) > MAX_COLLECTED_QUERIES:
        raise ValueError(
            f"ANN query set exceeds MAX_COLLECTED_QUERIES={MAX_COLLECTED_QUERIES}; "
            "a query set this large should be a distributed join "
            "(e.g. block-nested mapInPandas over both sides), not a driver collect"
        )
    qids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    qmat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    return qids, qmat

_TOPK_SCHEMA = StructType(
    [
        StructField("qid", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("sim", DoubleType()),
    ]
)


def ann_bruteforce_topk(
    corpus: DataFrame, queries: DataFrame, k: int = TOPK
) -> DataFrame:
    """Exact top-k cosine neighbors of each query over the corpus.

    The query matrix is collected once (it is small by contract) and shipped
    inside the mapInPandas closure — the Spark-side broadcast of a driver
    object. Each Arrow batch does one float64 matmul; only k rows per
    (batch, query) survive, so the final window sees ~k·num_batches rows per
    query, never the corpus."""
    qids, qmat = _collect_query_matrix(queries)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = qmat @ mat.T  # (nq, batch)
            for qi in range(len(qids)):
                mask = ids != qids[qi]  # exclude self
                s, cid = sims[qi][mask], ids[mask]
                if len(cid) == 0:
                    continue
                top = np.argsort(-s, kind="stable")[:k]
                yield pd.DataFrame(
                    {"qid": qids[qi], "neighbor_id": cid[top], "sim": s[top]}
                )

    partial = corpus.select("vec_id", "embedding").mapInPandas(scan, _TOPK_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "neighbor_id", F.col("rk").cast("int").alias("rk"))
    )


_SQL_SEQ_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
    "(acc, v) -> acc + v)"
)
_SQL_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
    "(acc, w) -> acc + w))"
)


@register(
    "q_ann_bruteforce_topk",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
    sims AS (
      SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
             {_SQL_SEQ_DOT.format(a="q.embedding", b="c.embedding")}
               / ({_SQL_NORM.format(v="q.embedding")} * {_SQL_NORM.format(v="c.embedding")}) AS sim
      FROM q JOIN embeddings c ON c.vec_id != q.vec_id
    )
    SELECT qid, neighbor_id, rk FROM (
      SELECT qid, neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS INT) AS rk
      FROM sims
    ) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """,
    headline=True,
    doc="exact brute-force cosine top-k (numpy-vectorized corpus scan).",
)
def q_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus scan parallelized; the query side stays on the plain scan so
    # the vec_id filter pushes to parquet (collecting 5 rows must not drag
    # the whole table through the round-robin exchange)
    emb = tp(spark, sf_dir, "embeddings")
    queries = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    return ann_bruteforce_topk(emb, queries, TOPK).orderBy("qid", "rk")


# --------------------------------------------------------------------------
# LSH-bucketed ANN — the sub-linear scale path (rows-only check).
# --------------------------------------------------------------------------


from pyspark.sql.functions import pandas_udf


@pandas_udf(DoubleType())
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized pairwise cosine for rerank stages: one Arrow batch = two
    (n, dim) matrices, three numpy reductions. Chosen over the JVM
    higher-order-function fold because a fold per pair (a) is interpreted,
    not codegen'd, and (b) the normalize+dot expression tree gets re-inlined
    into every consumer by projection collapse — at 12 planes x 64 dims,
    Catalyst ANALYSIS time alone dominated these small-output queries."""
    ma = np.stack(a.to_numpy()).astype(np.float64)
    mb = np.stack(b.to_numpy()).astype(np.float64)
    num = (ma * mb).sum(axis=1)
    den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    return pd.Series(num / den)


QUANT = 1 << 20  # embedding quantization scale
PLANE_RANGE = 1 << 20  # plane entries in [-2^20, 2^20)


def _hyperplanes_int(dim: int, n_planes: int = LSH_PLANES) -> np.ndarray:
    """Integer random-hyperplane matrix derived from md5 — the SAME values
    any engine can recompute: plane[j][d] = int(md5(f"p{j}:{d}")[:15], 16)
    mod 2^21 - 2^20. Integer planes + integer-quantized embeddings make
    the sign-of-projection EXACT (int64 arithmetic, no float reduction
    order) — the bucket assignment is bit-reproducible in DuckDB, which
    upgrades this ANN path from a rows-only check to a full value oracle."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.int64)
    for j in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"p{j}:{d}".encode()).hexdigest()[:15], 16)
            out[j, d] = h % (2 * PLANE_RANGE) - PLANE_RANGE
    return out


def lsh_bucket(df: DataFrame, dim: int) -> DataFrame:
    """Sign-of-projection bucket id per row, Arrow-batched numpy.

    The planes ship inside the UDF closure; each batch is ONE (n, dim) @
    (dim, n_planes) int64 matmul — the right shape for a 100 TB corpus
    scan. (A previous all-JVM formulation built the 12x64 literal
    coefficient matrix into the expression tree; Catalyst spent multiple
    seconds just analyzing it — planning cost, not compute, dominated.)
    Embeddings are quantized with floor(x*2^20 + 0.5) — floor, not
    round(), because numpy rounds half-to-even while SQL engines round
    half-away; floor(+0.5) is identical everywhere. |eq| <= 2^20 and
    |plane| < 2^20 over 64 dims keeps projections < 2^47 — no overflow."""
    planes = _hyperplanes_int(dim)
    weights = 1 << np.arange(planes.shape[0], dtype=np.int64)

    @pandas_udf(LongType())
    def bucket_udf(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float64)  # (n, dim)
        q = np.floor(mat * QUANT + 0.5).astype(np.int64)
        bits = (q @ planes.T) > 0  # (n, n_planes), exact int64
        return pd.Series((bits @ weights).astype(np.int64))

    return df.withColumn("bucket", bucket_udf("embedding"))


def _sql_bucket_ctes(dim: int = 64, n_planes: int = LSH_PLANES) -> str:
    """DuckDB CTEs recomputing lsh_bucket() bit-for-bit, set-based: the
    plane matrix is materialized ONCE (n_planes*dim md5 calls total, not
    per row), projections are an exact int64 SUM over an unnested
    (vec_id, dim) join — order-independent, so grouped aggregation is safe."""
    return f"""
    planes AS (
      SELECT j, d,
             CAST(('0x' || substr(md5('p' || j || ':' || (d - 1)), 1, 15)) AS BIGINT)
               % {2 * PLANE_RANGE} - {PLANE_RANGE} AS w
      FROM generate_series(0, {n_planes - 1}) s(j), generate_series(1, {dim}) t(d)
    ),
    ev AS (
      SELECT vec_id, d, CAST(floor(embedding[d] * {QUANT} + 0.5) AS BIGINT) AS eq
      FROM embeddings, generate_series(1, {dim}) g(d)
    ),
    proj AS (
      SELECT vec_id, j, SUM(eq * w) AS p
      FROM ev JOIN planes USING (d) GROUP BY vec_id, j
    ),
    buckets AS (
      SELECT vec_id, SUM(CASE WHEN p > 0 THEN 1 << j ELSE 0 END) AS bucket
      FROM proj GROUP BY vec_id
    )"""


_SQL_UNIT = (
    "list_transform(embedding, x -> CAST(x AS DOUBLE) / "
    + _SQL_NORM.format(v="embedding")
    + ")"
)


def _lsh_oracle_sql() -> str:
    dot = _SQL_SEQ_DOT.format(a="q.qe", b="c.ue")
    return f"""
    WITH {_sql_bucket_ctes()},
    b AS (SELECT e.vec_id, {_SQL_UNIT} AS ue, bk.bucket
          FROM embeddings e JOIN buckets bk USING (vec_id)),
    q AS (SELECT vec_id AS qid, ue AS qe, bucket AS qb
          FROM b WHERE vec_id < {N_QUERIES}),
    cand AS (
      SELECT q.qid, c.vec_id AS neighbor_id, {dot} AS sim
      FROM q JOIN b c ON c.bucket = q.qb AND c.vec_id != q.qid
    )
    SELECT qid, neighbor_id, rk FROM (
      SELECT qid, neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS INT) AS rk
      FROM cand
    ) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """


@register(
    "q_ann_lsh_bucketed",
    _lsh_oracle_sql(),
    headline=True,
    doc="LSH (integer-quantized random hyperplane) bucketed ANN: "
    "same-bucket candidates, sequential-fold cosine rerank. Sub-linear "
    "(recall < 1 vs brute force by construction), yet FULLY value-checked: "
    "md5-derived integer planes + floor-quantized embeddings make bucket "
    "assignment exact int64 arithmetic both engines reproduce bit-for-bit.",
)
def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dot, normalized

    # Unit-normalize ONCE per row and cut the plan behind a repartition
    # barrier — without it, projection collapse re-inlines the 64-dim
    # normalize fold into every pairwise reference and Catalyst's
    # analysis/codegen of the exploded tree dominates wall-clock (measured
    # 77s cold / 9s warm for the fold-per-pair form vs ~2s here). Same
    # discipline as q_dedup_embedding_cosine / simhash banding.
    from pyspark.storagelevel import StorageLevel

    emb = (
        lsh_bucket(tp(spark, sf_dir, "embeddings"), 64)
        .select("vec_id", normalized(F.col("embedding")).alias("ue"), "bucket")
        .repartition(spark.sparkContext.defaultParallelism)
        # Query side and corpus side both read this subtree; persisting it
        # runs the pandas-UDF bucketing + normalize once instead of per
        # branch (measured ~1.2s -> ~0.8s at sf0.001; same discipline as
        # the dedup prefix/banded persists).
        .persist(StorageLevel.DISK_ONLY)
    )
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("ue").alias("qe"),
        F.col("bucket").alias("qb"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        F.broadcast(queries)
        .join(emb, (F.col("qb") == F.col("bucket")) & (F.col("vec_id") != F.col("qid")))
        # one sequential dot fold per pair — bit-identical to the oracle's
        # list_reduce order (cosine_udf's numpy pairwise reduction is not).
        .withColumn("sim", dot(F.col("qe"), F.col("ue")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("qid", F.col("vec_id").alias("neighbor_id"), F.col("rk").cast("int").alias("rk"))
        .orderBy("qid", "rk")
    )


# --------------------------------------------------------------------------
# IVF ANN — coarse quantizer via per-label centroids (rows-only check).
# --------------------------------------------------------------------------


def _ivf_oracle_sql(dim: int = 64) -> str:
    unit = "list_transform({v}, x -> x / " + _SQL_NORM.format(v="{v}") + ")"
    dotc = _SQL_SEQ_DOT.format(a="q.qu", b="c.cu")
    dote = _SQL_SEQ_DOT.format(a="p.qu", b="e.eu")
    return f"""
    WITH ev AS (
      SELECT label, vec_id, d,
             CAST(floor(embedding[d] * {QUANT} + 0.5) AS BIGINT) AS eq
      FROM embeddings, generate_series(1, {dim}) g(d)
    ),
    cent AS (
      SELECT label, d, CAST(SUM(eq) AS DOUBLE) / COUNT(*) AS c
      FROM ev GROUP BY label, d
    ),
    centv AS (
      SELECT label, {unit.format(v="list(c ORDER BY d)")} AS cu
      FROM cent GROUP BY label
    ),
    eqv AS (
      SELECT vec_id, label,
             {unit.format(v="list(CAST(eq AS DOUBLE) ORDER BY d)")} AS eu
      FROM ev GROUP BY vec_id, label
    ),
    q AS (SELECT vec_id AS qid, eu AS qu FROM eqv WHERE vec_id < {N_QUERIES}),
    probes AS (
      SELECT qid, qu, label FROM (
        SELECT q.qid, q.qu, c.label,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                                  ORDER BY {dotc} DESC, c.label) AS prk
        FROM q, centv c
      ) WHERE prk <= {IVF_NPROBE}
    )
    SELECT qid, neighbor_id, rk FROM (
      SELECT p.qid, e.vec_id AS neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY p.qid
                                     ORDER BY {dote} DESC, e.vec_id) AS INT) AS rk
      FROM probes p JOIN eqv e USING (label)
      WHERE e.vec_id != p.qid
    ) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """


@register(
    "q_ann_ivf",
    _ivf_oracle_sql(),
    doc="IVF over scalar-quantized vectors: per-label centroids as the "
    "coarse quantizer, probe the nprobe=2 nearest clusters only - the "
    "inverted-list scan is a semi-join, not O(n^2). floor-quantization "
    "(the scalar-quantization trick) makes centroid sums exact int64 and "
    "every cosine a portable sequential fold, so even this approximate "
    "path is fully value-checked against DuckDB.",
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dot, normalized

    # quantize once, normalize once, and cut projection collapse with
    # barriers (same discipline as q_ann_lsh_bucketed - the fold-per-pair
    # form re-inlines the 64-dim transforms into every reference).
    eq = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * QUANT + 0.5).cast("double")
    )
    embq = (
        tp(spark, sf_dir, "embeddings")
        .select("vec_id", "label", eq.alias("eq"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", "label", normalized(F.col("eq")).alias("eu"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # "train": one pass, map-side partial INTEGER sums (exact, order-free)
    embq_raw = (
        tp(spark, sf_dir, "embeddings")
        .select("label", eq.alias("eq"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    cent = embq_raw.groupBy("label").agg(
        *[
            (
                F.sum(F.element_at("eq", d + 1).cast("long")).cast("double")
                / F.count("*")
            ).alias(f"c{d}")
            for d in range(64)
        ]
    )
    centroids = cent.select(
        "label", normalized(F.array(*[f"c{d}" for d in range(64)])).alias("cu")
    ).repartition(1)
    queries = embq.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("eu").alias("qu")
    )
    wprobe = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("label"))
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(centroids))
        .withColumn("csim", dot(F.col("qu"), F.col("cu")))
        .withColumn("prk", F.row_number().over(wprobe))
        .where(F.col("prk") <= IVF_NPROBE)
        .select("qid", "qu", "label")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        F.broadcast(probes)
        .join(embq, "label")
        .where(F.col("vec_id") != F.col("qid"))
        .withColumn("sim", dot(F.col("qu"), F.col("eu")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("qid", F.col("vec_id").alias("neighbor_id"), F.col("rk").cast("int").alias("rk"))
        .orderBy("qid", "rk")
    )


# --------------------------------------------------------------------------
# Embedding int8 quantization
# --------------------------------------------------------------------------
#
# Per-vector symmetric int8 quantization — the storage/bandwidth lever for
# embedding tables at 100 TB (4x smaller than float32, and int8 dot
# products are what IVF/PQ-style ANN engines score with). scale =
# max(|x|)/127 per vector; code_i = floor(x_i/scale + 0.5) in [-127, 127].
# Pure Catalyst HOFs — no Python, no shuffle; the quantization is a
# projection that runs at scan speed.
#
# Engine portability: floor(x + 0.5) instead of round() (Spark HALF_UP vs
# DuckDB half-even would diverge on exact halves), and the float32 inputs
# are cast to double on BOTH sides before any arithmetic, so every
# division is the same IEEE op in Spark and DuckDB. The exported scale is
# quantized to micro-units (floor(scale*2^20 + 0.5), exact int64) per the
# repo's float-portability convention.


def quantize_int8(vec: Column | str) -> Column:
    """array<float> -> struct(scale double, codes array<int>).

    An all-zero vector has scale 0; x/scale would be NULL-producing
    division-by-zero, so zero-scale short-circuits to all-zero codes
    (defined output for degenerate input — ADVICE r04 item 3)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    dv = F.transform(v, lambda x: x.cast("double"))
    scale = F.array_max(F.transform(dv, F.abs)) / F.lit(127.0)
    codes = F.when(
        scale == F.lit(0.0), F.transform(dv, lambda x: F.lit(0).cast("int"))
    ).otherwise(
        F.transform(dv, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    )
    return F.struct(scale.alias("scale"), codes.alias("codes"))


@register(
    "q_embedding_quantize",
    """
    WITH q AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS scale,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) /
                    (list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) / 127.0)
                    + 0.5) AS INTEGER)) AS codes
      FROM embeddings
    )
    SELECT vec_id,
           CAST(floor(scale * 1048576 + 0.5) AS BIGINT) AS scale_q20,
           CAST(list_max(codes) AS INTEGER) AS max_code,
           CAST(list_min(codes) AS INTEGER) AS min_code,
           CAST(list_sum(codes) AS BIGINT) AS code_sum
    FROM q ORDER BY vec_id
    """,
    doc="per-vector symmetric int8 quantization of the embedding column: "
    "scale = max|x|/127, codes = floor(x/scale + 0.5); exported as exact "
    "integers (micro-unit scale, code extrema/sum) for the oracle hash.",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", quantize_int8("embedding").alias("q"))
    return q.select(
        "vec_id",
        F.floor(F.col("q.scale") * F.lit(1048576.0) + F.lit(0.5))
        .cast("bigint")
        .alias("scale_q20"),
        F.array_max("q.codes").cast("int").alias("max_code"),
        F.array_min("q.codes").cast("int").alias("min_code"),
        F.aggregate(
            "q.codes", F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("code_sum"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# ANN recall evaluation
# --------------------------------------------------------------------------
#
# The metric every ANN deployment tracks: recall@k of the approximate path
# against exact brute force. Operationally this runs on a sampled query set
# whenever the index is rebuilt (new corpus snapshot, new hyperplanes) —
# a regression gate for the retrieval layer, exactly like the correctness
# oracles are for the queries. Both inputs here are themselves
# value-checked operators, so the recall numbers are engine-portable and
# get a full oracle too (the oracle recomputes both methods in SQL).


def ann_recall_at_k(exact: DataFrame, approx: DataFrame, k: int = TOPK) -> DataFrame:
    """(qid, n_hits, recall) from two (qid, neighbor_id, rk<=k) top-k sets."""
    hits = (
        exact.select("qid", "neighbor_id")
        .join(approx.select("qid", "neighbor_id"), ["qid", "neighbor_id"])
        .groupBy("qid")
        .agg(F.count("*").alias("n_hits"))
    )
    base = exact.groupBy("qid").agg(F.count("*").alias("n_exact"))
    return (
        base.join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_hits", F.lit(0)).cast("int").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) / F.col("n_exact")).alias("recall"),
        )
    )


def _recall_oracle_sql() -> str:
    dot_b = _SQL_SEQ_DOT.format(a="q.embedding", b="c.embedding")
    norm_q = _SQL_NORM.format(v="q.embedding")
    norm_c = _SQL_NORM.format(v="c.embedding")
    dot_l = _SQL_SEQ_DOT.format(a="lq.qe", b="lc.ue")
    return f"""
    WITH {_sql_bucket_ctes()},
    exact_sims AS (
      SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
             {dot_b} / ({norm_q} * {norm_c}) AS sim
      FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}) q
      JOIN embeddings c ON c.vec_id != q.vec_id
    ),
    exact_topk AS (
      SELECT qid, neighbor_id FROM (
        SELECT qid, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rk
        FROM exact_sims
      ) WHERE rk <= {TOPK}
    ),
    lb AS (SELECT e.vec_id, {_SQL_UNIT} AS ue, bk.bucket
           FROM embeddings e JOIN buckets bk USING (vec_id)),
    lsh_cand AS (
      SELECT lq.vec_id AS qid, lc.vec_id AS neighbor_id, {dot_l} AS sim
      FROM (SELECT vec_id, ue, bucket FROM lb WHERE vec_id < {N_QUERIES}) lq(vec_id, qe, qb)
      JOIN lb lc ON lc.bucket = lq.qb AND lc.vec_id != lq.vec_id
    ),
    lsh_topk AS (
      SELECT qid, neighbor_id FROM (
        SELECT qid, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rk
        FROM lsh_cand
      ) WHERE rk <= {TOPK}
    )
    SELECT e.qid,
           CAST(COUNT(l.neighbor_id) AS INTEGER) AS n_hits,
           COUNT(l.neighbor_id) / CAST(COUNT(*) AS DOUBLE) AS recall
    FROM exact_topk e
    LEFT JOIN lsh_topk l ON e.qid = l.qid AND e.neighbor_id = l.neighbor_id
    GROUP BY e.qid ORDER BY e.qid
    """


@register(
    "q_ann_recall_lsh",
    _recall_oracle_sql(),
    doc="ANN regression gate: recall@k of the LSH-bucketed path against "
    "exact brute force, per query — both inputs are the value-checked "
    "operators above, so the recall itself is oracle-exact.",
)
def q_ann_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = q_ann_bruteforce_topk(spark, sf_dir)
    approx = q_ann_lsh_bucketed(spark, sf_dir)
    return ann_recall_at_k(exact, approx).orderBy("qid")


# --------------------------------------------------------------------------
# Persisted ANN index: the LSH bucket index as a DURABLE artifact.
#
# At 100 TB the index build (normalize + bucket every vector) is the
# expensive pass; probes are cheap. Production ANN therefore builds the
# index once, persists it partitioned BY BUCKET, and amortizes it across
# every probe job — rebuild only on corpus change. Partitioning the index
# by bucket also means a probe whose query buckets are known touches only
# those directories (partition pruning), the storage-layout analogue of
# the in-memory bucket join.
#
# The registered query round-trips exactly that: write (vec_id, ue,
# bucket) parquet partitioned by bucket, reload, probe. Results are
# identical to q_ann_lsh_bucketed, so it shares that query's oracle.
# --------------------------------------------------------------------------

_lsh_index_paths: dict[tuple[int, str], str] = {}


def lsh_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session+fixture) the persisted LSH index; return its
    path. Layout: parquet partitioned by `bucket`, rows (vec_id, label,
    ue). `label` rides in the index payload — the filtered-ANN pattern
    (store the filterable attributes next to the vectors so probes with
    an attribute predicate, e.g. hard-negative mining's label<>anchor,
    never join back to the base table). The work_dir name embeds the
    fixture tag so two fixtures in one session get distinct paths
    (work_dir clears on entry)."""
    import re

    from .dedup import normalized

    key = (session_key(spark), sf_dir)
    if key not in _lsh_index_paths:
        path = work_dir("lsh_index_" + re.sub(r"\W+", "_", sf_dir))
        (
            lsh_bucket(tp(spark, sf_dir, "embeddings"), 64)
            .select(
                "vec_id",
                "label",
                normalized(F.col("embedding")).alias("ue"),
                "bucket",
            )
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(path)
        )
        _lsh_index_paths[key] = path
    return _lsh_index_paths[key]


@register(
    "q_ann_lsh_persisted",
    _lsh_oracle_sql(),
    doc="ANN over a PERSISTED LSH index: the bucket index written once as "
    "parquet partitioned by bucket (the durable, amortized-build artifact "
    "a production ANN service reads), reloaded and probed; results — and "
    "oracle — identical to the in-memory q_ann_lsh_bucketed.",
)
def q_ann_lsh_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dot

    idx = spark.read.parquet(lsh_index_path(spark, sf_dir))
    queries = idx.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("ue").alias("qe"),
        F.col("bucket").alias("qb"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        F.broadcast(queries)
        .join(idx, (F.col("qb") == F.col("bucket")) & (F.col("vec_id") != F.col("qid")))
        .withColumn("sim", dot(F.col("qe"), F.col("ue")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select(
            "qid", F.col("vec_id").alias("neighbor_id"), F.col("rk").cast("int").alias("rk")
        )
        .orderBy("qid", "rk")
    )


# --------------------------------------------------------------------------
# Semantic k-means clustering (SemDeDup-style): LEARN the cluster
# structure of the embedding space — unlike IVF above, whose coarse
# quantizer piggybacks on given labels. The cluster assignment is what
# semantic dedup/pruning acts on (keep one representative per tight
# cluster, drop the rest).
#
# Determinism contract (what makes an ITERATIVE float algorithm fully
# value-checkable against DuckDB):
#   * vectors scalar-quantized to exact ints (floor(x*2^20+0.5)) before
#     anything else — centroid numerators are exact int64 sums, so the
#     per-dim mean is ONE double division of identical ints;
#   * every dot/norm is a sequential fold (F.aggregate <-> list_reduce,
#     bit-identical on identical inputs);
#   * argmax ties break on cluster id; init = the K smallest vec_ids.
#
# Scale design (100 TB of embeddings, 1000 executors): the classic Lloyd
# loop — per iteration, broadcast the KxD centroid table (KB-sized),
# assign map-side (n·K folds), update with ONE shuffle of per-cluster
# partial sums. The driver orchestrates ITERS bounded rounds and collects
# exactly K rows per round (the repo's bounded-collect contract) — no
# lineage growth, no driver data path. K scales to tens of thousands
# before the broadcast is even MBs.
# --------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_DIM = 64


def _sql_unit(v: str) -> str:
    return "list_transform({v}, x -> x / ".format(v=v) + _SQL_NORM.format(v=v) + ")"


def _kmeans_oracle_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """Unrolled Lloyd iterations as a CTE chain (generated, not hand-kept)."""
    dot0 = _SQL_SEQ_DOT.format(a="v.vu", b="c.cu")
    ctes = [
        f"""ev AS (
      SELECT vec_id, d,
             CAST(floor(embedding[d] * {QUANT} + 0.5) AS BIGINT) AS eq
      FROM embeddings, generate_series(1, {KMEANS_DIM}) g(d)
    )""",
        f"""vu AS (
      SELECT vec_id, {_sql_unit("list(CAST(eq AS DOUBLE) ORDER BY d)")} AS vu
      FROM ev GROUP BY vec_id
    )""",
        f"""c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             vu AS cu
      FROM vu ORDER BY vec_id LIMIT {k}
    )""",
    ]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        ctes.append(
            f"""a{i} AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {dot0} DESC, c.cid) AS rk
        FROM vu v, {prev} c
      ) WHERE rk = 1
    )"""
        )
        ctes.append(
            f"""m{i} AS (
      SELECT a.cid, ev.d, CAST(SUM(ev.eq) AS DOUBLE) / COUNT(*) AS c
      FROM ev JOIN a{i} a USING (vec_id) GROUP BY a.cid, ev.d
    )"""
        )
        ctes.append(
            f"""c{i} AS (
      SELECT cid, {_sql_unit("list(c ORDER BY d)")} AS cu
      FROM m{i} GROUP BY cid
    )"""
        )
    ctes.append(
        f"""afinal AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {dot0} DESC, c.cid) AS rk
        FROM vu v, c{iters} c
      ) WHERE rk = 1
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT cid, COUNT(*) AS n_vectors, CAST(SUM(vec_id) AS BIGINT) AS id_sum
    FROM afinal GROUP BY cid ORDER BY cid
    """
    )


def _kmeans_best_struct(cents: list) -> Column:
    """struct(sim, negcid) of the nearest (max-cosine) centroid for the
    `vu` column, ties to lowest cid — the argmax as ONE stateless
    projection over centroid LITERALS (the q_stream_kmeans_assign shape,
    whose equivalence to the window form is driver-checked against the
    same oracle). The r16 form crossJoined a broadcast centroid table and
    ranked with a per-vec_id window — an n·K-row exchange PER Lloyd round
    that at 100 TB shuffles K× the corpus for what is a map-side argmax
    (guide §2.4: remove shuffles outright). Sims are the identical
    sequential zip_with/aggregate fold, so the chosen cid is bit-for-bit
    the window result; array_max's struct ordering is (sim, negcid) —
    max sim, ties to the LOWEST cid, matching ORDER BY sim DESC, cid."""
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(-cid).alias("negcid"),
                F.array(*[F.lit(float(v)) for v in cu]).alias("cu"),
            )
            for cid, cu in cents
        ]
    )
    sims = F.transform(
        cent_lit,
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(F.col("vu"), c["cu"], lambda a, b: a * b),
                F.lit(0.0),
                lambda a, v: a + v,
            ).alias("sim"),
            c["negcid"].alias("negcid"),
        ),
    )
    return F.array_max(sims)


def kmeans_assign(emb: DataFrame, cents: list) -> DataFrame:
    """(vec_id, cid): nearest (max-cosine) centroid, ties to lowest cid.
    Pure projection — no join, no window (see _kmeans_best_struct)."""
    if not cents:
        return emb.select("vec_id", F.lit(0).alias("cid")).where(F.lit(False))
    return emb.select(
        "vec_id", (-_kmeans_best_struct(cents)["negcid"]).cast("int").alias("cid")
    )


def _kmeans_loop(
    spark: SparkSession,
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> tuple[DataFrame, list]:
    """Shared Lloyd loop: returns (vecs, final centroid rows) where vecs is
    the persisted (vec_id, eq, vu) table and centroids are `k` (cid, cu)
    tuples. Both the clustering query and the dedup-apply step build on
    this so the loop runs once per caller, never twice."""
    eq = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * QUANT + 0.5).cast("double")
    )
    # quantize once behind ONE barrier (the IVF discipline: projection
    # collapse would re-inline the 64-dim transform into every reference
    # otherwise). Above the exchange, `eq` is a materialized column, so
    # normalized() references a column read — no re-inlining — and the
    # r16 second repartition was a redundant second shuffle (guide §2.4).
    base = (
        emb.select("vec_id", eq.alias("eq"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    from .dedup import normalized

    vecs = base.select("vec_id", "eq", normalized(F.col("eq")).alias("vu"))
    # DISK_ONLY like the module's other array-heavy persists: every Lloyd
    # round reads vecs twice (assign + update); on-heap caching of the
    # n x 2*dim double arrays would tax unrelated queries with GC pressure
    from pyspark.storagelevel import StorageLevel

    vecs = vecs.persist(StorageLevel.DISK_ONLY)

    init = vecs.orderBy("vec_id").limit(k).collect()  # bounded: k rows
    cents = [(j, list(r["vu"])) for j, r in enumerate(init)]

    dims = range(KMEANS_DIM)
    for _ in range(iters):
        if not cents:  # empty corpus: nothing to assign or update
            break
        # assignment is a PROJECTION on vecs (no crossJoin, no window, no
        # join-back): each round is one scan + one |K|-row shuffle
        means = (
            vecs.withColumn(
                "cid", (-_kmeans_best_struct(cents)["negcid"]).cast("int")
            )
            .groupBy("cid")
            .agg(
                *[
                    (
                        F.sum(F.element_at("eq", d + 1).cast("long")).cast("double")
                        / F.count("*")
                    ).alias(f"c{d}")
                    for d in dims
                ]
            )
        )
        new_cents = means.select(
            "cid", normalized(F.array(*[f"c{d}" for d in dims])).alias("cu")
        ).collect()  # bounded: <= k rows
        cents = sorted((r["cid"], list(r["cu"])) for r in new_cents)
    return vecs, cents


def semantic_kmeans(
    spark: SparkSession,
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """(vec_id, cid) after `iters` Lloyd rounds. emb: (vec_id, embedding)."""
    vecs, cents = _kmeans_loop(spark, emb, k, iters)
    return kmeans_assign(vecs, cents)


@register(
    "q_semantic_kmeans",
    _kmeans_oracle_sql(),
    headline=True,
    doc="semantic clustering (SemDeDup-style): deterministic spherical "
    "k-means over scalar-quantized embeddings — K-smallest-id init, 2 "
    "Lloyd rounds of broadcast-assign + one-shuffle integer-exact "
    "centroid update, cluster membership fully value-checked against the "
    "unrolled SQL iteration.",
)
def q_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = semantic_kmeans(spark, emb)
    return (
        out.groupBy("cid")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum("vec_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("cid")
    )


# --------------------------------------------------------------------------
# Semantic dedup APPLY: the action the clusters exist for — keep ONE
# representative per cluster (the member most similar to its centroid,
# ties to lowest vec_id), drop the rest. SemDeDup prunes tight semantic
# clusters this way; at a 100 TB corpus the keep-set is |clusters| rows
# and the drop decision is a per-row argmax inside an already-shuffled
# group — no new join shape beyond the k-means loop itself.
# --------------------------------------------------------------------------


def _kmeans_apply_oracle_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    base = _kmeans_oracle_sql(k, iters)
    # swap the final SELECT for a per-cluster representative ranking
    head, _, _ = base.rpartition("SELECT cid, COUNT(*) AS n_vectors")
    dotf = _SQL_SEQ_DOT.format(a="v.vu", b="c.cu")
    return (
        head
        + f"""SELECT cid, CAST(n_vectors AS BIGINT) AS n_vectors,
           keeper_id, CAST(sim_q20 AS BIGINT) AS sim_q20
    FROM (
      SELECT a.cid,
             COUNT(*) OVER (PARTITION BY a.cid) AS n_vectors,
             v.vec_id AS keeper_id,
             CAST(floor({dotf} * 1048576.0 + 0.5) AS BIGINT) AS sim_q20,
             ROW_NUMBER() OVER (PARTITION BY a.cid
                                ORDER BY {dotf} DESC, v.vec_id) AS rk
      FROM afinal a
      JOIN vu v USING (vec_id)
      JOIN c{iters} c ON a.cid = c.cid
    ) WHERE rk = 1
    ORDER BY cid
    """
    )


@register(
    "q_semantic_dedup_apply",
    _kmeans_apply_oracle_sql(),
    doc="SemDeDup apply step: one representative per k-means cluster (the "
    "member most similar to its final centroid, ties to lowest id); "
    "output is (cluster, size, keeper, Q20 centroid-similarity) — the "
    "keep-list a semantic pruner would LEFT ANTI against the corpus.",
)
def q_semantic_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vecs, cents = _kmeans_loop(spark, emb)  # ONE loop: assignment + centroids
    if not cents:  # empty corpus: no clusters, no representatives
        return spark.createDataFrame(
            [], "cid int, n_vectors bigint, keeper_id long, sim_q20 bigint"
        )
    # cid AND its sim come from the SAME argmax projection — the two
    # join-backs (assignment->vu, assignment->centroid) the r16 form paid
    # to recompute dot(vu, cu) are gone; sim is the identical fold value.
    best = _kmeans_best_struct(cents)
    w = Window.partitionBy("cid").orderBy(F.desc("sim"), F.asc("vec_id"))
    scored = vecs.select(
        "vec_id",
        (-best["negcid"]).cast("int").alias("cid"),
        best["sim"].alias("sim"),
    )
    return (
        scored.withColumn("n_vectors", F.count("*").over(Window.partitionBy("cid")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "cid",
            F.col("n_vectors").cast("bigint").alias("n_vectors"),
            F.col("vec_id").alias("keeper_id"),
            F.floor(F.col("sim") * F.lit(1048576.0) + F.lit(0.5))
            .cast("bigint")
            .alias("sim_q20"),
        )
        .orderBy("cid")
    )


# --------------------------------------------------------------------------
# Vector-store maintenance: per-dimension moments of the embedding
# column. The read-out every embedding pipeline runs before indexing —
# dead dimensions (zero variance) mean a broken encoder export,
# off-center means bias the quantizer, and per-dim min/max feed scalar
# quantization (int8) calibration. One corpus scan, posexplode to
# (dim, value), one |dims|-key shuffle; every moment is an exact int64
# sum of Q20/Q40-quantized values, so engines agree bit-for-bit (the
# repo-wide answer to float-summation order).
# --------------------------------------------------------------------------


@register(
    "q_embedding_dim_stats",
    """
    WITH x AS (
      SELECT unnest(range(len(embedding))) AS dim,
             unnest(embedding) AS v
      FROM embeddings
    ),
    q AS (SELECT dim,
                 CAST(floor(CAST(v AS DOUBLE) * 1048576.0 + 0.5)
                      AS BIGINT) AS vq,
                 CAST(floor(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                            * 1099511627776.0 + 0.5) AS BIGINT) AS vq2
          FROM x)
    SELECT CAST(dim AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(vq) AS BIGINT) AS sum_q20,
           CAST(MIN(vq) AS BIGINT) AS min_q20,
           CAST(MAX(vq) AS BIGINT) AS max_q20,
           CAST(SUM(vq2) AS BIGINT) AS sumsq_q40
    FROM q GROUP BY dim ORDER BY dim
    """,
    doc="per-dimension embedding moments (count, Q20 sum/min/max, Q40 "
    "sum of squares — mean and variance derive exactly): posexplode to "
    "(dim, value), one |dims|-key shuffle, integer-exact reductions; "
    "the scalar-quantization calibration pass of a vector store.",
)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings")
    x = emb.select(F.posexplode("embedding").alias("dim", "v"))
    v = F.col("v").cast("double")
    q = x.select(
        "dim",
        F.floor(v * F.lit(1048576.0) + F.lit(0.5)).cast("bigint").alias("vq"),
        F.floor(v * v * F.lit(1099511627776.0) + F.lit(0.5))
        .cast("bigint")
        .alias("vq2"),
    )
    return (
        q.groupBy(F.col("dim").cast("int").alias("dim"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("vq").cast("bigint").alias("sum_q20"),
            F.min("vq").cast("bigint").alias("min_q20"),
            F.max("vq").cast("bigint").alias("max_q20"),
            F.sum("vq2").cast("bigint").alias("sumsq_q40"),
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# Hard-negative mining for embedding/contrastive training: for each
# anchor vector, the most similar vector with a DIFFERENT label — the
# negatives that actually move a contrastive loss (random negatives are
# trivially separable; the hardest in-batch negative per anchor is the
# standard curriculum, e.g. DPR/SimCSE practice).
#
# Scale shape: anchors are a bounded slice (vec_id % ANCHOR_MOD), ride
# broadcast into a nested-loop join against ONE corpus scan (|corpus| ×
# |anchors| fan-out with |anchors| small — the same shape as the ANN
# brute-force baseline); the per-anchor arg-max is a window over the
# anchor key. Similarities are Q20-quantized BEFORE ranking so the
# rank order is integer-deterministic in both engines.
# --------------------------------------------------------------------------

HARD_NEG_ANCHOR_MOD = 50  # anchors = vec_id % 50 == 0 (2% of the corpus)

from .dedup import _SQL_NORMALIZED as _DEDUP_SQL_NORMALIZED  # noqa: E402
from .dedup import _SQL_SEQ_DOT as _DEDUP_SQL_SEQ_DOT  # noqa: E402

_SQL_NORMALIZED_EMB = _DEDUP_SQL_NORMALIZED.format(v="embedding")
_SQL_SEQ_DOT_AB = _DEDUP_SQL_SEQ_DOT.format(a="a.ue", b="b.ue")


@register(
    "q_hard_negative_mining",
    f"""
    WITH u AS (
      SELECT vec_id, label,
             {_SQL_NORMALIZED_EMB} AS ue
      FROM embeddings
    ),
    a AS (SELECT * FROM u WHERE vec_id % {HARD_NEG_ANCHOR_MOD} = 0),
    c AS (SELECT a.vec_id AS anchor_id, b.vec_id AS cand_id,
                 CAST(floor({_SQL_SEQ_DOT_AB} * 1048576.0 + 0.5) AS BIGINT) AS cos_q20
          FROM a JOIN u b ON a.label <> b.label),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                       ORDER BY cos_q20 DESC, cand_id) AS rk
          FROM c)
    SELECT anchor_id, cand_id AS negative_id, cos_q20
    FROM r WHERE rk = 1 ORDER BY anchor_id
    """,
    doc="hard-negative mining: per anchor (a bounded vec_id slice), the "
    "highest-cosine vector with a different label; broadcast anchors × "
    "one corpus scan, Q20-quantized before the per-anchor arg-max "
    "window so ranking is integer-deterministic.",
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dot, normalized

    emb = tp(spark, sf_dir, "embeddings").select(
        "vec_id", "label", normalized(F.col("embedding")).alias("ue")
    )
    anchors = emb.where(F.col("vec_id") % HARD_NEG_ANCHOR_MOD == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("ue").alias("ua"),
    )
    cand = emb.join(
        F.broadcast(anchors), F.col("label") != F.col("a_label"), "inner"
    ).select(
        "anchor_id",
        F.col("vec_id").alias("cand_id"),
        F.floor(dot(F.col("ua"), F.col("ue")) * F.lit(1048576.0) + F.lit(0.5))
        .cast("bigint")
        .alias("cos_q20"),
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos_q20"), "cand_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("anchor_id", F.col("cand_id").alias("negative_id"), "cos_q20")
        .orderBy("anchor_id")
    )


# --------------------------------------------------------------------------
# Hard-negative mining, ANN-probed — the 100 TB route for the operator
# above (VERDICT r07 "what's wrong" 3): the exact miner broadcasts a
# PROPORTIONAL anchor slice (vec_id % 50 = 2% of the corpus) against one
# full scan, which stops being broadcastable exactly when the corpus gets
# big. Here the anchors instead probe the PERSISTED LSH index
# (lsh_index_path above): an equi-join on the bucket key — shuffle-hash
# co-location, no broadcast of anything proportional — and the label
# filter rides on the index payload (filtered ANN), so candidates per
# anchor are its bucket's occupants, not the corpus. Similarity cost
# drops from |anchors|·|corpus| folds to the bucket-collision count.
#
# The query reports the ANN pick NEXT TO the exact pick per anchor
# (regret-style read-out, the q_ann_recall_lsh pattern): `hit` = the
# probed negative is exactly as hard as the true hardest. At fixture
# scale the exact leg doubles as full verification; at 100 TB the exact
# leg is dropped and `hit`-rate is monitored on a sampled anchor slice.
# Fully value-checked: bucket assignment is exact int64 arithmetic and
# similarities are Q20-quantized before every arg-max.
# --------------------------------------------------------------------------


def _hard_negative_ann_oracle() -> str:
    dot_ab = _DEDUP_SQL_SEQ_DOT.format(a="a.ue", b="b.ue")
    return f"""
    WITH {_sql_bucket_ctes()},
    u AS (SELECT e.vec_id, e.label, {_SQL_UNIT} AS ue, bk.bucket
          FROM embeddings e JOIN buckets bk USING (vec_id)),
    a AS (SELECT * FROM u WHERE vec_id % {HARD_NEG_ANCHOR_MOD} = 0),
    ec AS (SELECT a.vec_id AS anchor_id, b.vec_id AS cand_id,
                  CAST(floor({dot_ab} * 1048576.0 + 0.5) AS BIGINT) AS cos_q20
           FROM a JOIN u b ON a.label <> b.label),
    e1 AS (SELECT anchor_id, cand_id, cos_q20,
                  ROW_NUMBER() OVER (PARTITION BY anchor_id
                                     ORDER BY cos_q20 DESC, cand_id) AS rk
           FROM ec),
    ex AS (SELECT anchor_id, cos_q20 AS exact_cos_q20 FROM e1 WHERE rk = 1),
    ac AS (SELECT a.vec_id AS anchor_id, b.vec_id AS cand_id,
                  CAST(floor({dot_ab} * 1048576.0 + 0.5) AS BIGINT) AS cos_q20
           FROM a JOIN u b ON b.bucket = a.bucket AND a.label <> b.label),
    a1 AS (SELECT anchor_id, cand_id, cos_q20,
                  ROW_NUMBER() OVER (PARTITION BY anchor_id
                                     ORDER BY cos_q20 DESC, cand_id) AS rk
           FROM ac),
    an AS (SELECT anchor_id, cand_id AS ann_negative_id,
                  cos_q20 AS ann_cos_q20
           FROM a1 WHERE rk = 1)
    SELECT ex.anchor_id, an.ann_negative_id, an.ann_cos_q20,
           ex.exact_cos_q20,
           CAST(CASE WHEN an.ann_cos_q20 = ex.exact_cos_q20
                     THEN 1 ELSE 0 END AS INTEGER) AS hit
    FROM ex LEFT JOIN an ON an.anchor_id = ex.anchor_id
    ORDER BY ex.anchor_id
    """


@register(
    "q_hard_negative_ann",
    _hard_negative_ann_oracle(),
    doc="hard-negative mining via the persisted LSH index: anchors "
    "equi-join their own bucket (label filter on the index payload — "
    "filtered ANN; no proportional broadcast, no full similarity scan) "
    "and the probed hardest negative is reported next to the exact one "
    "with a hit flag — the recall read-out that makes the approximate "
    "path monitorable; Q20-quantized before every arg-max.",
)
def q_hard_negative_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dot

    idx = spark.read.parquet(lsh_index_path(spark, sf_dir))
    anchors = idx.where(F.col("vec_id") % HARD_NEG_ANCHOR_MOD == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("ue").alias("ua"),
        F.col("bucket").alias("ab"),
    )
    cand = anchors.join(
        idx,
        (F.col("bucket") == F.col("ab")) & (F.col("label") != F.col("a_label")),
    ).select(
        "anchor_id",
        F.col("vec_id").alias("cand_id"),
        F.floor(dot(F.col("ua"), F.col("ue")) * F.lit(1048576.0) + F.lit(0.5))
        .cast("bigint")
        .alias("cos_q20"),
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos_q20"), "cand_id")
    ann = (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("ann_negative_id"),
            F.col("cos_q20").alias("ann_cos_q20"),
        )
    )
    exact = q_hard_negative_mining(spark, sf_dir).select(
        "anchor_id", F.col("cos_q20").alias("exact_cos_q20")
    )
    return (
        exact.join(ann, "anchor_id", "left")
        .select(
            "anchor_id",
            "ann_negative_id",
            "ann_cos_q20",
            "exact_cos_q20",
            F.when(F.col("ann_cos_q20") == F.col("exact_cos_q20"), 1)
            .otherwise(0)
            .cast("int")
            .alias("hit"),
        )
        .orderBy("anchor_id")
    )


HARD_NEG_SAMPLE_N = 32  # fixed-N exact-leg sample, NOT proportional


def _hard_negative_sampled_oracle() -> str:
    dot_ab = _DEDUP_SQL_SEQ_DOT.format(a="a.ue", b="b.ue")
    return f"""
    WITH {_sql_bucket_ctes()},
    u AS (SELECT e.vec_id, e.label, {_SQL_UNIT} AS ue, bk.bucket
          FROM embeddings e JOIN buckets bk USING (vec_id)),
    a0 AS (SELECT * FROM u WHERE vec_id % {HARD_NEG_ANCHOR_MOD} = 0),
    a AS (SELECT * FROM a0
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {HARD_NEG_SAMPLE_N}),
    ec AS (SELECT a.vec_id AS anchor_id, b.vec_id AS cand_id,
                  CAST(floor({dot_ab} * 1048576.0 + 0.5) AS BIGINT) AS cos_q20
           FROM a JOIN u b ON a.label <> b.label),
    e1 AS (SELECT anchor_id, cand_id, cos_q20,
                  ROW_NUMBER() OVER (PARTITION BY anchor_id
                                     ORDER BY cos_q20 DESC, cand_id) AS rk
           FROM ec),
    ex AS (SELECT anchor_id, cos_q20 AS exact_cos_q20 FROM e1 WHERE rk = 1),
    ac AS (SELECT a.vec_id AS anchor_id, b.vec_id AS cand_id,
                  CAST(floor({dot_ab} * 1048576.0 + 0.5) AS BIGINT) AS cos_q20
           FROM a JOIN u b ON b.bucket = a.bucket AND a.label <> b.label),
    a1 AS (SELECT anchor_id, cand_id, cos_q20,
                  ROW_NUMBER() OVER (PARTITION BY anchor_id
                                     ORDER BY cos_q20 DESC, cand_id) AS rk
           FROM ac),
    an AS (SELECT anchor_id, cand_id AS ann_negative_id,
                  cos_q20 AS ann_cos_q20
           FROM a1 WHERE rk = 1)
    SELECT ex.anchor_id, an.ann_negative_id, an.ann_cos_q20,
           ex.exact_cos_q20,
           CAST(CASE WHEN an.ann_cos_q20 = ex.exact_cos_q20
                     THEN 1 ELSE 0 END AS INTEGER) AS hit
    FROM ex LEFT JOIN an ON an.anchor_id = ex.anchor_id
    ORDER BY ex.anchor_id
    """


@register(
    "q_hard_negative_ann_sampled",
    _hard_negative_sampled_oracle(),
    doc="the 100 TB-shaped hit-rate monitor for ANN hard negatives "
    "(VERDICT r08 'what's wrong' 4): the exact leg runs ONLY on a "
    "FIXED-N anchor sample — bottom-"
    f"{HARD_NEG_SAMPLE_N} by md5(vec_id), a deterministic pseudo-random "
    "draw both engines order identically — taken with orderBy+limit "
    "(TakeOrderedAndProject: distributed partial top-K, no proportional "
    "broadcast, no single-partition window), so the monitoring read-out "
    "itself stays O(N·corpus-scan) with constant N while the production "
    "ANN leg remains the bucket equi-join of q_hard_negative_ann; "
    "Q20-quantized before every arg-max.",
)
def q_hard_negative_ann_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dot, normalized

    idx = spark.read.parquet(lsh_index_path(spark, sf_dir))
    sample = (
        idx.where(F.col("vec_id") % HARD_NEG_ANCHOR_MOD == 0)
        .select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("a_label"),
            F.col("ue").alias("ua"),
            F.col("bucket").alias("ab"),
        )
        .orderBy(F.md5(F.col("anchor_id").cast("string")), "anchor_id")
        .limit(HARD_NEG_SAMPLE_N)
    )
    # ANN leg over the sample: same bucket equi-join as the production
    # miner, restricted to the N monitored anchors.
    ann_cand = sample.join(
        idx,
        (F.col("bucket") == F.col("ab")) & (F.col("label") != F.col("a_label")),
    ).select(
        "anchor_id",
        F.col("vec_id").alias("cand_id"),
        F.floor(dot(F.col("ua"), F.col("ue")) * F.lit(1048576.0) + F.lit(0.5))
        .cast("bigint")
        .alias("cos_q20"),
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos_q20"), "cand_id")
    ann = (
        ann_cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("ann_negative_id"),
            F.col("cos_q20").alias("ann_cos_q20"),
        )
    )
    # Exact leg over the sample ONLY: broadcast of N rows (constant, not
    # proportional to the corpus) against one scan — the bounded audit
    # the proportional q_hard_negative_mining leg is NOT at 100 TB.
    emb = tp(spark, sf_dir, "embeddings").select(
        "vec_id", "label", normalized(F.col("embedding")).alias("ue")
    )
    exact_cand = emb.join(
        F.broadcast(sample.select("anchor_id", "a_label", "ua")),
        F.col("label") != F.col("a_label"),
        "inner",
    ).select(
        "anchor_id",
        F.col("vec_id").alias("cand_id"),
        F.floor(dot(F.col("ua"), F.col("ue")) * F.lit(1048576.0) + F.lit(0.5))
        .cast("bigint")
        .alias("cos_q20"),
    )
    exact = (
        exact_cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("anchor_id", F.col("cos_q20").alias("exact_cos_q20"))
    )
    return (
        exact.join(ann, "anchor_id", "left")
        .select(
            "anchor_id",
            "ann_negative_id",
            "ann_cos_q20",
            "exact_cos_q20",
            F.when(F.col("ann_cos_q20") == F.col("exact_cos_q20"), 1)
            .otherwise(0)
            .cast("int")
            .alias("hit"),
        )
        .orderBy("anchor_id")
    )


# --------------------------------------------------------------------------
# Multiprobe LSH — the recall knob of the persisted index (standard
# practice in production ANN: probe the query's own bucket PLUS the
# buckets at Hamming distance 1 in sign-signature space, i.e. the
# neighbors most likely to hold near-misses of the hyperplane cuts).
# 7 probes (1 + LSH_PLANES) multiply candidate cost by a small constant
# while recovering most of the recall single-bucket probing loses;
# because probe buckets are DISTINCT bucket ids and each candidate lives
# in exactly one bucket, no candidate dedup step is needed. The probe
# remains a bucket-key equi-join against the bucket-partitioned index —
# at scale each probe prunes to its partition directory. Bucket ids are
# exact int64 arithmetic, so the whole path stays fully value-checked.
# --------------------------------------------------------------------------


def _multiprobe_oracle_sql() -> str:
    dot = _SQL_SEQ_DOT.format(a="p.qe", b="c.ue")
    return f"""
    WITH {_sql_bucket_ctes()},
    b AS (SELECT e.vec_id, {_SQL_UNIT} AS ue, bk.bucket
          FROM embeddings e JOIN buckets bk USING (vec_id)),
    q0 AS (SELECT vec_id AS qid, ue AS qe, bucket AS qb
           FROM b WHERE vec_id < {N_QUERIES}),
    probes AS (
      SELECT qid, qe,
             CASE WHEN j = 0 THEN qb ELSE xor(qb, 1 << (j - 1)) END AS pb
      FROM q0, generate_series(0, {LSH_PLANES}) g(j)
    ),
    cand AS (
      SELECT p.qid, c.vec_id AS neighbor_id, {dot} AS sim
      FROM probes p JOIN b c ON c.bucket = p.pb AND c.vec_id != p.qid
    )
    SELECT qid, neighbor_id, rk FROM (
      SELECT qid, neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY sim DESC, neighbor_id) AS INT)
               AS rk
      FROM cand
    ) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """


@register(
    "q_ann_lsh_multiprobe",
    _multiprobe_oracle_sql(),
    doc="multiprobe ANN over the persisted LSH index: each query probes "
    "its own bucket + the 6 Hamming-1 buckets (7 distinct bucket-key "
    "equi-joins' worth of candidates, no dedup needed since buckets "
    "partition the corpus) — the standard recall knob that recovers "
    "near-misses of the hyperplane cuts at a small constant cost; "
    "fully value-checked via exact int64 bucket arithmetic.",
)
def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dot

    idx = spark.read.parquet(lsh_index_path(spark, sf_dir))
    probes = F.array(
        F.col("qb"),
        *[F.col("qb").bitwiseXOR(F.lit(1 << j)) for j in range(LSH_PLANES)],
    )
    queries = (
        idx.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("ue").alias("qe"),
            F.col("bucket").alias("qb"),
        )
        .select("qid", "qe", F.explode(probes).alias("pb"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        F.broadcast(queries)
        .join(
            idx,
            (F.col("pb") == F.col("bucket")) & (F.col("vec_id") != F.col("qid")),
        )
        .withColumn("sim", dot(F.col("qe"), F.col("ue")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("qid", "rk")
    )


# --------------------------------------------------------------------------
# Centroid drift — the embedding-space monitoring read-out: per label, the
# cosine between the centroid of the even-vec_id half and the odd-vec_id
# half of the corpus (in production: yesterday's embeddings vs today's —
# the re-index / re-train alarm for a vector store, the embedding twin of
# the token-level PSI monitor). Exactness discipline: per-dimension
# component sums are Q20-quantized int64 (order-free integer addition), so
# both engines derive bit-identical double means, and the cosine is a
# SEQUENTIAL fold (F.aggregate <-> list_reduce, bit-identical) over those
# identical doubles — the whole float pipeline is hash-checkable.
#
# Scale: posexplode to (label, half, dim) — ONE |labels × 2 × dims|-key
# shuffle with map-side partial sums; the centroid table is tiny, the
# per-label join is broadcast-scale. No driver collect.
# --------------------------------------------------------------------------


def _centroid_drift_oracle() -> str:
    dot_ab = _DEDUP_SQL_SEQ_DOT.format(a="me", b="mo")
    dot_aa = _DEDUP_SQL_SEQ_DOT.format(a="me", b="me")
    dot_bb = _DEDUP_SQL_SEQ_DOT.format(a="mo", b="mo")
    return f"""
    WITH x AS (
      SELECT label, CAST(vec_id % 2 AS INTEGER) AS half,
             unnest(range(len(embedding))) AS dim,
             unnest(embedding) AS v
      FROM embeddings
    ),
    q AS (SELECT label, half, dim,
                 CAST(floor(CAST(v AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT)
                   AS vq
          FROM x),
    s AS (SELECT label, half, dim, SUM(vq) AS sv, COUNT(*) AS n
          FROM q GROUP BY 1, 2, 3),
    a AS (SELECT label, half,
                 list(CAST(sv AS DOUBLE) / (CAST(n AS DOUBLE) * 1048576.0)
                      ORDER BY dim) AS m,
                 MAX(n) AS n
          FROM s GROUP BY 1, 2),
    j AS (SELECT e.label, e.m AS me, o.m AS mo,
                 e.n AS n_even, o.n AS n_odd
          FROM a e JOIN a o ON e.label = o.label
          WHERE e.half = 0 AND o.half = 1)
    SELECT label,
           CAST(n_even AS BIGINT) AS n_even,
           CAST(n_odd AS BIGINT) AS n_odd,
           CAST(floor(({dot_ab}) / (sqrt({dot_aa}) * sqrt({dot_bb}))
                      * 1048576.0 + 0.5) AS BIGINT) AS cos_q20
    FROM j ORDER BY label
    """


@register(
    "q_embedding_centroid_drift",
    _centroid_drift_oracle(),
    doc="per-label centroid cosine between the even- and odd-vec_id "
    "halves of the embedding corpus — the drift monitor that decides "
    "when a vector index or encoder needs refreshing; per-dim Q20 "
    "integer sums (order-free) + sequential-fold cosine keep the float "
    "pipeline bit-identical across engines; one (label, half, dim) "
    "shuffle with map-side combine, broadcast-scale centroid join.",
)
def q_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dot

    emb = tp(spark, sf_dir, "embeddings")
    x = emb.select(
        "label",
        (F.col("vec_id") % 2).cast("int").alias("half"),
        F.posexplode("embedding").alias("dim", "v"),
    )
    s = (
        x.select(
            "label",
            "half",
            "dim",
            F.floor(F.col("v").cast("double") * F.lit(1048576.0) + F.lit(0.5))
            .cast("bigint")
            .alias("vq"),
        )
        .groupBy("label", "half", "dim")
        .agg(F.sum("vq").alias("sv"), F.count("*").alias("n"))
    )
    cent = (
        s.groupBy("label", "half")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "sv"))),
                lambda e: e["sv"],
            ).alias("svs"),
            F.max("n").alias("n"),
        )
        .select(
            "label",
            "half",
            "n",
            F.transform(
                "svs",
                lambda sv: sv.cast("double")
                / (F.col("n").cast("double") * F.lit(1048576.0)),
            ).alias("m"),
        )
    )
    e = cent.where(F.col("half") == 0).select(
        "label", F.col("m").alias("me"), F.col("n").alias("n_even")
    )
    o = cent.where(F.col("half") == 1).select(
        "label", F.col("m").alias("mo"), F.col("n").alias("n_odd")
    )
    me, mo = F.col("me"), F.col("mo")
    cos = dot(me, mo) / (F.sqrt(dot(me, me)) * F.sqrt(dot(mo, mo)))
    return (
        e.join(o, "label")
        .select(
            "label",
            F.col("n_even").cast("bigint").alias("n_even"),
            F.col("n_odd").cast("bigint").alias("n_odd"),
            F.floor(cos * F.lit(1048576.0) + F.lit(0.5))
            .cast("bigint")
            .alias("cos_q20"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Norm-outlier gate — the vector data-quality check run before anything
# enters an ANN index: embeddings whose squared norm deviates > 2 sigma
# from their label's population are flagged (truncated/zeroed/double-
# scaled vectors from a broken encoder batch are exactly the rows that
# poison cosine rankings). The z-test is cleared of divisions and roots
# into exact 128-bit integer arithmetic — the q_events_anomaly_zscore
# discipline — over Q20-quantized squared norms, so both engines
# bit-agree at any corpus size. One scan + one |labels|-row aggregate
# broadcast back; no windows, no driver work.
# --------------------------------------------------------------------------

NORM_OUTLIER_SIGMA_SQ = 4  # flag beyond 2 sigma


def _norm_outlier_oracle() -> str:
    n2 = _DEDUP_SQL_SEQ_DOT.format(a="embedding", b="embedding")
    return f"""
    WITH v AS (SELECT vec_id, label,
                      CAST(floor(({n2}) * 1048576.0 + 0.5) AS BIGINT) AS nq
               FROM embeddings),
    g AS (SELECT label, COUNT(*) AS m, SUM(nq) AS s1, SUM(nq * nq) AS s2
          FROM v GROUP BY label),
    f AS (SELECT v.label, v.nq,
                 (g.m >= 2 AND
                  CAST(v.nq * g.m - g.s1 AS HUGEINT)
                    * (v.nq * g.m - g.s1) * (g.m - 1)
                  > {NORM_OUTLIER_SIGMA_SQ} * CAST(g.m AS HUGEINT)
                    * (CAST(g.m AS HUGEINT) * g.s2
                       - CAST(g.s1 AS HUGEINT) * g.s1))
                   AS is_outlier
          FROM v JOIN g USING (label))
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(MIN(nq) AS BIGINT) AS min_norm2_q20,
           CAST(MAX(nq) AS BIGINT) AS max_norm2_q20
    FROM f GROUP BY label ORDER BY label
    """


@register(
    "q_embedding_norm_outliers",
    _norm_outlier_oracle(),
    doc="embedding norm-outlier gate: per label, vectors whose Q20 "
    "squared norm deviates >2 sigma from the label population are "
    "counted as outliers (the broken-encoder-batch detector run before "
    "indexing); the z-test is division-free exact 128-bit integer "
    "arithmetic (HUGEINT / DECIMAL(38,0)), the norm a sequential fold — "
    "bit-identical cross-engine; one scan + |labels|-row broadcast-back, "
    "no windows.",
)
def q_embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dot

    emb = tp(spark, sf_dir, "embeddings")
    dv = F.transform("embedding", lambda x: x.cast("double"))
    nq = F.floor(dot(dv, dv) * F.lit(1048576.0) + F.lit(0.5)).cast("bigint")
    v = emb.select("vec_id", "label", nq.alias("nq"))
    g = v.groupBy("label").agg(
        F.count("*").alias("m"),
        F.sum("nq").alias("s1"),
        F.sum(F.col("nq") * F.col("nq")).alias("s2"),
    )
    f = v.join(F.broadcast(g), "label").withColumn(
        "is_outlier",
        F.expr(
            "m >= 2 AND "
            "CAST(nq * m - s1 AS DECIMAL(38,0)) * (nq * m - s1) * (m - 1) > "
            f"{NORM_OUTLIER_SIGMA_SQ} * CAST(m AS DECIMAL(38,0)) * "
            "(CAST(m AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)"
        ),
    )
    return (
        f.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.sum(F.when(F.col("is_outlier"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
            F.min("nq").cast("bigint").alias("min_norm2_q20"),
            F.max("nq").cast("bigint").alias("max_norm2_q20"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Random projection (Johnson-Lindenstrauss dimensionality reduction) —
# the standard cheap pre-pass before clustering / LSH / shipping vectors
# to a smaller index: project D dims onto K << D with a fixed +-1 sign
# matrix; pairwise geometry is preserved within 1/sqrt(K) distortion.
# The sign matrix is DERIVED, not stored: sign(i,j) = parity of the
# first md5 hex digit of "i_j" — md5 is bit-identical in Spark, DuckDB,
# and hashlib, so every engine (and every executor, with no broadcast
# of learned state) regenerates the same matrix from the formula alone.
# Elements are Q20-quantized BEFORE the matmul, making the projection an
# exact int64 dot product — order-free, bit-identical cross-engine.
# Shape at 100 TB: the K x D sign matrix is built once on the driver
# (K*D ints, trivially bounded) and closed over by an Arrow-batched
# mapInPandas doing one numpy int64 matmul per batch — one scan, zero
# shuffles, zero Python-per-row.
# --------------------------------------------------------------------------

JL_OUT_DIMS = 8


def _jl_sign_matrix(k: int, d: int):
    """K x D int64 {-1,+1} matrix from the portable md5-parity formula."""
    import hashlib

    import numpy as np

    m = np.empty((k, d), dtype=np.int64)
    for j in range(k):
        for i in range(d):
            digit = hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0]
            m[j, i] = -1 if digit in "13579bdf" else 1
    return m


def random_projection_q20(
    vectors: DataFrame, id_col: str, vec_col: str, k: int = JL_OUT_DIMS
) -> DataFrame:
    """(id, out_dim, proj_q20): exact-integer JL projection of Q20-quantized
    vectors onto k hash-derived +-1 directions."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    d = vectors.select(F.size(vec_col).alias("d")).first()["d"]
    signs = _jl_sign_matrix(k, d)
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("out_dim", IntegerType()),
            StructField("proj_q20", LongType()),
        ]
    )

    def project(batches):
        for pdf in batches:
            e = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            eq = np.floor(e * 1048576.0 + 0.5).astype(np.int64)
            p = eq @ signs.T  # (n, k) exact int64
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), k),
                    "out_dim": np.tile(np.arange(k, dtype=np.int32), n),
                    "proj_q20": p.reshape(-1),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(project, schema)


@register(
    "q_embedding_random_projection",
    f"""
    WITH e AS (
      SELECT vec_id, unnest(range(len(embedding))) AS i,
             unnest(embedding) AS x
      FROM embeddings
    ),
    q AS (SELECT vec_id, i,
                 CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT)
                   AS xq
          FROM e),
    dims AS (SELECT unnest(range({JL_OUT_DIMS})) AS od)
    SELECT vec_id, CAST(od AS INTEGER) AS out_dim,
           CAST(SUM(xq * (CASE WHEN substr(
                  md5(CAST(i AS VARCHAR) || '_' || CAST(od AS VARCHAR)), 1, 1)
                  IN ('1','3','5','7','9','b','d','f')
                THEN -1 ELSE 1 END)) AS BIGINT) AS proj_q20
    FROM q CROSS JOIN dims
    GROUP BY vec_id, od
    ORDER BY vec_id, out_dim
    """,
    doc=f"Johnson-Lindenstrauss random projection to {JL_OUT_DIMS} dims: "
    "md5-parity-derived +-1 sign matrix (regenerable on any engine, no "
    "stored state), Q20-quantized exact int64 matmul in one Arrow batch "
    "pass — one scan, zero shuffles; the cheap pre-pass before "
    "clustering or a smaller ANN index.",
)
def q_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings")
    return random_projection_q20(emb, "vec_id", "embedding").orderBy(
        "vec_id", "out_dim"
    )


# --------------------------------------------------------------------------
# Matryoshka truncation evaluation: how much retrieval quality survives
# keeping only the first M of D embedding dimensions? Matryoshka-style
# encoders are trained so prefixes remain usable; before switching an
# index (or a reranker's first stage) to truncated vectors, measure
# recall@k of truncated-exact retrieval against full-dim exact retrieval.
# Pure composition of the existing exact top-k machinery: two bounded
# query-matrix scans (full + sliced corpus), an id-equi-join of the two
# k-row-per-query lists, integer overlap counts — float similarity never
# crosses the engine boundary, so the read-out is rank-tie-robust.
# --------------------------------------------------------------------------

MRL_DIMS = 16


@register(
    "q_matryoshka_recall",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    full_sims AS (
      SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
             {_SQL_SEQ_DOT.format(a="q.embedding", b="c.embedding")}
               / ({_SQL_NORM.format(v="q.embedding")}
                  * {_SQL_NORM.format(v="c.embedding")}) AS sim
      FROM q JOIN embeddings c ON c.vec_id != q.vec_id
    ),
    full_top AS (
      SELECT qid, neighbor_id FROM (
        SELECT qid, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, neighbor_id) AS rk
        FROM full_sims) WHERE rk <= {TOPK}
    ),
    tq AS (SELECT vec_id, embedding[1:{MRL_DIMS}] AS embedding FROM embeddings
           WHERE vec_id < {N_QUERIES}),
    tc AS (SELECT vec_id, embedding[1:{MRL_DIMS}] AS embedding FROM embeddings),
    trunc_sims AS (
      SELECT tq.vec_id AS qid, tc.vec_id AS neighbor_id,
             {_SQL_SEQ_DOT.format(a="tq.embedding", b="tc.embedding")}
               / ({_SQL_NORM.format(v="tq.embedding")}
                  * {_SQL_NORM.format(v="tc.embedding")}) AS sim
      FROM tq JOIN tc ON tc.vec_id != tq.vec_id
    ),
    trunc_top AS (
      SELECT qid, neighbor_id FROM (
        SELECT qid, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, neighbor_id) AS rk
        FROM trunc_sims) WHERE rk <= {TOPK}
    )
    SELECT f.qid,
           CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_common,
           CAST(COUNT(t.neighbor_id) AS DOUBLE) / {TOPK} AS recall
    FROM full_top f LEFT JOIN trunc_top t
      ON f.qid = t.qid AND f.neighbor_id = t.neighbor_id
    GROUP BY f.qid ORDER BY f.qid
    """,
    doc=f"matryoshka truncation eval: recall@{TOPK} of exact retrieval on "
    f"the first {MRL_DIMS} of 64 dims vs full-dim exact retrieval — the "
    "go/no-go measurement before pointing an index at truncated "
    "vectors; integer overlap counts, so the read-out is robust to "
    "cross-engine float rank noise.",
)
def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings")
    queries = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    trunc = lambda df: df.withColumn(
        "embedding", F.slice("embedding", 1, MRL_DIMS)
    )
    full_top = ann_bruteforce_topk(emb, queries, TOPK)
    trunc_top = ann_bruteforce_topk(trunc(emb), trunc(queries), TOPK).select(
        F.col("qid").alias("tqid"), F.col("neighbor_id").alias("tneighbor")
    )
    return (
        full_top.join(
            trunc_top,
            (F.col("qid") == F.col("tqid"))
            & (F.col("neighbor_id") == F.col("tneighbor")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count("tneighbor").cast("bigint").alias("n_common"),
            (F.count("tneighbor").cast("double") / F.lit(TOPK)).alias("recall"),
        )
        .orderBy("qid")
    )


# --------------------------------------------------------------------------
# Product quantization (round 11): the missing leg of the ANN family.
# IVF (above) prunes WHICH vectors a query scans; PQ compresses WHAT is
# scanned — each 64-dim vector becomes M=4 one-byte codes into per-
# subspace codebooks, and query-time distance is an O(M) table lookup
# (ADC, asymmetric distance computation; Jégou, Douze, Schmid, "Product
# Quantization for Nearest Neighbor Search", IEEE TPAMI 2011). At 100 TB
# IVF-PQ is the standard shape: the corpus holds codes (16 bytes/vector
# here vs 256 for raw float32), the QxMxK ADC lookup table is built per
# query batch, and the scan is integer code joins + a fixed-order sum.
#
# Determinism contract (same discipline as the k-means loop above):
# vectors scalar-quantized to exact Q20 ints first; every subspace
# distance is a sequential fold (F.aggregate <-> list_reduce) over
# identical doubles; codebook updates are ONE double division of exact
# int64 sums; argmin ties break on code id; init = the K smallest
# vec_ids' subvectors. Cross-subspace distance totals are summed in
# FIXED order (4 conditional single-element aggregates added left-to-
# right) — a bare SUM over the m-groups would be order-nondeterministic
# in both engines.
#
# Scale: training is the Lloyd loop per subspace, fused into ONE
# DataFrame loop keyed by (m) — per round one broadcast of the M·K
# centroid table, one map-side assign (n·M·K folds), one (m, code)
# shuffle of exact partial sums, one <=M·K-row collect. Encoding is the
# final assign (map-side). The ADC eval broadcasts Q anchor subvectors,
# builds the QxMxK lookup table (512 rows here), equi-joins it to the
# code table, and takes per-query top-K — no raw-vector join anywhere
# past the lookup-table build.
# --------------------------------------------------------------------------

PQ_SUBDIM = 16
PQ_M = 4
PQ_K = 16
PQ_ITERS = 2
PQ_TOPK = 10
PQ_QUERIES = 8


def _pq_subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, m, sv): Q20-quantized subvectors as exact-int doubles."""
    eq = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("double"),
    )
    parts = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(F.col("eqv"), m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
            )
            for m in range(PQ_M)
        ]
    )
    return (
        emb.select("vec_id", eq.alias("eqv"))
        .select("vec_id", F.explode(parts).alias("p"))
        .select("vec_id", F.col("p.m").alias("m"), F.col("p.sv").alias("sv"))
    )


def _pq_l2(a, b):
    """Sequential-fold squared L2 — bit-identical to the oracle's
    list_reduce on identical inputs."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_assign(sv: DataFrame, cdf: DataFrame) -> DataFrame:
    """(vec_id, m, code): nearest codebook entry per subspace (min L2,
    ties to lowest code). cdf: (m, code, cu) — KBs, always broadcast."""
    w = Window.partitionBy("vec_id", "m").orderBy(F.asc("dist"), F.asc("code"))
    return (
        sv.join(F.broadcast(cdf), "m")
        .withColumn("dist", _pq_l2(F.col("sv"), F.col("cu")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "m", "code")
    )


def _pq_loop(
    spark: SparkSession, emb: DataFrame
) -> tuple[DataFrame, list[tuple[int, int, list[float]]]]:
    """Train the per-subspace codebooks; returns (persisted sv table,
    final centroid rows). One Lloyd loop over all M subspaces at once."""
    from pyspark.storagelevel import StorageLevel

    sv = (
        _pq_subvectors(emb)
        .repartition(spark.sparkContext.defaultParallelism)
        .persist(StorageLevel.DISK_ONLY)
    )
    return sv, _pq_train_sv(spark, sv)


def _pq_train_sv(
    spark: SparkSession, sv: DataFrame
) -> list[tuple[int, int, list[float]]]:
    """The Lloyd trainer core over ANY (vec_id, m, sv) subvector table —
    split from _pq_loop so the residual IVFADC path can train codebooks
    on residual subvectors with the identical loop. Init: the first PQ_K
    vec_ids' subvectors (the oracle's `ids` CTE)."""
    ids = [
        r["vec_id"]
        for r in sv.select("vec_id")
        .distinct()
        .orderBy("vec_id")
        .limit(PQ_K)
        .collect()
    ]
    code_of = {v: i for i, v in enumerate(ids)}
    init = sv.where(F.col("vec_id").isin(ids)).collect()  # bounded: K*M rows
    cents = sorted((r["m"], code_of[r["vec_id"]], list(r["sv"])) for r in init)
    dims = range(PQ_SUBDIM)
    for _ in range(PQ_ITERS):
        cdf = spark.createDataFrame(cents, "m int, code int, cu array<double>")
        assigned = pq_assign(sv, cdf)
        means = (
            sv.join(assigned, ["vec_id", "m"])
            .groupBy("m", "code")
            .agg(
                *[
                    (
                        F.sum(F.element_at("sv", d + 1).cast("long")).cast("double")
                        / F.count("*")
                    ).alias(f"c{d}")
                    for d in dims
                ]
            )
        )
        rows = means.select(
            "m", "code", F.array(*[f"c{d}" for d in dims]).alias("cu")
        ).collect()  # bounded: <= M*K rows
        cents = sorted((r["m"], r["code"], list(r["cu"])) for r in rows)
    return cents


_SQL_PQ_L2 = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(generate_series(1, {n}), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
    "(acc, w) -> acc + w)"
)


_SQL_EV_RAW = f"""ev AS MATERIALIZED (
      SELECT vec_id, d,
             CAST(floor(CAST(embedding[d] AS DOUBLE) * {QUANT}.0 + 0.5) AS BIGINT) AS eq,
             CAST((d - 1) // {PQ_SUBDIM} AS INT) AS m,
             ((d - 1) % {PQ_SUBDIM}) + 1 AS dl
      FROM embeddings, generate_series(1, {PQ_M * PQ_SUBDIM}) g(d)
    )"""


def _pq_train_ctes(
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    pfx: str = "",
    base: list[str] | None = None,
) -> list[str]:
    """The unrolled PQ trainer as a CTE list over {pfx}ev (vec_id, m, dl,
    eq): emits {pfx}sv, {pfx}ids, {pfx}c0..{pfx}cN, {pfx}a*/{pfx}mm*, and
    {pfx}afinal. ``base`` supplies the CTEs that DEFINE {pfx}ev (default:
    the raw Q20 subvector build from embeddings). The prefix lets one
    oracle carry TWO trainers — the residual IVFADC query trains raw and
    residual codebooks side by side (pfx='' and pfx='r')."""
    p = pfx
    l2 = _SQL_PQ_L2.format(a="v.sv", b="c.cu", n=PQ_SUBDIM)
    # alias the element table to bare `ev` when prefixed, so the mm CTEs'
    # qualifiers keep one spelling (and pfx='' output stays byte-identical
    # to the pre-refactor chain — pinned in tests)
    ev_ref = "ev" if not p else f"{p}ev ev"
    ctes = list(base) if base is not None else [_SQL_EV_RAW]
    ctes.append(
        f"""{p}sv AS MATERIALIZED (
      SELECT vec_id, m, list(CAST(eq AS DOUBLE) ORDER BY dl) AS sv
      FROM {p}ev GROUP BY vec_id, m
    )"""
    )
    ctes.append(
        f"""{p}ids AS (
      SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code
      FROM (SELECT DISTINCT vec_id FROM {p}sv ORDER BY vec_id LIMIT {k})
    )"""
    )
    ctes.append(
        f"""{p}c0 AS MATERIALIZED (
      SELECT s.m, i.code, s.sv AS cu FROM {p}sv s JOIN {p}ids i USING (vec_id)
    )"""
    )
    for i in range(1, iters + 1):
        ctes.append(
            f"""{p}a{i} AS MATERIALIZED (
      SELECT vec_id, m, code FROM (
        SELECT v.vec_id, v.m, c.code,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.m
                                  ORDER BY {l2} ASC, c.code) AS rk
        FROM {p}sv v JOIN {p}c{i - 1} c ON v.m = c.m
      ) WHERE rk = 1
    )"""
        )
        ctes.append(
            f"""{p}mm{i} AS (
      SELECT a.m, a.code, ev.dl, CAST(SUM(ev.eq) AS DOUBLE) / COUNT(*) AS c
      FROM {ev_ref} JOIN {p}a{i} a ON ev.vec_id = a.vec_id AND ev.m = a.m
      GROUP BY a.m, a.code, ev.dl
    )"""
        )
        ctes.append(
            f"""{p}c{i} AS MATERIALIZED (
      SELECT m, code, list(c ORDER BY dl) AS cu FROM {p}mm{i} GROUP BY m, code
    )"""
        )
    # final encode: assign against the FINAL codebooks (the Spark side
    # re-assigns after the last update — same shape as the k-means
    # oracle's afinal)
    ctes.append(
        f"""{p}afinal AS MATERIALIZED (
      SELECT vec_id, m, code FROM (
        SELECT v.vec_id, v.m, c.code,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.m
                                  ORDER BY {l2} ASC, c.code) AS rk
        FROM {p}sv v JOIN {p}c{iters} c ON v.m = c.m
      ) WHERE rk = 1
    )"""
    )
    return ctes


def _pq_oracle_chain(k: int = PQ_K, iters: int = PQ_ITERS) -> str:
    """Unrolled PQ trainer as a materialized CTE chain (generated, like
    the k-means oracle)."""
    return "WITH " + ",\n".join(_pq_train_ctes(k, iters))


# (m, code) occupancy of the encoded corpus — shared with the streaming
# encode twin (streaming/pipelines.py:q_stream_pq_encode), whose converged
# output is the same final assignment.
PQ_OCCUPANCY_ORACLE = (
    _pq_oracle_chain()
    + """
    SELECT m, code, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(vec_id) AS BIGINT) AS id_sum
    FROM afinal GROUP BY m, code ORDER BY m, code
    """
)


@register(
    "q_embedding_pq_codebooks",
    PQ_OCCUPANCY_ORACLE,
    doc=f"product-quantization codebook training + corpus encoding: "
    f"{PQ_M} subspaces x {PQ_K} codes, {PQ_ITERS} deterministic Lloyd "
    "rounds fused into one subspace-keyed loop; output is the encoded "
    "corpus's (subspace, code) occupancy, fully value-checked against "
    "the unrolled SQL iteration.",
)
def q_embedding_pq_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bounded (M·K rows): collect + unpersist so repeated battery runs in
    # one session don't accumulate the DISK_ONLY sv table (ADVICE r12 4)
    out, sv = pq_codebooks_plan(spark, sf_dir)
    return materialize_small(spark, out, sv)


def pq_codebooks_plan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Lazy (occupancy result, persisted sv) — split from the registered
    wrapper so plan tests assert on the encode plan itself."""
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sv, cents = _pq_loop(spark, emb)
    cdf = spark.createDataFrame(cents, "m int, code int, cu array<double>")
    out = (
        pq_assign(sv, cdf)
        .groupBy("m", "code")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.sum("vec_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("m", "code")
    )
    return out, sv


def _pq_fixed_order_dist():
    """Cross-subspace total as 4 single-element conditional aggregates
    added in fixed order — never a bare SUM over the m rows (float
    addition order would be engine/partition dependent)."""
    terms = [
        F.sum(F.when(F.col("m") == m, F.col("dd")).otherwise(F.lit(0.0)))
        for m in range(PQ_M)
    ]
    total = terms[0]
    for t_ in terms[1:]:
        total = total + t_
    return total.alias("dist")


def _sql_pq_msum() -> str:
    return " + ".join(
        f"SUM(CASE WHEN m = {m} THEN dd ELSE 0 END)" for m in range(PQ_M)
    )


@register(
    "q_pq_adc_recall",
    _pq_oracle_chain()
    + f""",
    anch AS (SELECT DISTINCT vec_id FROM sv ORDER BY vec_id LIMIT {PQ_QUERIES}),
    exd AS (
      SELECT q.vec_id AS qid, v.vec_id, q.m AS m,
             {_SQL_PQ_L2.format(a="q.sv", b="v.sv", n=PQ_SUBDIM)} AS dd
      FROM sv q JOIN sv v ON q.m = v.m AND v.vec_id <> q.vec_id
      WHERE q.vec_id IN (SELECT vec_id FROM anch)
    ),
    ex AS (SELECT qid, vec_id, {_sql_pq_msum()} AS dist
           FROM exd GROUP BY qid, vec_id),
    ext AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist ASC, vec_id) AS rk
      FROM ex) WHERE rk <= {PQ_TOPK}),
    qd AS MATERIALIZED (
      SELECT q.vec_id AS qid, c.m, c.code,
             {_SQL_PQ_L2.format(a="q.sv", b="c.cu", n=PQ_SUBDIM)} AS dd
      FROM sv q JOIN c{PQ_ITERS} c ON q.m = c.m
      WHERE q.vec_id IN (SELECT vec_id FROM anch)
    ),
    adcd AS (
      SELECT qd.qid, a.vec_id, qd.m AS m, qd.dd AS dd
      FROM afinal a JOIN qd ON a.m = qd.m AND a.code = qd.code
      WHERE a.vec_id <> qd.qid
    ),
    adc AS (SELECT qid, vec_id, {_sql_pq_msum()} AS dist
            FROM adcd GROUP BY qid, vec_id),
    adct AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist ASC, vec_id) AS rk
      FROM adc) WHERE rk <= {PQ_TOPK})
    SELECT e.qid, CAST(COUNT(a.vec_id) AS INT) AS hits_at_{PQ_TOPK}
    FROM ext e LEFT JOIN adct a ON e.qid = a.qid AND e.vec_id = a.vec_id
    GROUP BY e.qid ORDER BY e.qid
    """,
    doc=f"PQ ADC recall@{PQ_TOPK}: for {PQ_QUERIES} anchor queries, "
    "approximate retrieval via the QxMxK ADC lookup table (query-to-"
    "centroid distances equi-joined to the corpus code table) vs exact "
    "subspace-summed L2 — the compression-vs-recall read-out that "
    "decides the codebook budget before an IVF-PQ rollout; integer "
    "overlap counts, robust to float rank noise.",
)
def q_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bounded (Q rows): collect + unpersist the DISK_ONLY sv (ADVICE r12 4)
    out, sv = pq_adc_recall_plan(spark, sf_dir)
    return materialize_small(spark, out, sv)


def pq_adc_recall_plan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Lazy (recall result, persisted sv) — split from the registered
    wrapper so plan tests assert on the ADC plan itself."""
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sv, cents = _pq_loop(spark, emb)
    cdf = spark.createDataFrame(cents, "m int, code int, cu array<double>")
    assigned = pq_assign(sv, cdf)
    anchor_ids = [
        r["vec_id"]
        for r in emb.select("vec_id")
        .orderBy("vec_id")
        .limit(PQ_QUERIES)
        .collect()
    ]
    q = sv.where(F.col("vec_id").isin(anchor_ids)).select(
        F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv")
    )
    topw = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))

    def topk(dists: DataFrame) -> DataFrame:
        return (
            dists.withColumn("rk", F.row_number().over(topw))
            .where(F.col("rk") <= PQ_TOPK)
            .select("qid", "vec_id")
        )

    exd = (
        F.broadcast(q)
        .join(sv, "m")
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", "m", _pq_l2(F.col("qsv"), F.col("sv")).alias("dd")
        )
    )
    ext = topk(exd.groupBy("qid", "vec_id").agg(_pq_fixed_order_dist()))
    qd = (
        F.broadcast(q)
        .join(F.broadcast(cdf), "m")
        .select(
            "qid", "m", "code", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd")
        )
    )
    adcd = (
        assigned.join(F.broadcast(qd), ["m", "code"])
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "m", "dd")
    )
    adct = topk(adcd.groupBy("qid", "vec_id").agg(_pq_fixed_order_dist())).select(
        F.col("qid").alias("aqid"), F.col("vec_id").alias("aneighbor")
    )
    out = (
        ext.join(
            adct,
            (F.col("qid") == F.col("aqid"))
            & (F.col("vec_id") == F.col("aneighbor")),
            "left",
        )
        .groupBy("qid")
        .agg(F.count("aneighbor").cast("int").alias(f"hits_at_{PQ_TOPK}"))
        .orderBy("qid")
    )
    return out, sv


# --------------------------------------------------------------------------
# Composed IVF-PQ (round 12, VERDICT r11 item 2): the serving shape a real
# 100 TB vector store runs. q_ann_ivf prunes WHICH cells a query scans and
# q_pq_adc_recall compresses WHAT is scanned; this query chains them —
# coarse-quantizer prune, THEN ADC over only the surviving cells' codes —
# so the two legs' fixed-order float contracts are checked in composition,
# not just individually (Jégou, Douze, Schmid, TPAMI 2011 §IV: IVFADC).
#
# Coarse quantizer = per-label centroids in the SAME Q20 subvector space
# the codebooks live in (per-(label, m) mean = exact int64 sums, one
# double division — the codebook-update formula applied per cell), so the
# whole composition stays on one deterministic representation. Cell
# distance is the subspace L2 fold summed in FIXED m-order, same as ADC.
# This is the non-residual IVFADC variant (codes quantize raw vectors,
# not cell residuals): one shared codebook table, which is what keeps the
# oracle a pure extension of _pq_oracle_chain.
#
# Scale: the cell-centroid table is |cells|·M rows (KBs — broadcast); the
# probe set is Q·nprobe rows (broadcast); the ADC lookup stays Q·M·K. The
# one corpus-sized step is attaching the cell id to the code table — a
# single co-keyed vec_id join here; the persisted-index variant below
# stores the cell id INLINE with the codes (the actual IVF-PQ layout:
# codes partitioned by cell), making the probe read only the probed
# cells' files. n_candidates is emitted so the record proves the prune
# actually pruned (≈ nprobe/|cells| of the corpus, not all of it).
# --------------------------------------------------------------------------

IVFPQ_NPROBE = 2


def pq_coarse_centroids(svl: DataFrame) -> DataFrame:
    """(label, m, cu): per-cell per-subspace centroid over (vec_id, m, sv,
    label) rows — exact int64 dim-sums, one double division per dim."""
    dims = range(PQ_SUBDIM)
    return (
        svl.groupBy("label", "m")
        .agg(
            *[
                (
                    F.sum(F.element_at("sv", d + 1).cast("long")).cast("double")
                    / F.count("*")
                ).alias(f"c{d}")
                for d in dims
            ]
        )
        .select("label", "m", F.array(*[f"c{d}" for d in dims]).alias("cu"))
    )


def _ivfpq_common_ctes() -> str:
    """The IVFADC pipeline as CTEs (coarse centroids → probes → ADC over
    the probed cells), extending _pq_oracle_chain — shared by the recall
    oracle (q_ann_ivf_pq) and the persisted-serving oracle
    (q_ann_ivf_pq_persisted)."""
    msum = _sql_pq_msum()
    return (
        _pq_oracle_chain()
        + f""",
    lbl AS (SELECT vec_id, label FROM embeddings),
    anch AS (SELECT DISTINCT vec_id FROM sv ORDER BY vec_id LIMIT {PQ_QUERIES}),
    ccm AS (
      SELECT l.label, e.m, e.dl, CAST(SUM(e.eq) AS DOUBLE) / COUNT(*) AS c
      FROM ev e JOIN lbl l ON e.vec_id = l.vec_id
      GROUP BY l.label, e.m, e.dl
    ),
    ccv AS MATERIALIZED (
      SELECT label, m, list(c ORDER BY dl) AS cu FROM ccm GROUP BY label, m
    ),
    qcd AS (
      SELECT q.vec_id AS qid, c.label, c.m AS m,
             {_SQL_PQ_L2.format(a="q.sv", b="c.cu", n=PQ_SUBDIM)} AS dd
      FROM sv q JOIN ccv c ON q.m = c.m
      WHERE q.vec_id IN (SELECT vec_id FROM anch)
    ),
    cdist AS (SELECT qid, label, {msum} AS dist FROM qcd GROUP BY qid, label),
    probes AS (
      SELECT qid, label FROM (
        SELECT qid, label,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dist ASC, label) AS prk
        FROM cdist) WHERE prk <= {IVFPQ_NPROBE}
    ),
    qd AS MATERIALIZED (
      SELECT q.vec_id AS qid, c.m, c.code,
             {_SQL_PQ_L2.format(a="q.sv", b="c.cu", n=PQ_SUBDIM)} AS dd
      FROM sv q JOIN c{PQ_ITERS} c ON q.m = c.m
      WHERE q.vec_id IN (SELECT vec_id FROM anch)
    ),
    cand AS (
      SELECT p.qid, a.vec_id, a.m, a.code
      FROM afinal a JOIN lbl l ON a.vec_id = l.vec_id
      JOIN probes p ON l.label = p.label
      WHERE a.vec_id <> p.qid
    ),
    adcd AS (
      SELECT c.qid, c.vec_id, c.m AS m, qd.dd AS dd
      FROM cand c JOIN qd ON c.qid = qd.qid AND c.m = qd.m
                         AND c.code = qd.code
    ),
    adc AS (SELECT qid, vec_id, {msum} AS dist
            FROM adcd GROUP BY qid, vec_id)"""
    )


def _ivfpq_oracle_sql() -> str:
    msum = _sql_pq_msum()
    return (
        _ivfpq_common_ctes()
        + f""",
    ncand AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_candidates
              FROM adc GROUP BY qid),
    adct AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM adc) WHERE rk <= {PQ_TOPK}),
    exd AS (
      SELECT q.vec_id AS qid, v.vec_id, q.m AS m,
             {_SQL_PQ_L2.format(a="q.sv", b="v.sv", n=PQ_SUBDIM)} AS dd
      FROM sv q JOIN sv v ON q.m = v.m AND v.vec_id <> q.vec_id
      WHERE q.vec_id IN (SELECT vec_id FROM anch)
    ),
    ex AS (SELECT qid, vec_id, {msum} AS dist
           FROM exd GROUP BY qid, vec_id),
    ext AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM ex) WHERE rk <= {PQ_TOPK})
    SELECT e.qid, n.n_candidates,
           CAST(COUNT(a.vec_id) AS INT) AS hits_at_{PQ_TOPK}
    FROM ext e
    LEFT JOIN adct a ON e.qid = a.qid AND e.vec_id = a.vec_id
    JOIN ncand n ON e.qid = n.qid
    GROUP BY e.qid, n.n_candidates ORDER BY e.qid
    """
    )


@register(
    "q_ann_ivf_pq",
    _ivfpq_oracle_sql(),
    doc=f"composed IVF-PQ serving path: coarse per-cell centroid prune "
    f"(nprobe={IVFPQ_NPROBE} of the label cells, subspace-L2 in the same "
    "Q20 space as the codebooks), then ADC over ONLY the surviving cells' "
    "codes; emits per-query candidate count (proof of prune) and "
    f"recall hits@{PQ_TOPK} vs full exact L2 — the two individually-"
    "checked ANN legs exercised in composition.",
)
def q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, sv = ivfpq_composed_plan(spark, sf_dir)
    # bounded (Q rows): collect + unpersist the DISK_ONLY sv (ADVICE r12 4)
    return materialize_small(spark, out, sv)


def ivfpq_composed_plan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Lazy (result, persisted sv) for the composed IVF-PQ — split from
    the registered wrapper (which materializes the bounded result to
    release sv) so plan tests can assert on the composed plan itself."""
    emb = tp(spark, sf_dir, "embeddings")
    sv, cents = _pq_loop(spark, emb.select("vec_id", "embedding"))
    cdf = spark.createDataFrame(cents, "m int, code int, cu array<double>")
    lbl = emb.select("vec_id", "label")
    # index build: codes with the cell id attached (one co-keyed join —
    # the persisted layout stores this inline, see pq_index_path)
    coded = pq_assign(sv, cdf).join(lbl, "vec_id")
    coarse = pq_coarse_centroids(sv.join(lbl, "vec_id"))
    anchor_ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(PQ_QUERIES).collect()
    ]
    q = sv.where(F.col("vec_id").isin(anchor_ids)).select(
        F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv")
    )
    # coarse prune: Q x |cells| distances, all broadcast-side
    wprobe = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("label"))
    probes = (
        F.broadcast(q)
        .join(F.broadcast(coarse), "m")
        .select("qid", "label", "m", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd"))
        .groupBy("qid", "label")
        .agg(_pq_fixed_order_dist())
        .withColumn("prk", F.row_number().over(wprobe))
        .where(F.col("prk") <= IVFPQ_NPROBE)
        .select("qid", "label")
    )
    # ADC lookup table (Q·M·K rows) joined to the pruned cells' codes only
    qd = (
        F.broadcast(q)
        .join(F.broadcast(cdf), "m")
        .select("qid", "m", "code", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd"))
    )
    adcd = (
        coded.join(F.broadcast(probes), "label")
        .where(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(qd), ["qid", "m", "code"])
        .select("qid", "vec_id", "m", "dd")
    )
    adc = adcd.groupBy("qid", "vec_id").agg(_pq_fixed_order_dist())
    ncand = adc.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_candidates")
    )
    topw = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))

    def topk(dists: DataFrame) -> DataFrame:
        return (
            dists.withColumn("rk", F.row_number().over(topw))
            .where(F.col("rk") <= PQ_TOPK)
            .select("qid", "vec_id")
        )

    adct = topk(adc).select(
        F.col("qid").alias("aqid"), F.col("vec_id").alias("aneighbor")
    )
    exd = (
        F.broadcast(q)
        .join(sv, "m")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "m", _pq_l2(F.col("qsv"), F.col("sv")).alias("dd"))
    )
    ext = topk(exd.groupBy("qid", "vec_id").agg(_pq_fixed_order_dist()))
    out = (
        ext.join(
            adct,
            (F.col("qid") == F.col("aqid"))
            & (F.col("vec_id") == F.col("aneighbor")),
            "left",
        )
        .groupBy("qid")
        .agg(F.count("aneighbor").cast("int").alias(f"hits_at_{PQ_TOPK}"))
        .join(ncand, "qid")
        .select("qid", "n_candidates", f"hits_at_{PQ_TOPK}")
        .orderBy("qid")
    )
    return out, sv


# --------------------------------------------------------------------------
# Persisted PQ index (round 12, VERDICT r11 item 4): codebooks + code
# table as DURABLE parquet, mirroring the LSH index's amortized-build
# story (lsh_index_path above). At 100 TB the codebook training pass is
# the expensive step; probes are cheap — production IVF-PQ trains once,
# persists, and every probe job broadcast-loads the KB-sized codebooks
# and equi-joins the code table.
#
# Layout is the IVFADC on-disk shape: codes carry the coarse cell id
# INLINE (the join q_ann_ivf_pq pays per query is paid once at build)
# and are PARTITIONED BY the cell, so a probe that has already chosen
# its nprobe cells reads only those directories — partition pruning is
# the storage analogue of the coarse prune. The probe query recomputes
# ONLY the query-side subvectors (queries are new data at probe time);
# Q20 quantization is per-element, parquet doubles round-trip exactly,
# so the persisted path is bit-identical to the in-memory one and
# shares its oracle discipline (q_ann_lsh_persisted).
# --------------------------------------------------------------------------

_pq_index_paths: dict[tuple[int, str], tuple[str, str, str]] = {}


def pq_index_path(spark: SparkSession, sf_dir: str) -> tuple[str, str, str]:
    """Build (once per session+fixture) the persisted PQ index; return
    (codebooks_path, codes_path, cells_path). codebooks: (m, code, cu) —
    KBs, the broadcast side of every probe. codes: (vec_id, m, code)
    partitioned by label (the coarse cell). cells: (label, m, cu) — the
    coarse-quantizer centroids (|cells|·M rows), so an IVF-pruned probe
    needs NOTHING beyond the index artifacts."""
    import os
    import re

    key = (session_key(spark), sf_dir)
    if key not in _pq_index_paths:
        base = work_dir("pq_index_" + re.sub(r"\W+", "_", sf_dir))
        cb_path = os.path.join(base, "codebooks")
        codes_path = os.path.join(base, "codes")
        cells_path = os.path.join(base, "cells")
        emb = tp(spark, sf_dir, "embeddings")
        lbl = emb.select("vec_id", "label")
        sv, cents = _pq_loop(spark, emb.select("vec_id", "embedding"))
        cdf = spark.createDataFrame(cents, "m int, code int, cu array<double>")
        cdf.write.mode("overwrite").parquet(cb_path)
        (
            pq_assign(sv, cdf)
            .join(lbl, "vec_id")
            .write.mode("overwrite")
            .partitionBy("label")
            .parquet(codes_path)
        )
        pq_coarse_centroids(sv.join(lbl, "vec_id")).write.mode(
            "overwrite"
        ).parquet(cells_path)
        sv.unpersist()
        _pq_index_paths[key] = (cb_path, codes_path, cells_path)
    return _pq_index_paths[key]


def pq_code_struct_array(by_m: dict[int, list[tuple[int, list[float]]]]):
    """The frozen-codebook ENCODER as one Catalyst expression: an array of
    (m, code) structs where code = argmin_code L2(subvector_m, codebook
    entry), ties to the LOWEST code (struct-ordered array_min matches the
    batch window's ORDER BY dist ASC, code ASC). The codebooks are plan
    literals (M·K rows), so the expression is stateless and streams —
    shared by the streaming encode twin and the incremental index-grow
    fold (streaming/pipelines.py)."""
    eq = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * QUANT + 0.5).cast("double"),
    )

    def code_for(m: int):
        sv = F.slice(eq, m * PQ_SUBDIM + 1, PQ_SUBDIM)
        cands = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            sv,
                            F.array(*[F.lit(v) for v in cu]),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ).alias("dist"),
                    F.lit(code).alias("code"),
                )
                for code, cu in sorted(by_m[m])
            ]
        )
        return F.array_min(cands)["code"]

    return F.array(
        *[
            F.struct(F.lit(m).alias("m"), code_for(m).alias("code"))
            for m in range(PQ_M)
        ]
    )


def adc_probe_topk(q: DataFrame, cdf: DataFrame, codes: DataFrame) -> DataFrame:
    """ADC top-PQ_TOPK over a code table: the Q·M·K lookup table (query
    subvectors × broadcast codebooks) equi-joined to the codes, distances
    summed in fixed m-order — the probe body shared by the persisted-index
    probe and the grown-index probe (both value-checked against
    _PQ_PROBE_ORACLE). q: (qid, m, qsv); cdf: (m, code, cu);
    codes: (vec_id, m, code, ...)."""
    qd = (
        F.broadcast(q)
        .join(F.broadcast(cdf), "m")
        .select("qid", "m", "code", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        codes.join(F.broadcast(qd), ["m", "code"])
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "m", "dd")
        .groupBy("qid", "vec_id")
        .agg(_pq_fixed_order_dist())
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= PQ_TOPK)
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("qid", "rk")
    )


_PQ_PROBE_ORACLE = (
    _pq_oracle_chain()
    + f""",
    anch AS (SELECT DISTINCT vec_id FROM sv ORDER BY vec_id LIMIT {PQ_QUERIES}),
    qd AS MATERIALIZED (
      SELECT q.vec_id AS qid, c.m, c.code,
             {_SQL_PQ_L2.format(a="q.sv", b="c.cu", n=PQ_SUBDIM)} AS dd
      FROM sv q JOIN c{PQ_ITERS} c ON q.m = c.m
      WHERE q.vec_id IN (SELECT vec_id FROM anch)
    ),
    adcd AS (
      SELECT qd.qid, a.vec_id, qd.m AS m, qd.dd AS dd
      FROM afinal a JOIN qd ON a.m = qd.m AND a.code = qd.code
      WHERE a.vec_id <> qd.qid
    ),
    adc AS (SELECT qid, vec_id, {_sql_pq_msum()} AS dist
            FROM adcd GROUP BY qid, vec_id)
    SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM adc) WHERE rk <= {PQ_TOPK}
    ORDER BY qid, rk
    """
)


@register(
    "q_pq_persisted_probe",
    _PQ_PROBE_ORACLE,
    doc=f"ADC top-{PQ_TOPK} probe over a PERSISTED PQ index: codebooks + "
    "cell-partitioned code table written once as parquet (the durable, "
    "amortized-build artifact), broadcast-reloaded and probed with "
    "freshly-subvectorized queries — results, and oracle, identical to "
    "the in-memory ADC path (the q_ann_lsh_persisted discipline).",
)
def q_pq_persisted_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    cb_path, codes_path, _ = pq_index_path(spark, sf_dir)
    cdf = spark.read.parquet(cb_path)
    codes = spark.read.parquet(codes_path)
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    anchor_ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(PQ_QUERIES).collect()
    ]
    # query-side subvectors only — the corpus is never re-quantized
    q = _pq_subvectors(emb.where(F.col("vec_id").isin(anchor_ids))).select(
        F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv")
    )
    return adc_probe_topk(q, cdf, codes)


# --------------------------------------------------------------------------
# IVF-PQ serving over the persisted index (round 12): the composed prune
# with the I/O story made literal. q_ann_ivf_pq proves the composition's
# arithmetic; this query runs it the way a 100 TB store does — every
# input is a durable index artifact (cell centroids, codebooks, cell-
# partitioned codes), and the coarse prune becomes a PARTITION FILTER on
# the code scan: the union of the probed cells (≤ Q·nprobe labels, a
# bounded driver collect) prunes the parquet read to those directories
# before a single code row is touched. At 1000 executors that is the
# difference between scanning nprobe/|cells| of the index and scanning
# all of it and filtering — partition pruning IS the coarse quantizer's
# storage dividend. Results are the ADC top-k (per-query candidates are
# still restricted to that query's own probed cells via the probe
# equi-join), bit-identical to the in-memory composition, so the oracle
# is the shared IVFADC CTE chain ranked to top-k.
# --------------------------------------------------------------------------

_IVFPQ_SERVE_ORACLE = (
    _ivfpq_common_ctes()
    + f"""
    SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM adc) WHERE rk <= {PQ_TOPK}
    ORDER BY qid, rk
    """
)


def pq_probe_tables(
    q: DataFrame, cdf: DataFrame, cells: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """The query-side tables of every raw-PQ IVF probe: the coarse prune
    against the persisted cell centroids (probes: qid, label — a bounded
    collect rebuilt as a local relation, since every caller reuses it at
    least twice) and the Q·M·K ADC lookup (qd — broadcast). The raw twin
    of residual_probe_tables, shared by the persisted serving path and
    the delete family. q: (qid, m, qsv)."""
    wprobe = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("label"))
    probes_plan = (
        F.broadcast(q)
        .join(F.broadcast(cells), "m")
        .select("qid", "label", "m", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd"))
        .groupBy("qid", "label")
        .agg(_pq_fixed_order_dist())
        .withColumn("prk", F.row_number().over(wprobe))
        .where(F.col("prk") <= IVFPQ_NPROBE)
        .select("qid", "label")
    )
    # Bounded by contract: ≤ Q·nprobe rows. Collect ONCE and rebuild as a
    # local relation — every caller reuses probes at least twice (the
    # equi-join build side AND the label partition filter), and the r16
    # eager localCheckpoint + a separate distinct().collect() paid two
    # extra jobs for what is a driver-resident table (guide §2.4; the
    # MAX_COLLECTED_QUERIES bounded-collect discipline).
    probes = q.sparkSession.createDataFrame(
        probes_plan.collect(), probes_plan.schema
    )
    qd = (
        F.broadcast(q)
        .join(F.broadcast(cdf), "m")
        .select("qid", "m", "code", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd"))
    )
    return probes, qd


def pq_adc_rank(codes: DataFrame, probes: DataFrame, qd: DataFrame) -> DataFrame:
    """ADC top-PQ_TOPK over a raw-PQ code table (vec_id, m, code, label):
    candidates restricted to each query's probed cells, distances summed
    in fixed m-order — the raw twin of residual_adc_rank, shared by the
    persisted serving path and the delete family."""
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        codes.join(F.broadcast(probes), "label")
        .where(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(qd), ["qid", "m", "code"])
        .select("qid", "vec_id", "m", "dd")
        .groupBy("qid", "vec_id")
        .agg(_pq_fixed_order_dist())
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= PQ_TOPK)
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("qid", "rk")
    )


@register(
    "q_ann_ivf_pq_persisted",
    _IVFPQ_SERVE_ORACLE,
    # bench extended set (round 13, VERDICT r12 missing 5): the ANN
    # serving path's regression trend becomes visible in BENCH_r13+;
    # NOT in the legacy-14 trend line (that set is frozen for
    # comparability).
    headline=True,
    doc=f"IVF-PQ serving over the DURABLE index: coarse prune against the "
    "persisted cell centroids, then the probed cells' labels (a bounded "
    "collect, ≤ Q·nprobe values) PARTITION-PRUNE the cell-partitioned "
    f"code scan before ADC — top-{PQ_TOPK} per query, bit-identical to "
    "the in-memory composition (shared IVFADC oracle chain). The "
    "partition filter is pinned in tests/test_plans.py.",
)
def q_ann_ivf_pq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    cb_path, codes_path, cells_path = pq_index_path(spark, sf_dir)
    cdf = spark.read.parquet(cb_path)
    cells = spark.read.parquet(cells_path)
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    anchor_ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(PQ_QUERIES).collect()
    ]
    # query-side subvectors only — corpus quantization lives in the index
    q = _pq_subvectors(emb.where(F.col("vec_id").isin(anchor_ids))).select(
        F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv")
    )
    probes, qd = pq_probe_tables(q, cdf, cells)
    # bounded: ≤ Q·nprobe labels — becomes a literal IN partition filter
    probed_labels = sorted(
        {r["label"] for r in probes.select("label").distinct().collect()}
    )
    pruned_codes = spark.read.parquet(codes_path).where(
        F.col("label").isin(probed_labels)
    )
    return pq_adc_rank(pruned_codes, probes, qd)


# --------------------------------------------------------------------------
# Residual IVFADC (round 13, VERDICT r12 missing 3): the accuracy-bearing
# variant of the composed path. The non-residual composition above
# quantizes RAW vectors with one shared codebook; production IVF-PQ
# quantizes the RESIDUAL x − c(cell) (Jégou, Douze, Schmid, TPAMI 2011
# §III) — residuals concentrate around 0 across cells, so the same
# codebook budget spends its K centroids on a far tighter distribution
# and recall survives production cell counts. At the fixture's 10 cells
# the read-out emits BOTH legs' recall over the SAME probed cells so the
# improvement is a checked value, not a claim.
#
# Engine-portability of the residual arithmetic: the coarse centroid is
# itself QUANTIZED — cq = floor(S/n + 0.5) per dim, one double division
# of exact int64 inputs then floor, identical IEEE on both engines (real
# systems quantize the coarse reconstruction too). Residuals are then
# exact integers (sv − cq), so the residual trainer runs the IDENTICAL
# exact-int-sum Lloyd loop as the raw trainer (_pq_train_sv), and the
# oracle carries two trainer chains side by side (_pq_train_ctes with
# pfx='' and pfx='r').
#
# Scale: identical shapes to q_ann_ivf_pq — the residualization is one
# broadcast join (|cells|·M rows) applied map-side; the per-query lookup
# grows from Q·M·K to Q·nprobe·M·K (still KBs, broadcast); candidates
# still come only from the probed cells' codes.
# --------------------------------------------------------------------------


def pq_coarse_centroids_int(svl: DataFrame) -> DataFrame:
    """(label, m, cu): integer-ROUNDED per-cell per-subspace centroids —
    floor(S/n + 0.5) per dim as exact-int doubles. The quantized coarse
    reconstruction the residual path subtracts; exact int64 sums, one
    double division, one floor — bit-identical on both engines."""
    dims = range(PQ_SUBDIM)
    return (
        svl.groupBy("label", "m")
        .agg(
            *[
                F.floor(
                    F.sum(F.element_at("sv", d + 1).cast("long")).cast("double")
                    / F.count("*")
                    + F.lit(0.5)
                )
                .cast("double")
                .alias(f"c{d}")
                for d in dims
            ]
        )
        .select("label", "m", F.array(*[f"c{d}" for d in dims]).alias("cu"))
    )


def _ivfpq_residual_base_ctes() -> list[str]:
    """lbl + INT-rounded coarse centroids + residual element table — the
    CTEs that define the residual trainer's input (reference `ev`)."""
    return [
        """lbl AS (SELECT vec_id, label FROM embeddings)""",
        """cci AS MATERIALIZED (
      SELECT l.label, e.m, e.dl,
             CAST(floor(CAST(SUM(e.eq) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cq
      FROM ev e JOIN lbl l ON e.vec_id = l.vec_id
      GROUP BY l.label, e.m, e.dl
    )""",
        """rev AS MATERIALIZED (
      SELECT e.vec_id, e.m, e.dl, e.eq - c.cq AS eq
      FROM ev e JOIN lbl l ON e.vec_id = l.vec_id
      JOIN cci c ON c.label = l.label AND c.m = e.m AND c.dl = e.dl
    )""",
    ]


def _ivfpq_residual_probe_ctes(codes_cte: str = "rafinal") -> list[str]:
    """anch → INT-centroid coarse prune → residualized per-cell ADC →
    radc(qid, vec_id, dist): the serving pipeline over the residual
    trainer's outputs — shared by the recall read-out (which appends the
    raw + exact legs), the persisted serving oracle (which ranks radc to
    top-k directly), and the coarse-refresh oracle (which supplies its
    own re-encoded code table via ``codes_cte``; the default `rafinal`
    keeps every pre-existing oracle byte-identical)."""
    msum = _sql_pq_msum()
    return [
        f"""anch AS (SELECT DISTINCT vec_id FROM sv ORDER BY vec_id LIMIT {PQ_QUERIES})""",
        """ccv AS MATERIALIZED (
      SELECT label, m, list(CAST(cq AS DOUBLE) ORDER BY dl) AS cu
      FROM cci GROUP BY label, m
    )""",
        f"""qcd AS (
      SELECT q.vec_id AS qid, c.label, c.m AS m,
             {_SQL_PQ_L2.format(a="q.sv", b="c.cu", n=PQ_SUBDIM)} AS dd
      FROM sv q JOIN ccv c ON q.m = c.m
      WHERE q.vec_id IN (SELECT vec_id FROM anch)
    )""",
        f"""cdist AS (SELECT qid, label, {msum} AS dist FROM qcd GROUP BY qid, label)""",
        f"""probes AS (
      SELECT qid, label FROM (
        SELECT qid, label,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dist ASC, label) AS prk
        FROM cdist) WHERE prk <= {IVFPQ_NPROBE}
    )""",
        f"""qrv AS (
      SELECT p.qid, p.label, q.m,
             list_transform(generate_series(1, {PQ_SUBDIM}),
                            i -> q.sv[i] - c.cu[i]) AS rv
      FROM probes p
      JOIN sv q ON q.vec_id = p.qid
      JOIN ccv c ON c.label = p.label AND c.m = q.m
    )""",
        f"""rqd AS MATERIALIZED (
      SELECT v.qid, v.label, c.m, c.code,
             {_SQL_PQ_L2.format(a="v.rv", b="c.cu", n=PQ_SUBDIM)} AS dd
      FROM qrv v JOIN rc{PQ_ITERS} c ON v.m = c.m
    )""",
        f"""rcand AS (
      SELECT p.qid, a.vec_id, a.m, a.code, l.label
      FROM {codes_cte} a JOIN lbl l ON a.vec_id = l.vec_id
      JOIN probes p ON l.label = p.label
      WHERE a.vec_id <> p.qid
    )""",
        """radcd AS (
      SELECT c.qid, c.vec_id, c.m AS m, q.dd AS dd
      FROM rcand c JOIN rqd q ON q.qid = c.qid AND q.label = c.label
                            AND q.m = c.m AND q.code = c.code
    )""",
        f"""radc AS (SELECT qid, vec_id, {msum} AS dist
            FROM radcd GROUP BY qid, vec_id)""",
    ]


def _ivfpq_residual_oracle_sql() -> str:
    """Raw + residual trainer chains side by side, one coarse prune over
    the INT-rounded cell centroids, both ADC legs over the same probed
    cells, exact top-k reference — per-query hits for both legs."""
    msum = _sql_pq_msum()
    ctes = _pq_train_ctes() + _pq_train_ctes(
        pfx="r", base=_ivfpq_residual_base_ctes()
    )
    ctes += _ivfpq_residual_probe_ctes()
    ctes += [
        f"""radct AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM radc) WHERE rk <= {PQ_TOPK})""",
        f"""qd AS MATERIALIZED (
      SELECT q.vec_id AS qid, c.m, c.code,
             {_SQL_PQ_L2.format(a="q.sv", b="c.cu", n=PQ_SUBDIM)} AS dd
      FROM sv q JOIN c{PQ_ITERS} c ON q.m = c.m
      WHERE q.vec_id IN (SELECT vec_id FROM anch)
    )""",
        """cand AS (
      SELECT p.qid, a.vec_id, a.m, a.code
      FROM afinal a JOIN lbl l ON a.vec_id = l.vec_id
      JOIN probes p ON l.label = p.label
      WHERE a.vec_id <> p.qid
    )""",
        """adcd AS (
      SELECT c.qid, c.vec_id, c.m AS m, qd.dd AS dd
      FROM cand c JOIN qd ON c.qid = qd.qid AND c.m = qd.m
                         AND c.code = qd.code
    )""",
        f"""adc AS (SELECT qid, vec_id, {msum} AS dist
            FROM adcd GROUP BY qid, vec_id)""",
        f"""adct AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM adc) WHERE rk <= {PQ_TOPK})""",
        f"""exd AS (
      SELECT q.vec_id AS qid, v.vec_id, q.m AS m,
             {_SQL_PQ_L2.format(a="q.sv", b="v.sv", n=PQ_SUBDIM)} AS dd
      FROM sv q JOIN sv v ON q.m = v.m AND v.vec_id <> q.vec_id
      WHERE q.vec_id IN (SELECT vec_id FROM anch)
    )""",
        f"""ex AS (SELECT qid, vec_id, {msum} AS dist FROM exd GROUP BY qid, vec_id)""",
        f"""ext AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM ex) WHERE rk <= {PQ_TOPK})""",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
    SELECT e.qid,
           CAST(COUNT(ra.vec_id) AS INT) AS hits_res,
           CAST(COUNT(a.vec_id) AS INT) AS hits_raw
    FROM ext e
    LEFT JOIN radct ra ON e.qid = ra.qid AND e.vec_id = ra.vec_id
    LEFT JOIN adct a ON e.qid = a.qid AND e.vec_id = a.vec_id
    GROUP BY e.qid ORDER BY e.qid
    """
    )


@register(
    "q_ann_ivf_pq_residual",
    _ivfpq_residual_oracle_sql(),
    doc=f"RESIDUAL IVFADC (Jégou TPAMI 2011 §III): codebooks trained on "
    "x − c(cell) residuals against the quantized coarse centroids, ADC "
    "against per-probed-cell residualized queries — emitted side by side "
    f"with the non-residual leg's recall hits@{PQ_TOPK} over the SAME "
    f"probed cells (nprobe={IVFPQ_NPROBE}), both value-checked by one "
    "oracle carrying the two unrolled trainer chains. On the fixture's "
    "geometry-free random labels the legs tie statistically; the "
    "residual edge is property-pinned on a constructed clustered corpus "
    "in tests (where raw codebooks waste centroids on the between-cell "
    "spread).",
)
def q_ann_ivf_pq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivfpq_residual_readout(spark, tp(spark, sf_dir, "embeddings"))


def ivfpq_residual_readout(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """The residual-vs-raw IVFADC recall read-out over ANY (vec_id,
    embedding, label) table — split from the registered query so tests
    can drive it with a CONSTRUCTED clustered corpus, where the residual
    variant's recall edge is large and assertable (on the fixture's
    geometry-free random labels the two legs are statistically tied —
    the honest read-out the registered query records)."""
    out, sv, rsv = ivfpq_residual_plan(spark, emb)
    return materialize_small(spark, out, sv, rsv)


def ivfpq_residual_plan(
    spark: SparkSession, emb: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Lazy (result, persisted raw sv, persisted residual sv) — split so
    plan tests can assert on the full residual composition."""
    from pyspark.storagelevel import StorageLevel

    sv, cents = _pq_loop(spark, emb.select("vec_id", "embedding"))
    cdf = spark.createDataFrame(cents, "m int, code int, cu array<double>")
    lbl = emb.select("vec_id", "label")
    svl = sv.join(lbl, "vec_id")
    cci = pq_coarse_centroids_int(svl)  # |cells|·M rows — always broadcast
    rsv = (
        svl.join(F.broadcast(cci.withColumnRenamed("cu", "ccu")), ["label", "m"])
        .select(
            "vec_id",
            "m",
            F.zip_with("sv", "ccu", lambda x, y: x - y).alias("sv"),
        )
        .persist(StorageLevel.DISK_ONLY)
    )
    rcents = _pq_train_sv(spark, rsv)
    rcdf = spark.createDataFrame(rcents, "m int, code int, cu array<double>")
    anchor_ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(PQ_QUERIES).collect()
    ]
    q = sv.where(F.col("vec_id").isin(anchor_ids)).select(
        F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv")
    )
    # coarse prune against the INT-rounded centroids (the representation
    # the residuals subtract — one consistent coarse quantizer)
    wprobe = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("label"))
    probes = (
        F.broadcast(q)
        .join(F.broadcast(cci), "m")
        .select("qid", "label", "m", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd"))
        .groupBy("qid", "label")
        .agg(_pq_fixed_order_dist())
        .withColumn("prk", F.row_number().over(wprobe))
        .where(F.col("prk") <= IVFPQ_NPROBE)
        .select("qid", "label")
    )
    # residualized queries per probed cell; residual ADC lookup
    # (Q·nprobe·M·K rows — broadcast)
    qr = (
        F.broadcast(probes)
        .join(F.broadcast(q), "qid")
        .join(F.broadcast(cci.withColumnRenamed("cu", "ccu")), ["label", "m"])
        .select(
            "qid",
            "label",
            "m",
            F.zip_with("qsv", "ccu", lambda x, y: x - y).alias("rv"),
        )
    )
    rqd = (
        F.broadcast(qr)
        .join(F.broadcast(rcdf), "m")
        .select(
            "qid", "label", "m", "code", _pq_l2(F.col("rv"), F.col("cu")).alias("dd")
        )
    )
    radcd = (
        pq_assign(rsv, rcdf)
        .join(lbl, "vec_id")
        .join(F.broadcast(probes), "label")
        .where(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(rqd), ["qid", "label", "m", "code"])
        .select("qid", "vec_id", "m", "dd")
    )
    topw = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))

    def topk(dists: DataFrame) -> DataFrame:
        return (
            dists.withColumn("rk", F.row_number().over(topw))
            .where(F.col("rk") <= PQ_TOPK)
            .select("qid", "vec_id")
        )

    radct = topk(radcd.groupBy("qid", "vec_id").agg(_pq_fixed_order_dist())).select(
        F.col("qid").alias("rqid"), F.col("vec_id").alias("rneighbor")
    )
    # non-residual leg over the SAME probed cells
    qd = (
        F.broadcast(q)
        .join(F.broadcast(cdf), "m")
        .select("qid", "m", "code", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd"))
    )
    adcd = (
        pq_assign(sv, cdf)
        .join(lbl, "vec_id")
        .join(F.broadcast(probes), "label")
        .where(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(qd), ["qid", "m", "code"])
        .select("qid", "vec_id", "m", "dd")
    )
    adct = topk(adcd.groupBy("qid", "vec_id").agg(_pq_fixed_order_dist())).select(
        F.col("qid").alias("aqid"), F.col("vec_id").alias("aneighbor")
    )
    # exact reference
    exd = (
        F.broadcast(q)
        .join(sv, "m")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "m", _pq_l2(F.col("qsv"), F.col("sv")).alias("dd"))
    )
    ext = topk(exd.groupBy("qid", "vec_id").agg(_pq_fixed_order_dist()))
    out = (
        ext.join(
            radct,
            (F.col("qid") == F.col("rqid"))
            & (F.col("vec_id") == F.col("rneighbor")),
            "left",
        )
        .join(
            adct,
            (F.col("qid") == F.col("aqid"))
            & (F.col("vec_id") == F.col("aneighbor")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count("rneighbor").cast("int").alias("hits_res"),
            F.count("aneighbor").cast("int").alias("hits_raw"),
        )
        .orderBy("qid")
    )
    return out, sv, rsv


# --------------------------------------------------------------------------
# Persisted RESIDUAL IVFADC serving (round 13, completing the matrix): the
# r12 persisted-serving story (durable artifacts, coarse prune as a
# literal partition filter on the code scan) applied to the r13 residual
# variant — i.e. the index layout a production vector store actually
# ships: INT-quantized cell centroids, residual-trained codebooks, and
# residual codes partitioned by cell. A probe loads three KB-to-MB
# artifacts, prunes the code scan to its nprobe cells' directories, and
# ADCs against per-cell residualized lookups. Bit-identical to the
# in-memory residual composition (Q20 ints + parquet doubles round-trip
# exactly), so the oracle is the shared residual CTE chain ranked to
# top-k.
# --------------------------------------------------------------------------

_pq_residual_index_paths: dict[tuple, tuple[str, str, str]] = {}


def pq_residual_index_path(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, str]:
    """Build (once per session+fixture) the persisted RESIDUAL PQ index;
    return (codebooks_path, codes_path, cells_path). codebooks: residual
    (m, code, cu). codes: (vec_id, m, code) of the RESIDUAL assignment,
    partitioned by label. cells: the INT-rounded coarse centroids
    (label, m, cu) — both the prune table and the residualizer."""
    import os
    import re

    from pyspark.storagelevel import StorageLevel

    key = (session_key(spark), sf_dir)
    if key not in _pq_residual_index_paths:
        base = work_dir("pq_res_index_" + re.sub(r"\W+", "_", sf_dir))
        cb_path = os.path.join(base, "codebooks")
        codes_path = os.path.join(base, "codes")
        cells_path = os.path.join(base, "cells")
        emb = tp(spark, sf_dir, "embeddings")
        sv = (
            _pq_subvectors(emb.select("vec_id", "embedding"))
            .repartition(spark.sparkContext.defaultParallelism)
            .persist(StorageLevel.DISK_ONLY)
        )
        lbl = emb.select("vec_id", "label")
        cci = pq_coarse_centroids_int(sv.join(lbl, "vec_id"))
        rsv = (
            sv.join(lbl, "vec_id")
            .join(F.broadcast(cci.withColumnRenamed("cu", "ccu")), ["label", "m"])
            .select(
                "vec_id",
                "m",
                F.zip_with("sv", "ccu", lambda x, y: x - y).alias("sv"),
            )
            .persist(StorageLevel.DISK_ONLY)
        )
        rcents = _pq_train_sv(spark, rsv)
        rcdf = spark.createDataFrame(rcents, "m int, code int, cu array<double>")
        rcdf.write.mode("overwrite").parquet(cb_path)
        cci.write.mode("overwrite").parquet(cells_path)
        (
            pq_assign(rsv, rcdf)
            .join(lbl, "vec_id")
            .write.mode("overwrite")
            .partitionBy("label")
            .parquet(codes_path)
        )
        sv.unpersist()
        rsv.unpersist()
        _pq_residual_index_paths[key] = (cb_path, codes_path, cells_path)
    return _pq_residual_index_paths[key]


def residualize_sv(svl: DataFrame, cells: DataFrame) -> DataFrame:
    """(vec_id, m, sv) residual subvectors: subtract the INT cell centroid
    per (label, m). svl: (vec_id, m, sv, label); cells: (label, m, cu) —
    |cells|·M rows, always broadcast. Exact-int arithmetic (Q20 ints minus
    floor'd-int centroids), so every downstream argmin is engine-portable."""
    return svl.join(
        F.broadcast(cells.withColumnRenamed("cu", "ccu")), ["label", "m"]
    ).select(
        "vec_id", "m", F.zip_with("sv", "ccu", lambda x, y: x - y).alias("sv")
    )


def pq_residual_encode(
    batch: DataFrame, cells: DataFrame, rcdf: DataFrame
) -> DataFrame:
    """Encode a (vec_id, embedding, label) batch against FROZEN residual
    artifacts: subvectorize, residualize against the INT cell centroids,
    argmin against the residual codebooks — (vec_id, m, code, label).
    The ingest-side encode of the residual index (bit-identical to the
    build in pq_residual_index_path: same subvector build, same
    residualize join, same pq_assign argmin), shared by the residual
    grow fold, the compaction fixture, and the coarse refresh."""
    lbl = batch.select("vec_id", "label")
    svl = _pq_subvectors(batch.select("vec_id", "embedding")).join(lbl, "vec_id")
    return pq_assign(residualize_sv(svl, cells), rcdf).join(lbl, "vec_id")


def residual_probe_tables(
    q: DataFrame, rcdf: DataFrame, cells: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """The query-side tables of every residual ADC probe: the coarse
    prune against the INT cell centroids (probes: qid, label — a bounded
    collect rebuilt as a local relation, since every caller reuses it at
    least twice) and the per-(query, probed cell) residualized ADC
    lookup (rqd: Q·nprobe·M·K rows — broadcast). q: (qid, m, qsv)."""
    wprobe = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("label"))
    probes_plan = (
        F.broadcast(q)
        .join(F.broadcast(cells), "m")
        .select("qid", "label", "m", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd"))
        .groupBy("qid", "label")
        .agg(_pq_fixed_order_dist())
        .withColumn("prk", F.row_number().over(wprobe))
        .where(F.col("prk") <= IVFPQ_NPROBE)
        .select("qid", "label")
    )
    # Bounded by contract: ≤ Q·nprobe rows — collected once and rebuilt
    # as a local relation (see pq_probe_tables; same two-job saving).
    probes = q.sparkSession.createDataFrame(
        probes_plan.collect(), probes_plan.schema
    )
    qr = (
        F.broadcast(probes)
        .join(F.broadcast(q), "qid")
        .join(F.broadcast(cells.withColumnRenamed("cu", "ccu")), ["label", "m"])
        .select(
            "qid",
            "label",
            "m",
            F.zip_with("qsv", "ccu", lambda x, y: x - y).alias("rv"),
        )
    )
    rqd = (
        F.broadcast(qr)
        .join(F.broadcast(rcdf), "m")
        .select(
            "qid", "label", "m", "code", _pq_l2(F.col("rv"), F.col("cu")).alias("dd")
        )
    )
    return probes, rqd


def residual_adc_rank(
    codes: DataFrame, probes: DataFrame, rqd: DataFrame
) -> DataFrame:
    """ADC top-PQ_TOPK over a residual code table (vec_id, m, code,
    label): candidates restricted to each query's probed cells, distances
    summed in fixed m-order — the probe body shared by the persisted
    residual serving, the grown-index probe, and the refresh/compaction
    equivalence checks."""
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        codes.join(F.broadcast(probes), "label")
        .where(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(rqd), ["qid", "label", "m", "code"])
        .select("qid", "vec_id", "m", "dd")
        .groupBy("qid", "vec_id")
        .agg(_pq_fixed_order_dist())
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= PQ_TOPK)
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("qid", "rk")
    )


def residual_probe_topk(
    q: DataFrame, rcdf: DataFrame, cells: DataFrame, codes: DataFrame
) -> DataFrame:
    """Full residual probe over an in-memory code table: prune to the
    probed labels (a bounded collect — the persisted serving path turns
    the same literal into a parquet PARTITION filter), then ADC-rank."""
    probes, rqd = residual_probe_tables(q, rcdf, cells)
    probed = sorted(
        {r["label"] for r in probes.select("label").distinct().collect()}
    )
    return residual_adc_rank(
        codes.where(F.col("label").isin(probed)), probes, rqd
    )


def _ivfpq_residual_serve_oracle() -> str:
    """The residual serving chain ranked to top-k: only the CTEs the
    serving path needs (raw ev/sv for the query side, residual trainer,
    probe pipeline) — no raw-codebook or exact legs."""
    raw = _pq_train_ctes()
    ctes = [raw[0], raw[1]]  # ev + sv (the Q20 subvector build)
    ctes += _pq_train_ctes(pfx="r", base=_ivfpq_residual_base_ctes())
    ctes += _ivfpq_residual_probe_ctes()
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM radc) WHERE rk <= {PQ_TOPK}
    ORDER BY qid, rk
    """
    )


@register(
    "q_ann_ivf_pq_residual_persisted",
    _ivfpq_residual_serve_oracle(),
    # bench extended set (round 14, VERDICT r13 item 7): the residual
    # serving path — the layout a production store actually ships — gets
    # a per-round trend line next to q_ann_ivf_pq_persisted; NOT in the
    # frozen legacy-14 set.
    headline=True,
    doc=f"RESIDUAL IVF-PQ serving over the DURABLE residual index "
    "(residual codebooks + INT cell centroids + cell-partitioned "
    "residual codes): coarse prune against the persisted centroids, the "
    "probed labels PARTITION-PRUNE the code scan (bounded collect, "
    f"≤ Q·nprobe values), ADC against per-cell residualized lookups — "
    f"top-{PQ_TOPK} per query, bit-identical to the in-memory residual "
    "composition (shared residual oracle chain). The partition filter "
    "is pinned in tests/test_plans.py.",
)
def q_ann_ivf_pq_residual_persisted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cb_path, codes_path, cells_path = pq_residual_index_path(spark, sf_dir)
    rcdf = spark.read.parquet(cb_path)
    cells = spark.read.parquet(cells_path)
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    anchor_ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(PQ_QUERIES).collect()
    ]
    # query-side subvectors only — corpus quantization lives in the index
    q = _pq_subvectors(emb.where(F.col("vec_id").isin(anchor_ids))).select(
        F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv")
    )
    probes, rqd = residual_probe_tables(q, rcdf, cells)
    # bounded: ≤ Q·nprobe labels — becomes a literal IN partition filter
    probed_labels = sorted(
        {r["label"] for r in probes.select("label").distinct().collect()}
    )
    pruned_codes = spark.read.parquet(codes_path).where(
        F.col("label").isin(probed_labels)
    )
    return residual_adc_rank(pruned_codes, probes, rqd)


# --------------------------------------------------------------------------
# nprobe sweep (round 13): the recall-vs-cost TUNING CURVE an IVF-PQ
# deployment runs before fixing its serving knob — for nprobe = 1..K,
# how many candidates does the coarse prune admit and how much exact-
# top-k recall do they buy? The dedup family already has this discipline
# (q_dedup_threshold_sweep); this is its ANN sibling. One pass computes
# everything: probes keep their rank (prk), every candidate inherits its
# cell's prk (a vector lives in exactly ONE cell), and cutoff k's
# candidate set is simply prk <= k — so the sweep re-ranks per cutoff
# without re-scanning or re-coding anything.
#
# Scale: identical shapes to q_ann_ivf_pq (broadcast centroids/lookup,
# candidates only from probed cells); the sweep multiplies only the
# final bounded per-query rankings (K window passes over ≤ |probed
# candidates| rows), not the scan.
# --------------------------------------------------------------------------

IVFPQ_SWEEP_MAX = 4


def _ivfpq_nprobe_sweep_oracle() -> str:
    msum = _sql_pq_msum()
    ctes = _pq_train_ctes()
    ctes += [
        """lbl AS (SELECT vec_id, label FROM embeddings)""",
        f"""anch AS (SELECT DISTINCT vec_id FROM sv ORDER BY vec_id LIMIT {PQ_QUERIES})""",
        """ccm AS (
      SELECT l.label, e.m, e.dl, CAST(SUM(e.eq) AS DOUBLE) / COUNT(*) AS c
      FROM ev e JOIN lbl l ON e.vec_id = l.vec_id
      GROUP BY l.label, e.m, e.dl
    )""",
        """ccv AS MATERIALIZED (
      SELECT label, m, list(c ORDER BY dl) AS cu FROM ccm GROUP BY label, m
    )""",
        f"""qcd AS (
      SELECT q.vec_id AS qid, c.label, c.m AS m,
             {_SQL_PQ_L2.format(a="q.sv", b="c.cu", n=PQ_SUBDIM)} AS dd
      FROM sv q JOIN ccv c ON q.m = c.m
      WHERE q.vec_id IN (SELECT vec_id FROM anch)
    )""",
        f"""cdist AS (SELECT qid, label, {msum} AS dist FROM qcd GROUP BY qid, label)""",
        f"""probesr AS (
      SELECT qid, label, prk FROM (
        SELECT qid, label,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dist ASC, label) AS prk
        FROM cdist) WHERE prk <= {IVFPQ_SWEEP_MAX}
    )""",
        f"""qd AS MATERIALIZED (
      SELECT q.vec_id AS qid, c.m, c.code,
             {_SQL_PQ_L2.format(a="q.sv", b="c.cu", n=PQ_SUBDIM)} AS dd
      FROM sv q JOIN c{PQ_ITERS} c ON q.m = c.m
      WHERE q.vec_id IN (SELECT vec_id FROM anch)
    )""",
        """candr AS (
      SELECT p.qid, a.vec_id, a.m, a.code, p.prk
      FROM afinal a JOIN lbl l ON a.vec_id = l.vec_id
      JOIN probesr p ON l.label = p.label
      WHERE a.vec_id <> p.qid
    )""",
        """adcdr AS (
      SELECT c.qid, c.vec_id, c.prk, c.m AS m, qd.dd AS dd
      FROM candr c JOIN qd ON c.qid = qd.qid AND c.m = qd.m
                          AND c.code = qd.code
    )""",
        f"""adcr AS MATERIALIZED (
      SELECT qid, vec_id, prk, {msum} AS dist
      FROM adcdr GROUP BY qid, vec_id, prk
    )""",
        f"""exd AS (
      SELECT q.vec_id AS qid, v.vec_id, q.m AS m,
             {_SQL_PQ_L2.format(a="q.sv", b="v.sv", n=PQ_SUBDIM)} AS dd
      FROM sv q JOIN sv v ON q.m = v.m AND v.vec_id <> q.vec_id
      WHERE q.vec_id IN (SELECT vec_id FROM anch)
    )""",
        f"""ex AS (SELECT qid, vec_id, {msum} AS dist FROM exd GROUP BY qid, vec_id)""",
        f"""ext AS MATERIALIZED (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM ex) WHERE rk <= {PQ_TOPK})""",
    ]
    legs = []
    for k in range(1, IVFPQ_SWEEP_MAX + 1):
        ctes.append(
            f"""adct{k} AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM adcr WHERE prk <= {k}) WHERE rk <= {PQ_TOPK})"""
        )
        legs.append(
            f"""
    SELECT {k} AS nprobe,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM adcr WHERE prk <= {k})
             AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ext e
            JOIN adct{k} a ON e.qid = a.qid AND e.vec_id = a.vec_id)
             AS hits_at_{PQ_TOPK}"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + " UNION ALL ".join(legs)
        + "\n    ORDER BY nprobe"
    )


@register(
    "q_ann_ivf_pq_nprobe_sweep",
    _ivfpq_nprobe_sweep_oracle(),
    doc=f"IVF-PQ nprobe TUNING CURVE: for nprobe = 1..{IVFPQ_SWEEP_MAX}, "
    "the admitted candidate count and the exact-top-k recall those "
    "candidates buy — computed in ONE pass (probes keep their rank, each "
    "candidate inherits its cell's rank, cutoff k re-ranks the prk <= k "
    "subset) — the knob read-out a deployment runs before fixing its "
    "serving nprobe; the ANN sibling of q_dedup_threshold_sweep.",
)
def q_ann_ivf_pq_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, sv = ivfpq_nprobe_sweep_plan(spark, sf_dir)
    # bounded (IVFPQ_SWEEP_MAX rows): collect + release the sv persist
    return materialize_small(spark, out, sv)


def ivfpq_nprobe_sweep_plan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Lazy (sweep result, persisted sv) — split for the plan pins."""
    emb = tp(spark, sf_dir, "embeddings")
    sv, cents = _pq_loop(spark, emb.select("vec_id", "embedding"))
    cdf = spark.createDataFrame(cents, "m int, code int, cu array<double>")
    lbl = emb.select("vec_id", "label")
    coded = pq_assign(sv, cdf).join(lbl, "vec_id")
    coarse = pq_coarse_centroids(sv.join(lbl, "vec_id"))
    anchor_ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(PQ_QUERIES).collect()
    ]
    q = sv.where(F.col("vec_id").isin(anchor_ids)).select(
        F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv")
    )
    wprobe = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("label"))
    probesr = (
        F.broadcast(q)
        .join(F.broadcast(coarse), "m")
        .select("qid", "label", "m", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd"))
        .groupBy("qid", "label")
        .agg(_pq_fixed_order_dist())
        .withColumn("prk", F.row_number().over(wprobe))
        .where(F.col("prk") <= IVFPQ_SWEEP_MAX)
        .select("qid", "label", "prk")
    )
    qd = (
        F.broadcast(q)
        .join(F.broadcast(cdf), "m")
        .select("qid", "m", "code", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd"))
    )
    adcr = (
        coded.join(F.broadcast(probesr), "label")
        .where(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(qd), ["qid", "m", "code"])
        .select("qid", "vec_id", "prk", "m", "dd")
        .groupBy("qid", "vec_id", "prk")
        .agg(_pq_fixed_order_dist())
        # re-ranked IVFPQ_SWEEP_MAX times below; tiny (≤ probed candidates)
        .localCheckpoint(eager=True)
    )
    topw = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))
    exd = (
        F.broadcast(q)
        .join(sv, "m")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "m", _pq_l2(F.col("qsv"), F.col("sv")).alias("dd"))
    )
    ext = (
        exd.groupBy("qid", "vec_id")
        .agg(_pq_fixed_order_dist())
        .withColumn("rk", F.row_number().over(topw))
        .where(F.col("rk") <= PQ_TOPK)
        .select("qid", "vec_id")
        .localCheckpoint(eager=True)
    )
    legs = []
    for k in range(1, IVFPQ_SWEEP_MAX + 1):
        sub = adcr.where(F.col("prk") <= k)
        adct = (
            sub.withColumn("rk", F.row_number().over(topw))
            .where(F.col("rk") <= PQ_TOPK)
            .select("qid", "vec_id")
        )
        legs.append(
            adct.join(ext, ["qid", "vec_id"])
            .agg(F.count("*").cast("bigint").alias(f"hits_at_{PQ_TOPK}"))
            .crossJoin(
                sub.agg(F.count("*").cast("bigint").alias("n_candidates"))
            )
            .select(
                F.lit(k).alias("nprobe"),
                "n_candidates",
                f"hits_at_{PQ_TOPK}",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("nprobe"), sv


# --------------------------------------------------------------------------
# Two-stage IVF-PQ serving with exact re-ranking (round 14, beyond the
# brief): the accuracy-restoration step production IVFADC deployments run
# (Jégou TPAMI 2011 §III-D "re-ranking with source coding"): the
# compressed-domain ADC pass produces a SHORTLIST of R > k candidates,
# then exact distances are computed against the RAW vectors of only those
# R candidates, and the final top-k comes from the exact re-rank. ADC
# errors that shuffle ranks within the shortlist are repaired for free;
# only true shortlist misses remain.
#
# Scale: stage 1 is the standard bounded IVF-pruned ADC probe (broadcast
# lookups, candidates only from probed cells); stage 2 touches the raw
# vectors of Q·R candidates only — point lookups in a production store;
# here a broadcast semi-join of the Q·R-row shortlist against one
# subvector scan (constant output, never corpus-proportional). The knob
# REFINE_R trades stage-2 reads for recall exactly like nprobe trades
# stage-1 scans — the two curves compose.
# --------------------------------------------------------------------------

REFINE_R = 2 * PQ_TOPK  # ADC shortlist size handed to the exact re-rank


def _ivfpq_refine_oracle() -> str:
    msum = _sql_pq_msum()
    return (
        _ivfpq_common_ctes()
        + f""",
    shortl AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM adc) WHERE rk <= {REFINE_R}),
    rexd AS (
      SELECT s.qid, s.vec_id, v.m,
             {_SQL_PQ_L2.format(a="q.sv", b="v.sv", n=PQ_SUBDIM)} AS dd
      FROM shortl s
      JOIN sv v ON v.vec_id = s.vec_id
      JOIN sv q ON q.vec_id = s.qid AND q.m = v.m
    ),
    rex AS (SELECT qid, vec_id, {msum} AS dist
            FROM rexd GROUP BY qid, vec_id)
    SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM rex) WHERE rk <= {PQ_TOPK}
    ORDER BY qid, rk
    """
    )


@register(
    "q_ann_ivf_pq_refine",
    _ivfpq_refine_oracle(),
    doc=f"two-stage IVF-PQ serving with EXACT RE-RANKING (Jégou TPAMI "
    f"2011 §III-D): the IVF-pruned ADC pass keeps a top-{REFINE_R} "
    "shortlist per query, exact subspace-L2 runs against the RAW vectors "
    f"of only those candidates (a Q·R broadcast semi-join — point "
    f"lookups at scale), and the final top-{PQ_TOPK} comes from the "
    "exact re-rank; repairs in-shortlist ADC rank errors at a bounded "
    "stage-2 read cost — the accuracy knob that composes with nprobe.",
)
def q_ann_ivf_pq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    cb_path, codes_path, cells_path = pq_index_path(spark, sf_dir)
    cdf = spark.read.parquet(cb_path)
    cells = spark.read.parquet(cells_path)
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    anchor_ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(PQ_QUERIES).collect()
    ]
    q = _pq_subvectors(emb.where(F.col("vec_id").isin(anchor_ids))).select(
        F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv")
    )
    # stage 1: the persisted-serving probe, ranked to a top-R shortlist
    wprobe = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("label"))
    probes = (
        F.broadcast(q)
        .join(F.broadcast(cells), "m")
        .select("qid", "label", "m", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd"))
        .groupBy("qid", "label")
        .agg(_pq_fixed_order_dist())
        .withColumn("prk", F.row_number().over(wprobe))
        .where(F.col("prk") <= IVFPQ_NPROBE)
        .select("qid", "label")
        .localCheckpoint(eager=True)
    )
    probed_labels = sorted(
        {r["label"] for r in probes.select("label").distinct().collect()}
    )
    pruned_codes = spark.read.parquet(codes_path).where(
        F.col("label").isin(probed_labels)
    )
    qd = (
        F.broadcast(q)
        .join(F.broadcast(cdf), "m")
        .select("qid", "m", "code", _pq_l2(F.col("qsv"), F.col("cu")).alias("dd"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))
    shortlist = (
        pruned_codes.join(F.broadcast(probes), "label")
        .where(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(qd), ["qid", "m", "code"])
        .select("qid", "vec_id", "m", "dd")
        .groupBy("qid", "vec_id")
        .agg(_pq_fixed_order_dist())
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= REFINE_R)
        .select("qid", "vec_id")
        .localCheckpoint(eager=True)  # Q·R rows — both re-rank inputs
    )
    # stage 2: exact subspace-L2 against ONLY the shortlisted vectors'
    # raw subvectors (broadcast Q·R pairs against one subvector scan)
    csv = _pq_subvectors(emb).join(F.broadcast(shortlist), "vec_id")
    return (
        csv.join(
            F.broadcast(q), ["qid", "m"]
        )
        .select(
            "qid", "vec_id", "m", _pq_l2(F.col("qsv"), F.col("sv")).alias("dd")
        )
        .groupBy("qid", "vec_id")
        .agg(_pq_fixed_order_dist())
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= PQ_TOPK)
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("qid", "rk")
    )


# --------------------------------------------------------------------------
# Coarse-quantizer refresh / incremental re-index (round 14, VERDICT r13
# missing 3): after enough growth the FROZEN cell centroids the index was
# built against drift from the data — the drift detector already exists
# (q_embedding_centroid_drift); this is its APPLY step, the production
# re-index a vector store runs in its maintenance window. The story:
#
#   stale state   cell centroids cci_h computed over the ORIGINAL half of
#                 the corpus (even vec_ids) + residual codebooks trained
#                 on that half's residuals; the index then GREW — every
#                 vector (old and new) is encoded against those frozen
#                 artifacts (the q_stream_pq_index_grow discipline).
#   refresh       recompute the INT cell centroids over the FULL corpus
#                 (cci_f); a cell whose INT centroid is UNCHANGED has
#                 bit-identical residuals, so its codes are reused
#                 BYTE-UNTOUCHED (file-level copy, never re-encoded);
#                 only the changed cells' vectors are re-encoded — then
#                 the new layout swaps in atomically (staged-rename, the
#                 manifest discipline; the live index's files are
#                 stat-pinned untouched until the swap).
#   proof         the query RAISES unless the incremental result's probe
#                 is bit-identical to a FULL re-encode of the corpus
#                 against (cci_f, frozen codebooks) — re-encoding only
#                 moved cells must be indistinguishable from re-encoding
#                 everything. The probe itself is value-checked by an
#                 oracle carrying the half-corpus trainer chain and the
#                 full-corpus re-encode; n_moved / n_total /
#                 n_changed_cells ride along as checked values.
#
# Residual codebooks stay FROZEN through the refresh (retraining them
# would invalidate every code and make the re-index O(corpus) always —
# codebook refresh is the q_embedding_centroid_drift -> full-rebuild
# escalation, a different maintenance tier). INT-quantized centroids are
# what make "unchanged cell" a meaningful, engine-portable predicate: a
# real system quantizes the coarse reconstruction for exactly this
# stability (plus storage) reason.
#
# Scale: the refresh touches (a) one centroid aggregate over the corpus
# (the same one-pass groupBy every build runs), (b) re-encode of ONLY the
# moved cells' vectors (worst case O(corpus), typical a small fraction),
# (c) file-level copies of unchanged cells' partitions (metadata-rate at
# an object store: server-side copy/rename). The equivalence comparator
# is a test-time assertion the fixture affords; a 100 TB deployment runs
# the refresh without it.
# --------------------------------------------------------------------------


def _pq_coarse_refresh_oracle() -> str:
    l2 = _SQL_PQ_L2.format(a="v.sv", b="c.cu", n=PQ_SUBDIM)
    raw = _pq_train_ctes()
    half_base = [
        """lbl AS (SELECT vec_id, label FROM embeddings)""",
        """hev AS (SELECT * FROM ev WHERE vec_id % 2 = 0)""",
        """ccih AS MATERIALIZED (
      SELECT l.label, e.m, e.dl,
             CAST(floor(CAST(SUM(e.eq) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cq
      FROM hev e JOIN lbl l ON e.vec_id = l.vec_id
      GROUP BY l.label, e.m, e.dl
    )""",
        """rev AS MATERIALIZED (
      SELECT e.vec_id, e.m, e.dl, e.eq - c.cq AS eq
      FROM hev e JOIN lbl l ON e.vec_id = l.vec_id
      JOIN ccih c ON c.label = l.label AND c.m = e.m AND c.dl = e.dl
    )""",
    ]
    ctes = [raw[0], raw[1]]  # ev + sv (the raw Q20 subvector build)
    # residual trainer over the HALF corpus's residuals (the frozen rcdf)
    ctes += _pq_train_ctes(pfx="r", base=half_base)
    ctes += [
        # refreshed centroids over the FULL corpus (named cci so the
        # shared probe CTEs prune/residualize against them)
        """cci AS MATERIALIZED (
      SELECT l.label, e.m, e.dl,
             CAST(floor(CAST(SUM(e.eq) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cq
      FROM ev e JOIN lbl l ON e.vec_id = l.vec_id
      GROUP BY l.label, e.m, e.dl
    )""",
        # full re-encode against (cci_f, frozen rc{N}) — what the
        # incremental refresh must be bit-identical to
        """revf AS MATERIALIZED (
      SELECT e.vec_id, e.m, e.dl, e.eq - c.cq AS eq
      FROM ev e JOIN lbl l ON e.vec_id = l.vec_id
      JOIN cci c ON c.label = l.label AND c.m = e.m AND c.dl = e.dl
    )""",
        """rsvf AS MATERIALIZED (
      SELECT vec_id, m, list(CAST(eq AS DOUBLE) ORDER BY dl) AS sv
      FROM revf GROUP BY vec_id, m
    )""",
        f"""rall AS MATERIALIZED (
      SELECT vec_id, m, code FROM (
        SELECT v.vec_id, v.m, c.code,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.m
                                  ORDER BY {l2} ASC, c.code) AS rk
        FROM rsvf v JOIN rc{PQ_ITERS} c ON v.m = c.m
      ) WHERE rk = 1
    )""",
    ]
    ctes += _ivfpq_residual_probe_ctes(codes_cte="rall")
    ctes += [
        """chg AS (
      SELECT DISTINCT f.label FROM cci f
      JOIN ccih h ON f.label = h.label AND f.m = h.m AND f.dl = h.dl
      WHERE f.cq <> h.cq
    )""",
        """mv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_moved FROM lbl
              WHERE label IN (SELECT label FROM chg))""",
        """tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM lbl)""",
        """nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_changed_cells FROM chg)""",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT t.qid, t.neighbor_id, t.rk,
           m.n_moved, o.n_total, c.n_changed_cells
    FROM (
      SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dist ASC, vec_id) AS rk
        FROM radc) WHERE rk <= {PQ_TOPK}
    ) t, mv m, tot o, nc c
    ORDER BY t.qid, t.rk
    """
    )


@register(
    "q_pq_coarse_refresh",
    _pq_coarse_refresh_oracle(),
    doc="coarse-quantizer REFRESH with incremental re-index: a residual "
    "index built against stale cell centroids (trained on the original "
    "even-id half, then grown to the whole corpus with frozen artifacts) "
    "is refreshed by recomputing the INT cell centroids over the full "
    "corpus and re-encoding ONLY the cells whose centroid moved — "
    "unchanged cells' code files are copied byte-untouched, the new "
    "layout swaps in by staged rename (live files stat-pinned unchanged "
    "until the swap), and the query RAISES unless the refreshed probe is "
    "bit-identical to a full re-encode; emits the probe plus "
    "n_moved/n_total/n_changed_cells. The apply step of "
    "q_embedding_centroid_drift.",
)
def q_pq_coarse_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    return pq_coarse_refresh_readout(spark, emb)


def pq_coarse_refresh_readout(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """The refresh over ANY (vec_id, embedding, label) table — split from
    the registered query so tests can drive it with a CONSTRUCTED corpus
    where only SOME cells' centroids move (the fixture's half-vs-full
    means shift nearly every cell, so the moved-subset arithmetic is only
    assertable on constructed geometry)."""
    import os as _os
    import shutil as _shutil

    from pyspark.storagelevel import StorageLevel

    lbl = emb.select("vec_id", "label")
    sv = (
        _pq_subvectors(emb.select("vec_id", "embedding"))
        .repartition(spark.sparkContext.defaultParallelism)
        .persist(StorageLevel.DISK_ONLY)
    )
    svl = sv.join(lbl, "vec_id")
    half = svl.where(F.col("vec_id") % 2 == 0)

    # stale artifacts: centroids + residual codebooks from the even half
    cci_h = pq_coarse_centroids_int(half)
    rsv_h = (
        residualize_sv(half, cci_h)
        .repartition(spark.sparkContext.defaultParallelism)
        .persist(StorageLevel.DISK_ONLY)
    )
    rcents = _pq_train_sv(spark, rsv_h)
    rcdf = spark.createDataFrame(rcents, "m int, code int, cu array<double>")

    # the grown index: EVERY vector encoded against the stale artifacts
    state = work_dir("pq_refresh_index")
    current = _os.path.join(state, "current")
    (
        pq_assign(residualize_sv(svl, cci_h), rcdf)
        .join(lbl, "vec_id")
        .write.mode("overwrite")
        .partitionBy("label")
        .parquet(current)
    )

    # refresh: new INT centroids over the full corpus; changed = any
    # (m, dim) differs. Both tables are |cells|·M rows — bounded collects.
    cci_f = pq_coarse_centroids_int(svl)

    def by_label(rows) -> dict[int, dict[int, tuple]]:
        out: dict[int, dict[int, tuple]] = {}
        for r in rows:
            out.setdefault(r["label"], {})[r["m"]] = tuple(r["cu"])
        return out

    h_map = by_label(cci_h.collect())
    f_map = by_label(cci_f.collect())
    missing = sorted(set(f_map) - set(h_map))
    if missing:
        # a cell with no vectors in the original half has no stale
        # centroid — its vectors could never have been encoded, so the
        # premise (a grown index over frozen artifacts) is violated
        raise AssertionError(f"cells absent from the stale index: {missing}")
    changed = sorted(lb for lb in f_map if f_map[lb] != h_map[lb])
    n_changed_cells = len(changed)

    # stat-pin the live index: no file may change before the swap
    def stat_map(root: str) -> dict[str, tuple[int, int]]:
        out = {}
        for r, _, files in _os.walk(root):
            for fn in files:
                p = _os.path.join(r, fn)
                st = _os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
        return out

    pre_stats = stat_map(current)

    staged = _os.path.join(state, "staged")
    _shutil.rmtree(staged, ignore_errors=True)
    _os.makedirs(staged, exist_ok=True)
    if changed:
        # re-encode ONLY the moved cells' vectors against the fresh
        # centroids (codebooks frozen)
        (
            pq_residual_encode(
                emb.where(F.col("label").isin(changed)), cci_f, rcdf
            )
            .write.mode("overwrite")
            .partitionBy("label")
            .parquet(staged)
        )
    # unchanged cells: file-level copy, never re-encoded (at an object
    # store this is a server-side copy/rename — metadata-rate)
    for d in _os.listdir(current):
        if d.startswith("label=") and int(d.split("=", 1)[1]) not in changed:
            _shutil.copytree(
                _os.path.join(current, d), _os.path.join(staged, d)
            )

    post_stats = stat_map(current)
    if post_stats != pre_stats:
        raise AssertionError("live index files changed before the swap")
    retired = current + "_retired"
    _shutil.rmtree(retired, ignore_errors=True)
    _os.replace(current, retired)
    _os.replace(staged, current)
    _shutil.rmtree(retired, ignore_errors=True)

    # probe the refreshed index; RAISE unless bit-identical to a full
    # re-encode against (cci_f, frozen codebooks)
    anchor_ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(PQ_QUERIES).collect()
    ]
    q = sv.where(F.col("vec_id").isin(anchor_ids)).select(
        F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv")
    )
    refreshed = spark.read.parquet(current)
    probe = residual_probe_topk(q, rcdf, cci_f, refreshed)
    full = residual_probe_topk(q, rcdf, cci_f, pq_residual_encode(emb, cci_f, rcdf))
    probe_rows = probe.collect()
    if sorted(map(tuple, probe_rows)) != sorted(map(tuple, full.collect())):
        raise AssertionError(
            "incremental refresh probe differs from the full re-encode"
        )
    sv.unpersist()
    rsv_h.unpersist()
    n_total = emb.count()
    n_moved = (
        emb.where(F.col("label").isin(changed)).count() if changed else 0
    )
    counts = spark.createDataFrame(
        [(int(n_moved), int(n_total), int(n_changed_cells))],
        "n_moved bigint, n_total bigint, n_changed_cells bigint",
    )
    out = spark.createDataFrame(probe_rows, probe.schema)
    return out.crossJoin(F.broadcast(counts)).orderBy("qid", "rk")


# --------------------------------------------------------------------------
# SQ8 scalar quantization (round 14): the OTHER compressed-domain index
# family production vector stores ship next to PQ (FAISS
# ScalarQuantizer/QT_8bit, Milvus/Lucene int8): each dimension is
# quantized independently to an 8-bit code on a per-dimension [min, max]
# grid trained from the corpus. 4x smaller than float32 with near-exact
# recall at 64 dims — the default first step before PQ's more aggressive
# 16-32x, and the two compose (SQ8 shortlist -> exact re-rank, like
# q_ann_ivf_pq_refine).
#
# Exactness discipline (the lsh_bucket convention): embeddings are first
# quantized to int64 on the shared Q20 grid (floor(x*2^20 + 0.5) — exact
# in any engine), the per-dim [mn, mx] stats and the 0..255 codes are
# integer arithmetic on that grid, and the asymmetric distance is computed
# in a x255 integer space — reconstruction mn*255 + code*rng avoids the
# float step size entirely, so Spark, numpy int64, and DuckDB agree
# bit-for-bit and the oracle value-checks the full top-k, not a rows-only
# shadow. Residual bound per dim: 0 <= qs - recon < rng <= 2^21, so the
# 64-dim squared sum stays < 2^48 — no int64 overflow.
#
# Scale: stats = ONE corpus scan ending in 128 partial-aggregated min/max
# cells (no explode, no shuffle of vectors); encode = a stateless map with
# the 128 grid constants inlined as literals; serving = Arrow-batched
# numpy over the CODED table (4x less I/O than raw), queries in the task
# closure, per-batch top-k, window reduce — the brute-force shape with a
# quarter of the bytes.
# --------------------------------------------------------------------------

SQ8_LEVELS = 255  # codes 0..255 via (e - mn) * 255 div rng
SQ8_DIM = 64


def sq8_stats(
    emb: DataFrame, dim: int = SQ8_DIM, queries_below: int | None = None
) -> tuple[list[int], list[int]] | tuple[list[int], list[int], list]:
    """Per-dimension (mn, rng) on the Q20 integer grid, one corpus scan.

    rng is floored at 1 so constant dimensions encode to 0 instead of
    dividing by zero. Bounded driver transfer: 2*dim int64 cells.

    queries_below: when set, the SAME scan also collects the query
    vectors (vec_id < queries_below — bounded by contract) as a
    collect_list aggregate, and a third element with the
    _collect_query_eq-shaped (vec_id, eq) list is returned — one corpus
    pass instead of two (guide §2.4)."""
    eqd = [
        F.floor(F.element_at("embedding", d + 1).cast("double") * QUANT + F.lit(0.5))
        .cast("bigint")
        for d in range(dim)
    ]
    aggs = [F.min(eqd[d]).alias(f"mn{d}") for d in range(dim)] + [
        F.max(eqd[d]).alias(f"mx{d}") for d in range(dim)
    ]
    if queries_below is not None:
        aggs.append(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("vec_id") < queries_below,
                        F.struct("vec_id", "embedding"),
                    )
                )
            ).alias("qrows")
        )
    row = emb.agg(*aggs).collect()[0]
    mn = [int(row[f"mn{d}"]) for d in range(dim)]
    rng = [max(int(row[f"mx{d}"]) - mn[d], 1) for d in range(dim)]
    if queries_below is None:
        return mn, rng
    queries = []
    for r in row["qrows"]:
        eq = np.floor(
            np.asarray(r["embedding"], dtype=np.float64) * QUANT + 0.5
        ).astype(np.int64)
        queries.append((int(r["vec_id"]), [int(v) for v in eq]))
    return mn, rng, queries


def sq8_encode(
    emb: DataFrame, mn: list[int], rng: list[int], levels: int = SQ8_LEVELS
) -> DataFrame:
    """(vec_id, codes array<int>): JVM-side stateless encode map.

    The 128 grid constants ride as two literal arrays inside ONE
    projection (no per-consumer re-inlining — the encode output feeds
    either a parquet sink or an Arrow boundary). levels=1 with rng=1
    degenerates to the identity grid (codes = e - mn) — the exact leg
    of the recall read-out, kept unscaled so its 64-dim squared sums
    stay far from int64 range."""
    mn_sql = "array(" + ",".join(f"{v}L" for v in mn) + ")"
    rng_sql = "array(" + ",".join(f"{v}L" for v in rng) + ")"
    codes = F.expr(
        f"transform(embedding, (x, i) -> CAST("
        f"((floor(CAST(x AS DOUBLE) * {QUANT} + 0.5D) - element_at({mn_sql}, i + 1))"
        f" * {levels}) DIV element_at({rng_sql}, i + 1) AS INT))"
    )
    keep = [c for c in emb.columns if c != "embedding"]
    return emb.select(*keep, codes.alias("codes"))


def sq8_topk(
    coded: DataFrame,
    queries_eq: list[tuple[int, list[int]]],
    mn: list[int],
    rng: list[int],
    k: int = TOPK,
    levels: int = SQ8_LEVELS,
) -> DataFrame:
    """Asymmetric top-k over the coded corpus: query int grid (x levels)
    vs reconstructed codes, exact int64 numpy per Arrow batch."""
    mn_a = np.asarray(mn, dtype=np.int64)
    rng_a = np.asarray(rng, dtype=np.int64)
    qids = np.asarray([q[0] for q in queries_eq], dtype=np.int64)
    qs = np.asarray([q[1] for q in queries_eq], dtype=np.int64) * levels

    # ||q||^2 once, outside the batch loop; the per-batch distance matrix
    # is q2 - 2 q.r + r2 — ONE int64 matmul instead of Q broadcast-subtract
    # passes over the batch (identical ints: int64 arithmetic is mod-2^64,
    # and the true squared distance fits int64, so the decomposition and
    # the direct (q-r)^2 sum agree bit-for-bit)
    q2 = np.einsum("ij,ij->i", qs, qs) if len(qs) else qs.reshape(0)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            recon = mn_a * levels + codes * rng_a  # (n, dim) int64
            r2 = np.einsum("ij,ij->i", recon, recon)
            dist_all = q2[:, None] + r2[None, :] - 2 * (qs @ recon.T)
            parts = []
            for qi in range(len(qids)):
                mask = ids != qids[qi]
                d, cid = dist_all[qi][mask], ids[mask]
                if len(cid) == 0:
                    continue
                order = np.lexsort((cid, d))[:k]
                parts.append((np.full(len(order), qids[qi]), cid[order], d[order]))
            if parts:  # ONE Arrow batch back per input batch, not Q
                yield pd.DataFrame(
                    {
                        "qid": np.concatenate([p[0] for p in parts]),
                        "neighbor_id": np.concatenate([p[1] for p in parts]),
                        "dist": np.concatenate([p[2] for p in parts]),
                    }
                )

    schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("dist", LongType()),
        ]
    )
    partial = coded.mapInPandas(scan, schema)
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "neighbor_id", F.col("rk").cast("int").alias("rk"))
    )


def _collect_query_eq(queries: DataFrame) -> list[tuple[int, list[int]]]:
    """Q20 integer grid of the (small-by-contract) query set."""
    rows = (
        queries.select("vec_id", "embedding")
        .limit(MAX_COLLECTED_QUERIES + 1)
        .collect()
    )
    if len(rows) > MAX_COLLECTED_QUERIES:
        raise ValueError(
            f"SQ8 query set exceeds MAX_COLLECTED_QUERIES={MAX_COLLECTED_QUERIES}"
        )
    out = []
    for r in rows:
        eq = np.floor(
            np.asarray(r["embedding"], dtype=np.float64) * QUANT + 0.5
        ).astype(np.int64)
        out.append((int(r["vec_id"]), [int(v) for v in eq]))
    return out


_SQL_SQ8_CTES = f"""
    eq AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS eqv
           FROM embeddings),
    ev AS (SELECT vec_id, d, eqv[d] AS e
           FROM eq, generate_series(1, {SQ8_DIM}) g(d)),
    st AS (SELECT d, MIN(e) AS mn, GREATEST(MAX(e) - MIN(e), 1) AS rng
           FROM ev GROUP BY d),
    recon AS (SELECT vec_id, d,
                     mn * {SQ8_LEVELS} + ((e - mn) * {SQ8_LEVELS}) // rng * rng AS r
              FROM ev JOIN st USING (d)),
    sq8q AS (SELECT vec_id AS qid, d, e * {SQ8_LEVELS} AS qs
             FROM ev WHERE vec_id < {N_QUERIES}),
    sq8d AS (SELECT q.qid, r.vec_id,
                    SUM((q.qs - r.r) * (q.qs - r.r)) AS dist
             FROM sq8q q JOIN recon r ON q.d = r.d AND r.vec_id <> q.qid
             GROUP BY 1, 2)"""


@register(
    "q_ann_sq8_topk",
    f"""
    WITH {_SQL_SQ8_CTES}
    SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM sq8d) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """,
    # bench extended set (round 14): the SQ8 serving scan gets a per-round
    # trend line next to the PQ serving paths; NOT in the legacy-14 set.
    headline=True,
    doc="SQ8 scalar-quantized ANN (FAISS QT_8bit family): per-dim 8-bit "
    "codes on a corpus-trained integer grid (one stats scan, stateless "
    "JVM encode), asymmetric top-k over the 4x-smaller coded table via "
    "exact-int64 numpy batches; the whole chain is integer arithmetic on "
    "the shared Q20 grid, so the oracle value-checks the full ranking.",
)
def q_ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # the query vectors ride the stats scan (one corpus pass, not two)
    mn, rng, queries = sq8_stats(emb, queries_below=N_QUERIES)
    coded = sq8_encode(emb, mn, rng)
    return sq8_topk(coded, queries, mn, rng, TOPK).orderBy("qid", "rk")


@register(
    "q_ann_sq8_recall",
    f"""
    WITH {_SQL_SQ8_CTES},
    sq8t AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM sq8d) WHERE rk <= {TOPK}),
    exd AS (SELECT q.qid, r.vec_id,
                   SUM((q.e - r.e) * (q.e - r.e)) AS dist
            FROM (SELECT vec_id AS qid, d, e FROM ev
                  WHERE vec_id < {N_QUERIES}) q
            JOIN ev r ON q.d = r.d AND r.vec_id <> q.qid
            GROUP BY 1, 2),
    ext AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM exd) WHERE rk <= {TOPK})
    SELECT e.qid, CAST(COUNT(a.vec_id) AS BIGINT) AS recall_hits,
           CAST({TOPK} AS BIGINT) AS recall_possible
    FROM ext e LEFT JOIN sq8t a ON e.qid = a.qid AND e.vec_id = a.vec_id
    GROUP BY e.qid ORDER BY e.qid
    """,
    doc="SQ8 quantization-loss read-out: per-query overlap of the SQ8 "
    "asymmetric top-k with the EXACT integer-grid L2 top-k (both legs "
    "all-int64, both engines bit-identical) — the acceptance gate run "
    "before swapping an SQ8 index into serving.",
)
def q_ann_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mn, rng = sq8_stats(emb)
    coded = sq8_encode(emb, mn, rng)
    queries = _collect_query_eq(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    )
    sq8t = sq8_topk(coded, queries, mn, rng, TOPK).select("qid", "neighbor_id")

    # exact leg on the same integer grid: the SQ8 scan with levels=1 and
    # rng=1 degenerates to identity (codes = e - mn, recon = e), i.e. an
    # exact integer-L2 brute force sharing the quantized scan machinery.
    ones = [1] * len(mn)
    exact_coded = sq8_encode(emb, mn, ones, levels=1)
    ext = sq8_topk(exact_coded, queries, mn, ones, TOPK, levels=1).select(
        "qid", "neighbor_id"
    )
    return (
        ext.join(sq8t.withColumn("hit", F.lit(1)), ["qid", "neighbor_id"], "left")
        .groupBy("qid")
        .agg(
            F.count("hit").cast("bigint").alias("recall_hits"),
            F.lit(TOPK).cast("bigint").alias("recall_possible"),
        )
        .orderBy("qid")
    )


# --------------------------------------------------------------------------
# IVF-SQ8 (round 14): the coarse-quantizer + scalar-quantizer composition
# (FAISS IVFScalarQuantizer / Milvus IVF_SQ8) — the default middle point
# of the accuracy/compression ladder between IVF-Flat (no compression)
# and IVF-PQ (16-32x): cells prune the scan, SQ8 shrinks what's read 4x,
# and per-dim 8-bit reconstruction keeps recall near-exact. Same INT
# discipline end-to-end: coarse centroids are INT-rounded per-dim means
# on the Q20 grid (the residual-IVFADC cci convention), the coarse prune
# and the SQ8 asymmetric distance are pure int64 — the oracle checks the
# full ranking.
#
# Scale: the coarse table is |cells|x(dim+1) — a bounded collect whose
# argmin runs driver-side for the fixed anchor set (production: broadcast);
# the probed labels become a literal filter on the label-partitioned
# coded scan (the persisted-serving partition-prune shape); the SQ8 scan
# then touches only probed cells' codes — nprobe/|cells| of 1/4 the bytes.
# --------------------------------------------------------------------------


def _eqd_cols(dim: int = SQ8_DIM) -> list:
    """Per-dim Q20 integer grid expressions over `embedding`."""
    return [
        F.floor(F.element_at("embedding", d + 1).cast("double") * QUANT + F.lit(0.5))
        .cast("bigint")
        .alias(f"e{d}")
        for d in range(dim)
    ]


def ivf_sq8_cells(emb: DataFrame, dim: int = SQ8_DIM) -> list[tuple[int, list[int]]]:
    """INT cell centroids per label: floor(mean(eq) + 0.5) per dim — one
    scan, |cells| rows collected (bounded by the label domain)."""
    eq = emb.select("label", *_eqd_cols(dim))
    aggs = [F.sum(f"e{d}").alias(f"s{d}") for d in range(dim)] + [
        F.count("*").alias("n")
    ]
    rows = eq.groupBy("label").agg(*aggs).collect()
    import math as _math

    return sorted(
        (
            int(r["label"]),
            [
                int(_math.floor(float(r[f"s{d}"]) / int(r["n"]) + 0.5))
                for d in range(dim)
            ],
        )
        for r in rows
    )


_SQL_IVF_SQ8 = f"""
    WITH {_SQL_SQ8_CTES.replace("sq8q AS", "_sq8q_unused AS").replace("sq8d AS", "_sq8d_unused AS")},
    lbl AS (SELECT vec_id, label FROM embeddings),
    cc AS (SELECT l.label, v.d,
                  CAST(floor(CAST(SUM(v.e) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cq
           FROM ev v JOIN lbl l ON v.vec_id = l.vec_id
           GROUP BY l.label, v.d),
    qv AS (SELECT vec_id AS qid, d, e FROM ev WHERE vec_id < {N_QUERIES}),
    qc AS (SELECT q.qid, c.label, SUM((q.e - c.cq) * (q.e - c.cq)) AS cdist
           FROM qv q JOIN cc c ON q.d = c.d GROUP BY q.qid, c.label),
    probes AS (SELECT qid, label FROM (
      SELECT qid, label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cdist ASC, label) AS prk
      FROM qc) WHERE prk <= {IVF_NPROBE}),
    cand AS (SELECT p.qid, r.vec_id, r.d, r.r
             FROM recon r JOIN lbl l ON r.vec_id = l.vec_id
             JOIN probes p ON l.label = p.label
             WHERE r.vec_id <> p.qid),
    qs AS (SELECT vec_id AS qid, d, e * {SQ8_LEVELS} AS qs
           FROM ev WHERE vec_id < {N_QUERIES}),
    dd AS (SELECT c.qid, c.vec_id, SUM((q.qs - c.r) * (q.qs - c.r)) AS dist
           FROM cand c JOIN qs q ON q.qid = c.qid AND q.d = c.d
           GROUP BY c.qid, c.vec_id)
    SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM dd) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """


def ivf_sq8_probes(
    queries_eq: list[tuple[int, list[int]]],
    cells: list[tuple[int, list[int]]],
    nprobe: int = IVF_NPROBE,
) -> dict[int, list[int]]:
    """Per-query probed labels: argmin int L2 against the bounded cell
    table, driver-side for the fixed anchor set (production: broadcast)."""
    probed: dict[int, list[int]] = {}
    for qid, eq in queries_eq:
        dists = sorted(
            (sum((e - c) ** 2 for e, c in zip(eq, cq)), label)
            for label, cq in cells
        )
        probed[qid] = sorted(label for _, label in dists[:nprobe])
    return probed


def ivf_sq8_scan_topk(
    pruned: DataFrame,
    queries_eq: list[tuple[int, list[int]]],
    probed: dict[int, list[int]],
    mn: list[int],
    rng: list[int],
    k: int = TOPK,
) -> DataFrame:
    """ONE numpy scan over the probed-cell union; each query ranks only
    its own cells' members via a label mask inside the batch (a per-query
    re-scan would multiply corpus reads by Q at scale). pruned:
    (vec_id, label, codes)."""
    mn_a = np.asarray(mn, dtype=np.int64)
    rng_a = np.asarray(rng, dtype=np.int64)
    qids = [qid for qid, _ in queries_eq]
    qs = {
        qid: np.asarray(eq, dtype=np.int64) * SQ8_LEVELS for qid, eq in queries_eq
    }
    probe_sets = {qid: set(labs) for qid, labs in probed.items()}

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            labs = pdf["label"].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            recon = mn_a * SQ8_LEVELS + codes * rng_a
            for qid in qids:
                mask = np.isin(labs, list(probe_sets[qid])) & (ids != qid)
                if not mask.any():
                    continue
                diff = qs[qid][None, :] - recon[mask]
                dist = (diff * diff).sum(axis=1)
                cid = ids[mask]
                order = np.lexsort((cid, dist))[:k]
                yield pd.DataFrame(
                    {"qid": qid, "neighbor_id": cid[order], "dist": dist[order]}
                )

    schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("dist", LongType()),
        ]
    )
    partial = pruned.select("vec_id", "label", "codes").mapInPandas(scan, schema)
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "neighbor_id", F.col("rk").cast("int").alias("rk"))
        .orderBy("qid", "rk")
    )


@register(
    "q_ann_ivf_sq8",
    _SQL_IVF_SQ8,
    doc=f"IVF-SQ8 ANN (FAISS IVFScalarQuantizer family): INT coarse "
    f"centroids per cell prune the scan to nprobe={IVF_NPROBE} cells, "
    "SQ8 asymmetric distance ranks only the probed cells' 4x-smaller "
    "codes — the middle point of the compression ladder between IVF-Flat "
    "and IVF-PQ; all-integer chain, full value oracle.",
)
def q_ann_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    mn, rng = sq8_stats(emb)
    coded = sq8_encode(emb, mn, rng)  # keeps label
    cells = ivf_sq8_cells(emb)
    queries = _collect_query_eq(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    )
    # coarse prune: argmin over the bounded collected cell table (the
    # persisted serving turns the same literal into partition pruning)
    probed = ivf_sq8_probes(queries, cells)
    all_probed = sorted({lb for labs in probed.values() for lb in labs})
    pruned = coded.where(F.col("label").isin(all_probed))
    return ivf_sq8_scan_topk(pruned, queries, probed, mn, rng, TOPK)


# --------------------------------------------------------------------------
# Persisted IVF-SQ8 index + partition-pruned serving (round 14): the SQ8
# family gets the same durable lifecycle as PQ — train the grid once,
# land the codes label-partitioned, serve by loading the bounded
# metadata (grid + cells) and letting the probed labels PARTITION-PRUNE
# the code scan. The serving result is bit-identical to the in-memory
# composition (shared oracle with q_ann_ivf_sq8).
# --------------------------------------------------------------------------

_sq8_index_paths: dict[tuple, tuple[str, str, str]] = {}


def sq8_index_path(spark: SparkSession, sf_dir: str) -> tuple[str, str, str]:
    """Build (once per session+fixture) the persisted IVF-SQ8 index;
    return (grid_path, codes_path, cells_path). grid: ONE row
    (mn array<bigint>, rng array<bigint>) — the whole trained
    quantizer. codes: (vec_id, codes array<int>) partitioned by label.
    cells: (label, cq array<bigint>) INT coarse centroids."""
    import os
    import re

    key = (session_key(spark), sf_dir)
    if key not in _sq8_index_paths:
        base = work_dir("sq8_index_" + re.sub(r"\W+", "_", sf_dir))
        grid_path = os.path.join(base, "grid")
        codes_path = os.path.join(base, "codes")
        cells_path = os.path.join(base, "cells")
        emb = tp(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding", "label"
        )
        mn, rng = sq8_stats(emb)
        spark.createDataFrame(
            [(mn, rng)], "mn array<bigint>, rng array<bigint>"
        ).write.mode("overwrite").parquet(grid_path)
        spark.createDataFrame(
            [(label, cq) for label, cq in ivf_sq8_cells(emb)],
            "label int, cq array<bigint>",
        ).write.mode("overwrite").parquet(cells_path)
        (
            sq8_encode(emb, mn, rng)
            .write.mode("overwrite")
            .partitionBy("label")
            .parquet(codes_path)
        )
        _sq8_index_paths[key] = (grid_path, codes_path, cells_path)
    return _sq8_index_paths[key]


@register(
    "q_ann_sq8_persisted",
    _SQL_IVF_SQ8,
    # bench extended set (round 15, VERDICT r14 item 7): the durable-SQ8
    # partition-pruned serving path gets a per-round trend line next to
    # q_ann_ivf_pq_persisted and q_ann_sq8_topk; NOT in the legacy-14 set.
    headline=True,
    doc="IVF-SQ8 serving over the DURABLE index (one-row grid + INT cell "
    "centroids + label-partitioned codes): grid and cells load as bounded "
    "metadata, the coarse prune's probed labels PARTITION-PRUNE the code "
    "scan (pinned in tests/test_plans.py), one numpy scan ranks all "
    "queries — bit-identical to the in-memory composition (shared oracle "
    "with q_ann_ivf_sq8).",
)
def q_ann_sq8_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid_path, codes_path, cells_path = sq8_index_path(spark, sf_dir)
    [grid] = spark.read.parquet(grid_path).collect()  # bounded: 1 row
    mn, rng = list(grid["mn"]), list(grid["rng"])
    cells = sorted(
        (int(r["label"]), [int(v) for v in r["cq"]])
        for r in spark.read.parquet(cells_path).collect()  # bounded: |cells|
    )
    queries = _collect_query_eq(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    )
    probed = ivf_sq8_probes(queries, cells)
    all_probed = sorted({lb for labs in probed.values() for lb in labs})
    # the literal IN becomes a parquet PARTITION filter on the code scan
    pruned = spark.read.parquet(codes_path).where(
        F.col("label").isin(all_probed)
    )
    return ivf_sq8_scan_topk(pruned, queries, probed, mn, rng, TOPK)


# --------------------------------------------------------------------------
# SQ8 grid drift / saturation monitor (round 14): the scalar quantizer's
# decay mode. The grid is TRAINED (per-dim [mn, mx] from the corpus at
# build time); data that drifts outside it SATURATES — codes clamp to
# 0 or 255 and those dimensions' distances silently flatten. Production
# stores alarm on the saturation rate and retrain the ranges (FAISS SQ
# trained ranges, Milvus segment stats). This read-out trains the grid
# on the even-vec_id half (the "index build") and audits the odd half
# (the "new data"): total out-of-grid value count, low/high split, and
# the worst dimension's saturation share — the retrain trigger.
#
# Scale: ONE scan of the audited slice ending in 3·dim partial-agg
# cells; the grid rides as literals. All-integer on the Q20 grid —
# full value oracle.
# --------------------------------------------------------------------------


@register(
    "q_sq8_grid_drift",
    f"""
    WITH eq AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS eqv
           FROM embeddings),
    ev AS (SELECT vec_id, d, eqv[d] AS e
           FROM eq, generate_series(1, {SQ8_DIM}) g(d)),
    st AS (SELECT d, MIN(e) AS mn, MAX(e) AS mx
           FROM ev WHERE vec_id % 2 = 0 GROUP BY d),
    audit AS (
      SELECT v.d,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN v.e < s.mn THEN 1 ELSE 0 END) AS BIGINT) AS lo,
             CAST(SUM(CASE WHEN v.e > s.mx THEN 1 ELSE 0 END) AS BIGINT) AS hi
      FROM ev v JOIN st s ON v.d = s.d
      WHERE v.vec_id % 2 = 1
      GROUP BY v.d
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_values,
                   CAST(SUM(lo) AS BIGINT) AS n_sat_lo,
                   CAST(SUM(hi) AS BIGINT) AS n_sat_hi
            FROM audit),
    worst AS (SELECT d, lo + hi AS sat, n FROM audit
              ORDER BY sat DESC, d LIMIT 1)
    SELECT t.n_values, t.n_sat_lo, t.n_sat_hi,
           CAST(w.d - 1 AS INT) AS worst_dim,
           CAST(floor(w.sat * 1048576.0 / w.n + 0.5) AS BIGINT)
             AS worst_dim_sat_q20
    FROM tot t, worst w
    """,
    doc="SQ8 grid drift monitor: the quantizer's trained per-dim [mn,mx] "
    "ranges (built on the even-vec_id half) audited against the odd half "
    "— out-of-grid values saturate to code 0/255 and flatten distances, "
    "so the saturation count, its low/high split, and the worst "
    "dimension's share are the retrain-the-ranges alarm (the SQ sibling "
    "of the PQ health monitors); one scan, 3·dim partial-agg cells, "
    "all-integer, full value oracle.",
)
def q_sq8_grid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sq8_grid_drift_readout(
        spark, tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )


def sq8_grid_drift_readout(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """Drift audit body over any (vec_id, embedding) frame — grid from
    the even-vec_id half, audit over the odd half (testable on
    constructed corpora)."""
    import math as _math

    mn, _ = sq8_stats(emb.where(F.col("vec_id") % 2 == 0))
    # sq8_stats floors rng at 1; the drift audit needs the raw mx
    eqd = [
        F.floor(F.element_at("embedding", d + 1).cast("double") * QUANT + F.lit(0.5))
        .cast("bigint")
        .alias(f"e{d}")
        for d in range(SQ8_DIM)
    ]
    row = (
        emb.where(F.col("vec_id") % 2 == 0)
        .agg(*[F.max(e).alias(f"mx{d}") for d, e in enumerate(eqd)])
        .collect()[0]
    )
    mx = [int(row[f"mx{d}"]) for d in range(SQ8_DIM)]

    audit = emb.where(F.col("vec_id") % 2 == 1).select(*eqd)
    aggs = []
    for d in range(SQ8_DIM):
        e = F.col(f"e{d}")
        aggs.append(F.count(e).cast("bigint").alias(f"n{d}"))
        aggs.append(
            F.sum(F.when(e < F.lit(mn[d]), 1).otherwise(0))
            .cast("bigint")
            .alias(f"lo{d}")
        )
        aggs.append(
            F.sum(F.when(e > F.lit(mx[d]), 1).otherwise(0))
            .cast("bigint")
            .alias(f"hi{d}")
        )
    arow = audit.agg(*aggs).collect()[0]  # bounded: 3·dim cells
    n_values = sum(int(arow[f"n{d}"]) for d in range(SQ8_DIM))
    n_lo = sum(int(arow[f"lo{d}"]) for d in range(SQ8_DIM))
    n_hi = sum(int(arow[f"hi{d}"]) for d in range(SQ8_DIM))
    worst_d, worst_sat, worst_n = 0, -1, 1
    for d in range(SQ8_DIM):
        sat = int(arow[f"lo{d}"]) + int(arow[f"hi{d}"])
        if sat > worst_sat:
            worst_d, worst_sat, worst_n = d, sat, int(arow[f"n{d}"])
    out = (
        n_values,
        n_lo,
        n_hi,
        worst_d,
        int(_math.floor(worst_sat * 1048576.0 / worst_n + 0.5)),
    )
    return spark.createDataFrame(
        [out],
        "n_values bigint, n_sat_lo bigint, n_sat_hi bigint, "
        "worst_dim int, worst_dim_sat_q20 bigint",
    )


# --------------------------------------------------------------------------
# SQ8 grid refresh (round 15, VERDICT r14 missing 2): the APPLY step of
# q_sq8_grid_drift — when the saturation alarm fires, retrain the per-dim
# [mn, rng] grid on the grown corpus, re-encode, and swap the refreshed
# index in by staged rename (the q_pq_coarse_refresh proof shape: the
# query RAISES unless the refreshed probe is bit-identical to a
# from-scratch rebuild, and the live index is stat-pinned unchanged until
# the swap).
#
# Design note vs the coarse refresh: cell centroids have a moved-CELL
# shortcut (unchanged cells' files copy byte-untouched), but a changed
# GRID changes every row's code array — there is no moved-row shortcut.
# What CAN be partial is the per-dimension work: only n_dims_moved of the
# 64 dims actually recode (an unchanged dim's (mn, rng) maps e to the
# same code), so in a dim-columnar layout (one int8 column per dim, or
# parquet column chunks per dim) the rewrite touches n_moved/64 of the
# code bytes and serves hybrid (old columns + new columns) during the
# swap. With array<int> rows — this repo's layout, chosen so codes ride
# one vectorized Arrow column into the numpy scan — every row rewrites,
# and the refresh reads the RAW embedding scan once either way (encode is
# input-bound, not output-bound), so the full rewrite is the honest cost
# here; n_dims_moved is emitted as exactly that read-out. Saturation is
# counted before (stale grid, the alarm's number) and after (fresh grid —
# 0 by construction, the acceptance check).
#
# Stale-grid premise mirrors the drift monitor: the grid was trained on
# the even-vec_id half (the original index build); the corpus has since
# doubled. All-integer on the Q20 grid — full value oracle including the
# refreshed ranking.
# --------------------------------------------------------------------------


def _sq8_raw_minmax(
    emb: DataFrame, dim: int = SQ8_DIM
) -> tuple[list[int], list[int]]:
    """Raw per-dim (mn, mx) on the Q20 grid (no rng floor — the drift /
    moved-dim comparisons need the untouched bounds); one scan, 2·dim
    partial-agg cells."""
    eqd = [
        F.floor(F.element_at("embedding", d + 1).cast("double") * QUANT + F.lit(0.5))
        .cast("bigint")
        for d in range(dim)
    ]
    aggs = [F.min(eqd[d]).alias(f"mn{d}") for d in range(dim)] + [
        F.max(eqd[d]).alias(f"mx{d}") for d in range(dim)
    ]
    row = emb.agg(*aggs).collect()[0]
    return (
        [int(row[f"mn{d}"]) for d in range(dim)],
        [int(row[f"mx{d}"]) for d in range(dim)],
    )


def _sq8_out_of_grid_count(
    emb: DataFrame, mn: list[int], mx: list[int], dim: int = SQ8_DIM
) -> int:
    """Total out-of-grid values over the frame under a [mn, mx] grid —
    one scan ending in dim partial-agg cells."""
    eqd = [
        F.floor(F.element_at("embedding", d + 1).cast("double") * QUANT + F.lit(0.5))
        .cast("bigint")
        for d in range(dim)
    ]
    aggs = [
        F.sum(
            F.when((eqd[d] < F.lit(mn[d])) | (eqd[d] > F.lit(mx[d])), 1).otherwise(0)
        )
        .cast("bigint")
        .alias(f"o{d}")
        for d in range(dim)
    ]
    row = emb.agg(*aggs).collect()[0]
    return sum(int(row[f"o{d}"]) for d in range(dim))


@register(
    "q_sq8_grid_refresh",
    f"""
    WITH {_SQL_SQ8_CTES},
    sth AS (SELECT d, MIN(e) AS mn, MAX(e) AS mx
            FROM ev WHERE vec_id % 2 = 0 GROUP BY d),
    stf AS (SELECT d, MIN(e) AS mn, MAX(e) AS mx FROM ev GROUP BY d),
    mvd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dims_moved
            FROM sth h JOIN stf f ON h.d = f.d
            WHERE h.mn <> f.mn OR h.mx <> f.mx),
    satb AS (SELECT CAST(SUM(CASE WHEN v.e < h.mn OR v.e > h.mx
                                  THEN 1 ELSE 0 END) AS BIGINT) AS n_sat_before
             FROM ev v JOIN sth h ON v.d = h.d),
    sata AS (SELECT CAST(SUM(CASE WHEN v.e < f.mn OR v.e > f.mx
                                  THEN 1 ELSE 0 END) AS BIGINT) AS n_sat_after
             FROM ev v JOIN stf f ON v.d = f.d)
    SELECT t.qid, t.neighbor_id, t.rk,
           m.n_dims_moved, b.n_sat_before, a.n_sat_after
    FROM (
      SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dist ASC, vec_id) AS rk
        FROM sq8d) WHERE rk <= {TOPK}
    ) t, mvd m, satb b, sata a
    ORDER BY t.qid, t.rk
    """,
    doc="SQ8 grid REFRESH — the q_sq8_grid_drift APPLY step: an index "
    "encoded on a stale per-dim [mn,rng] grid (trained on the original "
    "even-id half) is refreshed by retraining the grid on the full "
    "corpus, re-encoding, and swapping by staged rename (live files "
    "stat-pinned unchanged until the swap); the query RAISES unless the "
    "refreshed serving probe is bit-identical to a from-scratch rebuild; "
    "emits the refreshed top-k plus n_dims_moved and the out-of-grid "
    "saturation count before (the alarm) / after (0 — the acceptance "
    "check). A changed grid changes every code array, so the rewrite is "
    "full (no moved-cell shortcut; the per-dim partial path needs a "
    "dim-columnar layout — documented in SCALING.md); all-integer, full "
    "value oracle.",
)
def q_sq8_grid_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return sq8_grid_refresh_readout(spark, emb)


def sq8_grid_refresh_readout(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """The refresh over ANY (vec_id, embedding) frame — split from the
    registered query so tests can drive it with constructed drift
    geometry (dims moved / not moved, saturating tails)."""
    import os as _os
    import shutil as _shutil

    # stale grid: trained on the even-vec_id half (the original build)
    mn_h, mx_h = _sq8_raw_minmax(emb.where(F.col("vec_id") % 2 == 0))
    rng_h = [max(mx_h[d] - mn_h[d], 1) for d in range(len(mn_h))]

    # the live index: the FULL corpus encoded on the stale grid
    state = work_dir("sq8_refresh_index")
    current = _os.path.join(state, "current")
    sq8_encode(emb, mn_h, rng_h).write.mode("overwrite").parquet(current)

    # the alarm's number: out-of-grid values under the stale grid
    n_sat_before = _sq8_out_of_grid_count(emb, mn_h, mx_h)

    # refresh: retrain on the full corpus
    mn_f, mx_f = _sq8_raw_minmax(emb)
    rng_f = [max(mx_f[d] - mn_f[d], 1) for d in range(len(mn_f))]
    n_dims_moved = sum(
        1
        for d in range(len(mn_f))
        if mn_h[d] != mn_f[d] or mx_h[d] != mx_f[d]
    )
    n_sat_after = _sq8_out_of_grid_count(emb, mn_f, mx_f)

    # stat-pin the live index: no file may change before the swap
    def stat_map(root: str) -> dict[str, tuple[int, int]]:
        out = {}
        for r, _, files in _os.walk(root):
            for fn in files:
                p = _os.path.join(r, fn)
                st = _os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
        return out

    pre_stats = stat_map(current)

    staged = _os.path.join(state, "staged")
    _shutil.rmtree(staged, ignore_errors=True)
    sq8_encode(emb, mn_f, rng_f).write.mode("overwrite").parquet(staged)

    if stat_map(current) != pre_stats:
        raise AssertionError("live index files changed before the swap")
    retired = current + "_retired"
    _shutil.rmtree(retired, ignore_errors=True)
    _os.replace(current, retired)
    _os.replace(staged, current)
    _shutil.rmtree(retired, ignore_errors=True)

    # probe the refreshed index; RAISE unless bit-identical to a
    # from-scratch rebuild on the fresh grid
    queries = _collect_query_eq(emb.where(F.col("vec_id") < N_QUERIES))
    refreshed = spark.read.parquet(current)
    probe = sq8_topk(refreshed, queries, mn_f, rng_f, TOPK)
    probe_rows = probe.collect()
    full = sq8_topk(sq8_encode(emb, mn_f, rng_f), queries, mn_f, rng_f, TOPK)
    if sorted(map(tuple, probe_rows)) != sorted(map(tuple, full.collect())):
        raise AssertionError("refreshed probe differs from the full rebuild")

    counts = spark.createDataFrame(
        [(int(n_dims_moved), int(n_sat_before), int(n_sat_after))],
        "n_dims_moved bigint, n_sat_before bigint, n_sat_after bigint",
    )
    out = spark.createDataFrame(probe_rows, probe.schema)
    return out.crossJoin(F.broadcast(counts)).orderBy("qid", "rk")


# --------------------------------------------------------------------------
# Two-stage SQ8 serving with exact re-rank (round 15): the composition the
# SQ8 header promises — "SQ8 shortlist -> exact re-rank, like
# q_ann_ivf_pq_refine" (FAISS IndexRefineFlat over a ScalarQuantizer
# base). Stage 1 ranks the 4x-smaller coded table asymmetrically to a
# top-R shortlist; stage 2 recomputes EXACT integer-grid L2 for only the
# Q·R shortlisted pairs (point lookups at scale — here a broadcast
# semi-join of the shortlist against one integer-grid corpus projection)
# and re-ranks to the final top-k. Repairs every in-shortlist SQ8 rank
# error by construction; R trades stage-2 reads for recall exactly like
# the PQ refine's knob. All-integer on the shared Q20 grid — full value
# oracle.
# --------------------------------------------------------------------------

SQ8_REFINE_R = 2 * TOPK  # SQ8 shortlist size handed to the exact re-rank

_SQL_EQV = (
    f"transform(embedding, x -> "
    f"CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5D) AS BIGINT))"
)


@register(
    "q_ann_sq8_refine",
    f"""
    WITH {_SQL_SQ8_CTES},
    shortl AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM sq8d) WHERE rk <= {SQ8_REFINE_R}),
    rexd AS (SELECT s.qid, s.vec_id,
                    SUM((q.e - r.e) * (q.e - r.e)) AS dist
             FROM shortl s
             JOIN ev r ON r.vec_id = s.vec_id
             JOIN ev q ON q.vec_id = s.qid AND q.d = r.d
             GROUP BY 1, 2)
    SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM rexd) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """,
    doc=f"two-stage SQ8 serving with EXACT RE-RANKING (FAISS "
    f"IndexRefineFlat over a scalar-quantizer base): the asymmetric SQ8 "
    f"pass keeps a top-{SQ8_REFINE_R} shortlist per query, exact "
    "integer-grid L2 runs against only those Q·R candidates (a broadcast "
    f"semi-join — point lookups at scale), and the final top-{TOPK} comes "
    "from the exact re-rank; the SQ8 sibling of q_ann_ivf_pq_refine, "
    "all-integer, full value oracle.",
)
def q_ann_sq8_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mn, rng = sq8_stats(emb)
    coded = sq8_encode(emb, mn, rng)
    queries = _collect_query_eq(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    )
    shortlist = sq8_topk(coded, queries, mn, rng, SQ8_REFINE_R).select(
        "qid", "neighbor_id"
    )
    # stage 2: exact integer L2 over ONLY the Q·R shortlisted pairs — the
    # shortlist broadcasts against one integer-grid corpus projection
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.expr(_SQL_EQV).alias("ne")
    )
    qdf = spark.createDataFrame(
        [(qid, eq) for qid, eq in queries], "qid bigint, qe array<bigint>"
    )
    dist = F.aggregate(
        F.zip_with("qe", "ne", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        F.broadcast(shortlist)
        .join(corpus, "neighbor_id")
        .join(F.broadcast(qdf), "qid")
        .select("qid", "neighbor_id", dist.alias("dist"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("qid", "neighbor_id", F.col("rk").cast("int").alias("rk"))
        .orderBy("qid", "rk")
    )


# --------------------------------------------------------------------------
# Residual IVF-SQ8 (round 15): FAISS IVFScalarQuantizer's by_residual
# DEFAULT — the scalar quantizer encodes x - centroid(cell), not x.
# Residuals concentrate near 0, so the per-dim [mn, rng] grid is tighter
# than the absolute grid by roughly the ratio of corpus spread to
# within-cell spread — the same 8 bits buy finer resolution, exactly why
# FAISS residualizes by default. Same INT discipline end-to-end: INT cell
# centroids (the ivf_sq8_cells convention), integer residuals on the Q20
# grid, a residual-trained grid, and serving that reconstructs in
# ABSOLUTE space (cq·255 + mn·255 + code·rng) so the asymmetric distance
# needs no per-cell query re-centering inside the scan. Full value oracle.
#
# Scale: one extra bounded join (|cells| rows attach the centroid for the
# residual subtraction) on top of the raw IVF-SQ8 costs; the serving scan
# is the same one-pass numpy over probed cells' codes.
# --------------------------------------------------------------------------


def _arr_int_stats(
    df: DataFrame, col: str, dim: int = SQ8_DIM
) -> tuple[list[int], list[int]]:
    """Per-dim (mn, rng) of an int64 array column — one scan, 2·dim
    partial-agg cells (the sq8_stats shape over precomputed ints)."""
    aggs = [
        F.min(F.element_at(col, d + 1)).alias(f"mn{d}") for d in range(dim)
    ] + [F.max(F.element_at(col, d + 1)).alias(f"mx{d}") for d in range(dim)]
    row = df.agg(*aggs).collect()[0]
    mn = [int(row[f"mn{d}"]) for d in range(dim)]
    rng = [max(int(row[f"mx{d}"]) - mn[d], 1) for d in range(dim)]
    return mn, rng


def sq8_encode_ints(
    df: DataFrame,
    col: str,
    mn: list[int],
    rng: list[int],
    levels: int = SQ8_LEVELS,
    clamp: bool = False,
) -> DataFrame:
    """codes array<int> from an int64 array column on a [mn, rng] grid —
    the sq8_encode projection without the Q20 quantization step (the
    input ints are already on the grid).

    ``clamp=True`` saturates codes to [0, levels] — the scalar
    quantizer's real out-of-grid behavior (values beyond the trained
    range clamp to the edge codes, the decay mode q_sq8_grid_drift
    alarms on). Required whenever a FROZEN grid meets data it was not
    trained on (the coarse-refresh premise): besides being the honest
    semantics, clamping also removes the one engine divergence — Spark's
    DIV truncates toward zero while DuckDB's // floors, which differ
    only on negative (i.e. below-grid) numerators, and both saturate to
    0 under the clamp."""
    mn_sql = "array(" + ",".join(f"{v}L" for v in mn) + ")"
    rng_sql = "array(" + ",".join(f"{v}L" for v in rng) + ")"
    code = (
        f"((x - element_at({mn_sql}, i + 1)) * {levels})"
        f" DIV element_at({rng_sql}, i + 1)"
    )
    if clamp:
        code = f"LEAST(GREATEST({code}, 0L), {levels}L)"
    codes = F.expr(f"transform({col}, (x, i) -> CAST({code} AS INT))")
    keep = [c for c in df.columns if c != col]
    return df.select(*keep, codes.alias("codes"))


def ivf_sq8_residual_scan_topk(
    pruned: DataFrame,
    queries_eq: list[tuple[int, list[int]]],
    probed: dict[int, list[int]],
    mn: list[int],
    rng: list[int],
    cells: list[tuple[int, list[int]]],
    k: int = TOPK,
) -> DataFrame:
    """ONE numpy scan over the probed-cell union, residual arithmetic:
    reconstruction is cq[label]·levels + mn·levels + code·rng (absolute
    space), so queries stay un-recentered. pruned: (vec_id, label,
    codes)."""
    mn_a = np.asarray(mn, dtype=np.int64)
    rng_a = np.asarray(rng, dtype=np.int64)
    max_label = max(label for label, _ in cells)
    cq_m = np.zeros((max_label + 1, len(mn)), dtype=np.int64)
    for label, cq in cells:
        cq_m[label] = np.asarray(cq, dtype=np.int64)
    qids = [qid for qid, _ in queries_eq]
    qs = {
        qid: np.asarray(eq, dtype=np.int64) * SQ8_LEVELS for qid, eq in queries_eq
    }
    probe_sets = {qid: set(labs) for qid, labs in probed.items()}

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            labs = pdf["label"].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            recon = cq_m[labs] * SQ8_LEVELS + mn_a * SQ8_LEVELS + codes * rng_a
            for qid in qids:
                mask = np.isin(labs, list(probe_sets[qid])) & (ids != qid)
                if not mask.any():
                    continue
                diff = qs[qid][None, :] - recon[mask]
                dist = (diff * diff).sum(axis=1)
                cid = ids[mask]
                order = np.lexsort((cid, dist))[:k]
                yield pd.DataFrame(
                    {"qid": qid, "neighbor_id": cid[order], "dist": dist[order]}
                )

    schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("dist", LongType()),
        ]
    )
    partial = pruned.select("vec_id", "label", "codes").mapInPandas(scan, schema)
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "neighbor_id", F.col("rk").cast("int").alias("rk"))
        .orderBy("qid", "rk")
    )


_SQL_IVF_SQ8_RESIDUAL = f"""
    WITH eq AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS eqv
           FROM embeddings),
    ev AS (SELECT vec_id, d, eqv[d] AS e
           FROM eq, generate_series(1, {SQ8_DIM}) g(d)),
    lbl AS (SELECT vec_id, label FROM embeddings),
    cc AS (SELECT l.label, v.d,
                  CAST(floor(CAST(SUM(v.e) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cq
           FROM ev v JOIN lbl l ON v.vec_id = l.vec_id
           GROUP BY l.label, v.d),
    rv AS (SELECT e.vec_id, e.d, e.e - c.cq AS r, c.cq AS cq
           FROM ev e JOIN lbl l ON e.vec_id = l.vec_id
           JOIN cc c ON c.label = l.label AND c.d = e.d),
    str AS (SELECT d, MIN(r) AS mn, GREATEST(MAX(r) - MIN(r), 1) AS rng
            FROM rv GROUP BY d),
    rrec AS (SELECT v.vec_id, v.d,
                    v.cq * {SQ8_LEVELS} + s.mn * {SQ8_LEVELS}
                      + ((v.r - s.mn) * {SQ8_LEVELS}) // s.rng * s.rng AS ra
             FROM rv v JOIN str s ON v.d = s.d),
    qv AS (SELECT vec_id AS qid, d, e FROM ev WHERE vec_id < {N_QUERIES}),
    qc AS (SELECT q.qid, c.label, SUM((q.e - c.cq) * (q.e - c.cq)) AS cdist
           FROM qv q JOIN cc c ON q.d = c.d GROUP BY q.qid, c.label),
    probes AS (SELECT qid, label FROM (
      SELECT qid, label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cdist ASC, label) AS prk
      FROM qc) WHERE prk <= {IVF_NPROBE}),
    cand AS (SELECT p.qid, r.vec_id, r.d, r.ra
             FROM rrec r JOIN lbl l ON r.vec_id = l.vec_id
             JOIN probes p ON l.label = p.label
             WHERE r.vec_id <> p.qid),
    qs AS (SELECT qid, d, e * {SQ8_LEVELS} AS qs FROM qv),
    dd AS (SELECT c.qid, c.vec_id, SUM((q.qs - c.ra) * (q.qs - c.ra)) AS dist
           FROM cand c JOIN qs q ON q.qid = c.qid AND q.d = c.d
           GROUP BY c.qid, c.vec_id)
    SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM dd) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """


@register(
    "q_ann_ivf_sq8_residual",
    _SQL_IVF_SQ8_RESIDUAL,
    doc=f"residual IVF-SQ8 ANN (FAISS IVFScalarQuantizer by_residual — "
    "the default): the scalar quantizer encodes x − centroid(cell) on a "
    "residual-trained [mn,rng] grid (residuals concentrate near 0, so 8 "
    "bits buy finer resolution than the absolute grid); serving "
    f"reconstructs in ABSOLUTE space (cq·{SQ8_LEVELS} + mn·{SQ8_LEVELS} "
    "+ code·rng) so one numpy pass ranks every query without per-cell "
    "re-centering; all-integer chain on the Q20 grid, full value oracle.",
)
def q_ann_ivf_sq8_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    cells = ivf_sq8_cells(emb)
    cells_df = spark.createDataFrame(
        [(label, cq) for label, cq in cells], "label int, cq array<bigint>"
    )
    rem = _sq8_residuals(emb, cells_df)
    mn, rng = _arr_int_stats(rem, "rv")
    coded = sq8_encode_ints(rem, "rv", mn, rng)
    queries = _collect_query_eq(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    )
    probed = ivf_sq8_probes(queries, cells)
    all_probed = sorted({lb for labs in probed.values() for lb in labs})
    pruned = coded.where(F.col("label").isin(all_probed))
    return ivf_sq8_residual_scan_topk(pruned, queries, probed, mn, rng, cells, TOPK)


def _sq8_residuals(emb: DataFrame, cells_df: DataFrame) -> DataFrame:
    """(vec_id, label, rv array<bigint>): integer residuals eq − cq via
    one bounded |cells|-row join (unhinted — the vocab-join discipline)."""
    return emb.join(cells_df, "label").select(
        "vec_id",
        "label",
        F.expr(f"zip_with({_SQL_EQV}, cq, (x, y) -> x - y)").alias("rv"),
    )


# --------------------------------------------------------------------------
# Persisted residual IVF-SQ8 index + partition-pruned serving (round 15):
# the residual family gets the same durable lifecycle the raw SQ8 (and
# both PQ layouts) have — train once, land (grid + cells + codes) on
# disk, serve by loading the bounded metadata and letting the probed
# labels PARTITION-PRUNE the code scan. Bit-identical to the in-memory
# residual composition (shared oracle + suite pin); with FAISS shipping
# by_residual as the IVF-SQ default, THIS is the layout an SQ8 store
# actually persists.
# --------------------------------------------------------------------------

_sq8_res_index_paths: dict[tuple, tuple[str, str, str]] = {}


def sq8_residual_index_path(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, str]:
    """Build (once per session+fixture) the persisted residual IVF-SQ8
    index; return (grid_path, codes_path, cells_path). grid: ONE row
    (mn, rng) over the RESIDUALS. codes: (vec_id, codes) partitioned by
    label. cells: (label, cq) INT coarse centroids."""
    import os
    import re

    key = (session_key(spark), sf_dir)
    if key not in _sq8_res_index_paths:
        base = work_dir("sq8_res_index_" + re.sub(r"\W+", "_", sf_dir))
        grid_path = os.path.join(base, "grid")
        codes_path = os.path.join(base, "codes")
        cells_path = os.path.join(base, "cells")
        emb = tp(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding", "label"
        )
        cells = ivf_sq8_cells(emb)
        cells_df = spark.createDataFrame(
            [(label, cq) for label, cq in cells], "label int, cq array<bigint>"
        )
        rem = _sq8_residuals(emb, cells_df)
        mn, rng = _arr_int_stats(rem, "rv")
        spark.createDataFrame(
            [(mn, rng)], "mn array<bigint>, rng array<bigint>"
        ).write.mode("overwrite").parquet(grid_path)
        cells_df.write.mode("overwrite").parquet(cells_path)
        (
            sq8_encode_ints(rem, "rv", mn, rng)
            .write.mode("overwrite")
            .partitionBy("label")
            .parquet(codes_path)
        )
        _sq8_res_index_paths[key] = (grid_path, codes_path, cells_path)
    return _sq8_res_index_paths[key]


@register(
    "q_ann_sq8_residual_persisted",
    _SQL_IVF_SQ8_RESIDUAL,
    # bench extended set (round 16, VERDICT r15 item 7): the layout an
    # SQ8 store ships (by_residual default) was the only persisted-
    # serving family without a per-round trend line; legacy-14 untouched.
    headline=True,
    doc="residual IVF-SQ8 serving over the DURABLE index (one-row "
    "residual grid + INT cell centroids + label-partitioned residual "
    "codes): grid and cells load as bounded metadata, the coarse prune's "
    "probed labels PARTITION-PRUNE the code scan (plan-pinned), one "
    "numpy pass reconstructs in absolute space and ranks all queries — "
    "bit-identical to the in-memory composition (shared oracle with "
    "q_ann_ivf_sq8_residual + suite pin). The layout an SQ8 store "
    "actually ships: FAISS's IVF-SQ default IS by_residual.",
)
def q_ann_sq8_residual_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid_path, codes_path, cells_path = sq8_residual_index_path(spark, sf_dir)
    [grid] = spark.read.parquet(grid_path).collect()  # bounded: 1 row
    mn, rng = list(grid["mn"]), list(grid["rng"])
    cells = sorted(
        (int(r["label"]), [int(v) for v in r["cq"]])
        for r in spark.read.parquet(cells_path).collect()  # bounded: |cells|
    )
    queries = _collect_query_eq(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    )
    probed = ivf_sq8_probes(queries, cells)
    all_probed = sorted({lb for labs in probed.values() for lb in labs})
    # the literal IN becomes a parquet PARTITION filter on the code scan
    pruned = spark.read.parquet(codes_path).where(F.col("label").isin(all_probed))
    return ivf_sq8_residual_scan_topk(pruned, queries, probed, mn, rng, cells, TOPK)


# --------------------------------------------------------------------------
# Coarse-quantizer refresh for the residual SQ8 index (round 16, VERDICT
# r15 missing 1): the q_pq_coarse_refresh proof shape wired to the layout
# an SQ8 store ships (q_ann_sq8_residual_persisted — FAISS's by_residual
# IVF-SQ default). The health monitors alarm on occupancy skew; THIS is
# the apply step: retrain the INT cell centroids on the grown corpus,
# re-encode ONLY the cells whose centroid moved (a moved cell changes its
# members' residuals; an unmoved cell's residuals — and therefore codes —
# are bit-identical, so its label-partition files copy byte-untouched: at
# an object store a server-side copy/rename, metadata-rate), swap by
# staged rename with the live index stat-pinned unchanged until the swap,
# and RAISE unless the refreshed serving probe is bit-identical to a full
# re-encode against (fresh cells, frozen residual grid).
#
# The residual GRID stays frozen across the refresh (that is the point —
# only the centroids move); under a frozen grid the moved cells' new
# residuals can leave the trained range, so the encode CLAMPS to the edge
# codes (real SQ saturation — see sq8_encode_ints). Saturation introduced
# this way is the signal q_sq8_residual_grid_drift watches; its apply is
# q_sq8_residual_grid_refresh below.
#
# Stale-artifact premise mirrors the PQ refresh: cells + residual grid
# trained on the even-vec_id half (the original build), the corpus has
# since doubled, every vector is encoded against the stale artifacts.
# All-integer on the Q20 grid — full value oracle including the refreshed
# ranking and the moved-cell counts.
# --------------------------------------------------------------------------

_SQL_SQ8_COARSE_REFRESH = f"""
    WITH eq AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS eqv
           FROM embeddings),
    ev AS (SELECT vec_id, d, eqv[d] AS e
           FROM eq, generate_series(1, {SQ8_DIM}) g(d)),
    lbl AS (SELECT vec_id, label FROM embeddings),
    cch AS (SELECT l.label, v.d,
                   CAST(floor(CAST(SUM(v.e) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cq
            FROM ev v JOIN lbl l ON v.vec_id = l.vec_id
            WHERE v.vec_id % 2 = 0
            GROUP BY l.label, v.d),
    rvh AS (SELECT e.vec_id, e.d, e.e - c.cq AS r
            FROM ev e JOIN lbl l ON e.vec_id = l.vec_id
            JOIN cch c ON c.label = l.label AND c.d = e.d
            WHERE e.vec_id % 2 = 0),
    strh AS (SELECT d, MIN(r) AS mn, GREATEST(MAX(r) - MIN(r), 1) AS rng
             FROM rvh GROUP BY d),
    ccf AS (SELECT l.label, v.d,
                   CAST(floor(CAST(SUM(v.e) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cq
            FROM ev v JOIN lbl l ON v.vec_id = l.vec_id
            GROUP BY l.label, v.d),
    mvlab AS (SELECT DISTINCT f.label
              FROM ccf f JOIN cch h ON f.label = h.label AND f.d = h.d
              WHERE f.cq <> h.cq),
    cnts AS (SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM lbl
         WHERE label IN (SELECT label FROM mvlab)) AS n_moved,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM lbl) AS n_total,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM mvlab) AS n_changed_cells),
    rvf AS (SELECT e.vec_id, e.d, e.e - c.cq AS r, c.cq AS cq
            FROM ev e JOIN lbl l ON e.vec_id = l.vec_id
            JOIN ccf c ON c.label = l.label AND c.d = e.d),
    rrec AS (SELECT v.vec_id, v.d,
                    v.cq * {SQ8_LEVELS} + s.mn * {SQ8_LEVELS}
                      + LEAST(GREATEST(((v.r - s.mn) * {SQ8_LEVELS}) // s.rng,
                                       0), {SQ8_LEVELS}) * s.rng AS ra
             FROM rvf v JOIN strh s ON v.d = s.d),
    qv AS (SELECT vec_id AS qid, d, e FROM ev WHERE vec_id < {N_QUERIES}),
    qc AS (SELECT q.qid, c.label, SUM((q.e - c.cq) * (q.e - c.cq)) AS cdist
           FROM qv q JOIN ccf c ON q.d = c.d GROUP BY q.qid, c.label),
    probes AS (SELECT qid, label FROM (
      SELECT qid, label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cdist ASC, label) AS prk
      FROM qc) WHERE prk <= {IVF_NPROBE}),
    cand AS (SELECT p.qid, r.vec_id, r.d, r.ra
             FROM rrec r JOIN lbl l ON r.vec_id = l.vec_id
             JOIN probes p ON l.label = p.label
             WHERE r.vec_id <> p.qid),
    qs AS (SELECT qid, d, e * {SQ8_LEVELS} AS qs FROM qv),
    dd AS (SELECT c.qid, c.vec_id, SUM((q.qs - c.ra) * (q.qs - c.ra)) AS dist
           FROM cand c JOIN qs q ON q.qid = c.qid AND q.d = c.d
           GROUP BY c.qid, c.vec_id)
    SELECT t.qid, t.neighbor_id, t.rk, n.n_moved, n.n_total, n.n_changed_cells
    FROM (
      SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dist ASC, vec_id) AS rk
        FROM dd) WHERE rk <= {TOPK}
    ) t, cnts n
    ORDER BY t.qid, t.rk
    """


@register(
    "q_sq8_coarse_refresh",
    _SQL_SQ8_COARSE_REFRESH,
    doc="coarse-quantizer REFRESH for the residual SQ8 index (the "
    "q_pq_coarse_refresh proof shape on the layout an SQ8 store ships): "
    "INT cell centroids retrained on the grown corpus, ONLY moved cells' "
    "vectors re-residualized + re-encoded on the FROZEN residual grid "
    "(clamped — real SQ saturation), unmoved cells' label-partition files "
    "copied byte-untouched, staged-rename swap with the live index "
    "stat-pinned until the swap; RAISES unless the refreshed serving "
    "probe is bit-identical to a full re-encode against the fresh cells; "
    "emits the refreshed top-k plus (n_moved, n_total, n_changed_cells) "
    "— all value-checked by the oracle.",
)
def q_sq8_coarse_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    return sq8_coarse_refresh_readout(spark, emb)


def sq8_coarse_refresh_readout(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """The refresh over ANY (vec_id, embedding, label) frame — split from
    the registered query so tests can drive it with constructed geometry
    where only SOME cells' centroids move."""
    import os as _os
    import shutil as _shutil

    half = emb.where(F.col("vec_id") % 2 == 0)

    # stale artifacts: INT cells + residual grid from the even half
    cells_h = ivf_sq8_cells(half)
    cells_h_df = spark.createDataFrame(
        cells_h, "label int, cq array<bigint>"
    )
    mn, rng = _arr_int_stats(_sq8_residuals(half, cells_h_df), "rv")

    # the grown index: EVERY vector residual-encoded vs the STALE cells
    # on the frozen grid (clamped — stale artifacts meet unseen data)
    state = work_dir("sq8_coarse_refresh_index")
    current = _os.path.join(state, "current")
    (
        sq8_encode_ints(_sq8_residuals(emb, cells_h_df), "rv", mn, rng, clamp=True)
        .write.mode("overwrite")
        .partitionBy("label")
        .parquet(current)
    )

    # refresh: new INT centroids over the full corpus
    cells_f = ivf_sq8_cells(emb)
    cells_f_df = spark.createDataFrame(cells_f, "label int, cq array<bigint>")
    h_map = dict(cells_h)
    f_map = dict(cells_f)
    missing = sorted(set(f_map) - set(h_map))
    if missing:
        # a cell absent from the original half has no stale centroid —
        # its vectors could never have been encoded, premise violated
        raise AssertionError(f"cells absent from the stale index: {missing}")
    changed = sorted(lb for lb in f_map if f_map[lb] != h_map[lb])
    n_changed_cells = len(changed)

    # stat-pin the live index: no file may change before the swap
    def stat_map(root: str) -> dict[str, tuple[int, int]]:
        out = {}
        for r, _, files in _os.walk(root):
            for fn in files:
                p = _os.path.join(r, fn)
                st = _os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
        return out

    pre_stats = stat_map(current)

    staged = _os.path.join(state, "staged")
    _shutil.rmtree(staged, ignore_errors=True)
    _os.makedirs(staged, exist_ok=True)
    if changed:
        # re-encode ONLY the moved cells' vectors against the fresh
        # centroids (residual grid frozen)
        moved = emb.where(F.col("label").isin(changed))
        (
            sq8_encode_ints(
                _sq8_residuals(moved, cells_f_df), "rv", mn, rng, clamp=True
            )
            .write.mode("overwrite")
            .partitionBy("label")
            .parquet(staged)
        )
    # unchanged cells: file-level copy, never re-encoded (object store:
    # server-side copy/rename — metadata-rate)
    for d in _os.listdir(current):
        if d.startswith("label=") and int(d.split("=", 1)[1]) not in changed:
            _shutil.copytree(_os.path.join(current, d), _os.path.join(staged, d))

    if stat_map(current) != pre_stats:
        raise AssertionError("live index files changed before the swap")
    retired = current + "_retired"
    _shutil.rmtree(retired, ignore_errors=True)
    _os.replace(current, retired)
    _os.replace(staged, current)
    _shutil.rmtree(retired, ignore_errors=True)

    # probe the refreshed index; RAISE unless bit-identical to a full
    # re-encode against (fresh cells, frozen grid)
    queries = _collect_query_eq(emb.where(F.col("vec_id") < N_QUERIES))
    probed = ivf_sq8_probes(queries, cells_f)
    all_probed = sorted({lb for labs in probed.values() for lb in labs})
    refreshed = spark.read.parquet(current).where(
        F.col("label").isin(all_probed)
    )
    probe = ivf_sq8_residual_scan_topk(
        refreshed, queries, probed, mn, rng, cells_f, TOPK
    )
    probe_rows = probe.collect()
    full_codes = sq8_encode_ints(
        _sq8_residuals(emb, cells_f_df), "rv", mn, rng, clamp=True
    ).where(F.col("label").isin(all_probed))
    full = ivf_sq8_residual_scan_topk(
        full_codes, queries, probed, mn, rng, cells_f, TOPK
    )
    if sorted(map(tuple, probe_rows)) != sorted(map(tuple, full.collect())):
        raise AssertionError(
            "incremental coarse refresh probe differs from the full re-encode"
        )

    n_total = emb.count()
    n_moved = emb.where(F.col("label").isin(changed)).count() if changed else 0
    counts = spark.createDataFrame(
        [(int(n_moved), int(n_total), int(n_changed_cells))],
        "n_moved bigint, n_total bigint, n_changed_cells bigint",
    )
    out = spark.createDataFrame(probe_rows, probe.schema)
    return out.crossJoin(F.broadcast(counts)).orderBy("qid", "rk")


# --------------------------------------------------------------------------
# Residual-grid drift monitor (round 16, VERDICT r15 missing 2):
# q_sq8_grid_drift audits the RAW per-dim grid, but the shipped layout
# (q_ann_sq8_residual_persisted) quantizes RESIDUALS — and residual drift
# has a second mode the raw monitor is blind to: cells can drift WITHIN
# the corpus envelope (raw saturation 0) while their members' residuals
# against the frozen centroids walk out of the trained residual range.
# Same read-out contract as the raw monitor: grid trained on the
# even-vec_id half (the original build), audit over the odd half's
# residuals AGAINST THE FROZEN CELLS (new data encodes against the
# existing centroids — that is what saturates in production), total
# out-of-grid count, low/high split, worst dimension's share. The
# blind-spot geometry (within-envelope cell drift: raw monitor 0,
# residual monitor alarms) is property-pinned in tests/test_plans.py.
#
# Scale: the residualize is the one bounded |cells|-row join the family
# already pays; the audit is ONE scan ending in 3·dim partial-agg cells.
# --------------------------------------------------------------------------


def _arr_raw_minmax(
    df: DataFrame, col: str, dim: int = SQ8_DIM
) -> tuple[list[int], list[int]]:
    """Per-dim raw (mn, mx) of an int64 array column — no rng floor; one
    scan, 2·dim partial-agg cells."""
    aggs = [
        F.min(F.element_at(col, d + 1)).alias(f"mn{d}") for d in range(dim)
    ] + [F.max(F.element_at(col, d + 1)).alias(f"mx{d}") for d in range(dim)]
    row = df.agg(*aggs).collect()[0]
    return (
        [int(row[f"mn{d}"]) for d in range(dim)],
        [int(row[f"mx{d}"]) for d in range(dim)],
    )


def _arr_out_of_grid_count(
    df: DataFrame, col: str, mn: list[int], mx: list[int], dim: int = SQ8_DIM
) -> int:
    """Total out-of-grid values of an int64 array column under a [mn, mx]
    grid — one scan ending in dim partial-agg cells."""
    el = [F.element_at(col, d + 1) for d in range(dim)]
    aggs = [
        F.sum(
            F.when((el[d] < F.lit(mn[d])) | (el[d] > F.lit(mx[d])), 1).otherwise(0)
        )
        .cast("bigint")
        .alias(f"o{d}")
        for d in range(dim)
    ]
    row = df.agg(*aggs).collect()[0]
    return sum(int(row[f"o{d}"]) for d in range(dim))


_SQL_SQ8_RES_DRIFT_BASE = f"""
    eq AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS eqv
           FROM embeddings),
    ev AS (SELECT vec_id, d, eqv[d] AS e
           FROM eq, generate_series(1, {SQ8_DIM}) g(d)),
    lbl AS (SELECT vec_id, label FROM embeddings),
    cch AS (SELECT l.label, v.d,
                   CAST(floor(CAST(SUM(v.e) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cq
            FROM ev v JOIN lbl l ON v.vec_id = l.vec_id
            WHERE v.vec_id % 2 = 0
            GROUP BY l.label, v.d),
    rv AS (SELECT e.vec_id, e.d, e.e - c.cq AS r, c.cq AS cq
           FROM ev e JOIN lbl l ON e.vec_id = l.vec_id
           JOIN cch c ON c.label = l.label AND c.d = e.d)"""


@register(
    "q_sq8_residual_grid_drift",
    f"""
    WITH {_SQL_SQ8_RES_DRIFT_BASE},
    st AS (SELECT d, MIN(r) AS mn, MAX(r) AS mx
           FROM rv WHERE vec_id % 2 = 0 GROUP BY d),
    audit AS (
      SELECT v.d,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN v.r < s.mn THEN 1 ELSE 0 END) AS BIGINT) AS lo,
             CAST(SUM(CASE WHEN v.r > s.mx THEN 1 ELSE 0 END) AS BIGINT) AS hi
      FROM rv v JOIN st s ON v.d = s.d
      WHERE v.vec_id % 2 = 1
      GROUP BY v.d
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_values,
                   CAST(SUM(lo) AS BIGINT) AS n_sat_lo,
                   CAST(SUM(hi) AS BIGINT) AS n_sat_hi
            FROM audit),
    worst AS (SELECT d, lo + hi AS sat, n FROM audit
              ORDER BY sat DESC, d LIMIT 1)
    SELECT t.n_values, t.n_sat_lo, t.n_sat_hi,
           CAST(w.d - 1 AS INT) AS worst_dim,
           CAST(floor(w.sat * 1048576.0 / w.n + 0.5) AS BIGINT)
             AS worst_dim_sat_q20
    FROM tot t, worst w
    """,
    doc="RESIDUAL-grid drift monitor — the q_sq8_grid_drift twin over the "
    "grid the shipped layout actually trains (residuals against the "
    "frozen INT cells): per-dim [mn,mx] ranges from the even-half "
    "residuals audited against the odd half's residuals vs the SAME "
    "frozen cells; catches the mode the raw monitor is blind to (cells "
    "drifting within the corpus envelope — raw saturation 0, residual "
    "saturation alarms; property-pinned on constructed geometry); one "
    "bounded |cells| join + one 3·dim-cell scan, all-integer, full value "
    "oracle.",
)
def q_sq8_residual_grid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    return sq8_residual_grid_drift_readout(spark, emb)


def sq8_residual_grid_drift_readout(
    spark: SparkSession, emb: DataFrame
) -> DataFrame:
    """Drift audit body over any (vec_id, embedding, label) frame —
    frozen cells + residual grid from the even-vec_id half, audit over
    the odd half's residuals against those frozen cells."""
    import math as _math

    cells_h = ivf_sq8_cells(emb.where(F.col("vec_id") % 2 == 0))
    cells_h_df = spark.createDataFrame(cells_h, "label int, cq array<bigint>")
    rem = _sq8_residuals(emb, cells_h_df)
    mn, mx = _arr_raw_minmax(rem.where(F.col("vec_id") % 2 == 0), "rv")

    audit = rem.where(F.col("vec_id") % 2 == 1)
    el = [F.element_at("rv", d + 1) for d in range(SQ8_DIM)]
    aggs = []
    for d in range(SQ8_DIM):
        aggs.append(F.count(el[d]).cast("bigint").alias(f"n{d}"))
        aggs.append(
            F.sum(F.when(el[d] < F.lit(mn[d]), 1).otherwise(0))
            .cast("bigint")
            .alias(f"lo{d}")
        )
        aggs.append(
            F.sum(F.when(el[d] > F.lit(mx[d]), 1).otherwise(0))
            .cast("bigint")
            .alias(f"hi{d}")
        )
    arow = audit.agg(*aggs).collect()[0]  # bounded: 3·dim cells
    n_values = sum(int(arow[f"n{d}"]) for d in range(SQ8_DIM))
    n_lo = sum(int(arow[f"lo{d}"]) for d in range(SQ8_DIM))
    n_hi = sum(int(arow[f"hi{d}"]) for d in range(SQ8_DIM))
    worst_d, worst_sat, worst_n = 0, -1, 1
    for d in range(SQ8_DIM):
        sat = int(arow[f"lo{d}"]) + int(arow[f"hi{d}"])
        if sat > worst_sat:
            worst_d, worst_sat, worst_n = d, sat, int(arow[f"n{d}"])
    out = (
        n_values,
        n_lo,
        n_hi,
        worst_d,
        int(_math.floor(worst_sat * 1048576.0 / worst_n + 0.5)),
    )
    return spark.createDataFrame(
        [out],
        "n_values bigint, n_sat_lo bigint, n_sat_hi bigint, "
        "worst_dim int, worst_dim_sat_q20 bigint",
    )


# --------------------------------------------------------------------------
# Residual-grid refresh (round 16, VERDICT r15 missing 2 — the apply):
# when the residual drift monitor fires, retrain the residual [mn, rng]
# grid on the GROWN corpus's residuals against the FROZEN cells (the
# centroids do not move here — that is the coarse refresh's job above),
# re-encode, swap by staged rename, RAISE unless the refreshed serving
# probe is bit-identical to a from-scratch rebuild on the fresh grid.
# The q_sq8_grid_refresh shape in residual space; same honest full-rewrite
# cost under the array-row layout (a changed grid changes every code
# array; the per-dim partial path is the dim-columnar experiment below).
# --------------------------------------------------------------------------


@register(
    "q_sq8_residual_grid_refresh",
    f"""
    WITH {_SQL_SQ8_RES_DRIFT_BASE},
    sth AS (SELECT d, MIN(r) AS mn, MAX(r) AS mx
            FROM rv WHERE vec_id % 2 = 0 GROUP BY d),
    stf AS (SELECT d, MIN(r) AS mn, MAX(r) AS mx FROM rv GROUP BY d),
    mvd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dims_moved
            FROM sth h JOIN stf f ON h.d = f.d
            WHERE h.mn <> f.mn OR h.mx <> f.mx),
    satb AS (SELECT CAST(SUM(CASE WHEN v.r < h.mn OR v.r > h.mx
                                  THEN 1 ELSE 0 END) AS BIGINT) AS n_sat_before
             FROM rv v JOIN sth h ON v.d = h.d),
    sata AS (SELECT CAST(SUM(CASE WHEN v.r < f.mn OR v.r > f.mx
                                  THEN 1 ELSE 0 END) AS BIGINT) AS n_sat_after
             FROM rv v JOIN stf f ON v.d = f.d),
    rrec AS (SELECT v.vec_id, v.d,
                    v.cq * {SQ8_LEVELS} + f.mn * {SQ8_LEVELS}
                      + ((v.r - f.mn) * {SQ8_LEVELS})
                          // GREATEST(f.mx - f.mn, 1)
                          * GREATEST(f.mx - f.mn, 1) AS ra
             FROM rv v JOIN stf f ON v.d = f.d),
    qv AS (SELECT vec_id AS qid, d, e FROM ev WHERE vec_id < {N_QUERIES}),
    qc AS (SELECT q.qid, c.label, SUM((q.e - c.cq) * (q.e - c.cq)) AS cdist
           FROM qv q JOIN cch c ON q.d = c.d GROUP BY q.qid, c.label),
    probes AS (SELECT qid, label FROM (
      SELECT qid, label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cdist ASC, label) AS prk
      FROM qc) WHERE prk <= {IVF_NPROBE}),
    cand AS (SELECT p.qid, r.vec_id, r.d, r.ra
             FROM rrec r JOIN lbl l ON r.vec_id = l.vec_id
             JOIN probes p ON l.label = p.label
             WHERE r.vec_id <> p.qid),
    qs AS (SELECT qid, d, e * {SQ8_LEVELS} AS qs FROM qv),
    dd AS (SELECT c.qid, c.vec_id, SUM((q.qs - c.ra) * (q.qs - c.ra)) AS dist
           FROM cand c JOIN qs q ON q.qid = c.qid AND q.d = c.d
           GROUP BY c.qid, c.vec_id)
    SELECT t.qid, t.neighbor_id, t.rk,
           m.n_dims_moved, b.n_sat_before, a.n_sat_after
    FROM (
      SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dist ASC, vec_id) AS rk
        FROM dd) WHERE rk <= {TOPK}
    ) t, mvd m, satb b, sata a
    ORDER BY t.qid, t.rk
    """,
    doc="residual-grid REFRESH — the q_sq8_residual_grid_drift APPLY "
    "step: the residual [mn,rng] grid (trained on the even-half "
    "residuals) is retrained on the full corpus's residuals against the "
    "FROZEN cells, every vector re-encoded, staged-rename swap with the "
    "live index stat-pinned until the swap; RAISES unless the refreshed "
    "residual serving probe is bit-identical to a from-scratch rebuild; "
    "emits the refreshed top-k plus n_dims_moved and the out-of-grid "
    "saturation count before (the alarm) / after (0 — acceptance); "
    "all-integer, full value oracle.",
)
def q_sq8_residual_grid_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    return sq8_residual_grid_refresh_readout(spark, emb)


def sq8_residual_grid_refresh_readout(
    spark: SparkSession, emb: DataFrame
) -> DataFrame:
    """The residual-grid refresh over ANY (vec_id, embedding, label)
    frame — split from the registered query so tests can drive it with
    constructed within-cell drift geometry."""
    import os as _os
    import shutil as _shutil

    # frozen cells (the original build's centroids — they do NOT move)
    cells_h = ivf_sq8_cells(emb.where(F.col("vec_id") % 2 == 0))
    cells_h_df = spark.createDataFrame(cells_h, "label int, cq array<bigint>")
    rem = _sq8_residuals(emb, cells_h_df)

    # stale residual grid: trained on the even-half residuals
    mn_h, mx_h = _arr_raw_minmax(rem.where(F.col("vec_id") % 2 == 0), "rv")
    rng_h = [max(mx_h[d] - mn_h[d], 1) for d in range(len(mn_h))]

    # the live index: the FULL corpus encoded on the stale grid (clamped
    # — the stale grid meets residuals it was not trained on)
    state = work_dir("sq8_res_grid_refresh_index")
    current = _os.path.join(state, "current")
    (
        sq8_encode_ints(rem, "rv", mn_h, rng_h, clamp=True)
        .write.mode("overwrite")
        .partitionBy("label")
        .parquet(current)
    )

    # the alarm's number: out-of-grid residuals under the stale grid
    n_sat_before = _arr_out_of_grid_count(rem, "rv", mn_h, mx_h)

    # refresh: retrain the residual grid on the full corpus (cells frozen)
    mn_f, mx_f = _arr_raw_minmax(rem, "rv")
    rng_f = [max(mx_f[d] - mn_f[d], 1) for d in range(len(mn_f))]
    n_dims_moved = sum(
        1 for d in range(len(mn_f)) if mn_h[d] != mn_f[d] or mx_h[d] != mx_f[d]
    )
    n_sat_after = _arr_out_of_grid_count(rem, "rv", mn_f, mx_f)

    def stat_map(root: str) -> dict[str, tuple[int, int]]:
        out = {}
        for r, _, files in _os.walk(root):
            for fn in files:
                p = _os.path.join(r, fn)
                st = _os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
        return out

    pre_stats = stat_map(current)

    staged = _os.path.join(state, "staged")
    _shutil.rmtree(staged, ignore_errors=True)
    (
        sq8_encode_ints(rem, "rv", mn_f, rng_f)
        .write.mode("overwrite")
        .partitionBy("label")
        .parquet(staged)
    )

    if stat_map(current) != pre_stats:
        raise AssertionError("live index files changed before the swap")
    retired = current + "_retired"
    _shutil.rmtree(retired, ignore_errors=True)
    _os.replace(current, retired)
    _os.replace(staged, current)
    _shutil.rmtree(retired, ignore_errors=True)

    # probe the refreshed index; RAISE unless bit-identical to a
    # from-scratch rebuild on the fresh grid
    queries = _collect_query_eq(emb.where(F.col("vec_id") < N_QUERIES))
    probed = ivf_sq8_probes(queries, cells_h)
    all_probed = sorted({lb for labs in probed.values() for lb in labs})
    refreshed = spark.read.parquet(current).where(F.col("label").isin(all_probed))
    probe = ivf_sq8_residual_scan_topk(
        refreshed, queries, probed, mn_f, rng_f, cells_h, TOPK
    )
    probe_rows = probe.collect()
    full = ivf_sq8_residual_scan_topk(
        sq8_encode_ints(rem, "rv", mn_f, rng_f).where(
            F.col("label").isin(all_probed)
        ),
        queries,
        probed,
        mn_f,
        rng_f,
        cells_h,
        TOPK,
    )
    if sorted(map(tuple, probe_rows)) != sorted(map(tuple, full.collect())):
        raise AssertionError("refreshed probe differs from the full rebuild")

    counts = spark.createDataFrame(
        [(int(n_dims_moved), int(n_sat_before), int(n_sat_after))],
        "n_dims_moved bigint, n_sat_before bigint, n_sat_after bigint",
    )
    out = spark.createDataFrame(probe_rows, probe.schema)
    return out.crossJoin(F.broadcast(counts)).orderBy("qid", "rk")


# --------------------------------------------------------------------------
# Dim-columnar SQ8 layout + PARTIAL grid refresh (round 16, VERDICT r15
# missing 4): the design point SCALING.md named for q_sq8_grid_refresh —
# under the array-row code layout a changed grid rewrites EVERY row, but
# per-dimension the work is partial: an unchanged dim's (mn, mx) maps
# every value to the same code, so only moved dims actually recode. This
# experiment materializes the code table DIM-PARTITIONED — rows
# (vec_id, code) under one d=K subdir per dimension (the parquet
# equivalent of one int8 column chunk per dim) — and implements the
# refresh that rewrites ONLY the moved dims' subdirs (per-dim staged
# write + atomic dir replace), with every unmoved dim's files stat-pinned
# byte-untouched ACROSS the whole refresh, not just until a swap. At
# 100 TB rewriting 2/64 of the code bytes is a background task where the
# full rewrite is a reindex outage.
#
# Serving reassembles the row layout with a ZIPPER MERGE (round 17,
# VERDICT r16 missing 4 — this replaced the round-16 groupBy(vec_id)
# collect_list reassembly, whose N·dim shuffle was 64× the logical table
# at scale): every d=K subdir is written vec_id-co-bucketed AND
# vec_id-sorted (bucket = vec_id % B, one file per (dim, bucket)), so
# one task per bucket opens its |dim| co-sorted column files and zips
# them POSITIONALLY — zero Exchange in the reassembly (plan-pinned), the
# q_bucketed_join_revenue discipline applied per dim. Co-sortedness is
# not assumed: the zipper RAISES unless every dim's vec_id sequence is
# byte-identical to dim 0's. Serving must be bit-identical to the
# array-row rebuild on the fresh grid (in-query RAISE + suite pin).
#
# The trade the read-out exposes: the array-row layout rides one Arrow
# column into the numpy scan (fastest serving); the dim-columnar layout
# pays a reassembly (or per-dim distance partials) to make grid refresh
# O(moved_dims/dim) instead of O(1 full rewrite). Keep serving on
# array-row, flip to dim-columnar when the drift monitor fires often.
# --------------------------------------------------------------------------


@register(
    "q_sq8_dim_columnar_refresh",
    f"""
    WITH {_SQL_SQ8_CTES},
    sth AS (SELECT d, MIN(e) AS mn, MAX(e) AS mx
            FROM ev WHERE vec_id % 2 = 0 GROUP BY d),
    stf AS (SELECT d, MIN(e) AS mn, MAX(e) AS mx FROM ev GROUP BY d),
    mvd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dims_moved
            FROM sth h JOIN stf f ON h.d = f.d
            WHERE h.mn <> f.mn OR h.mx <> f.mx)
    SELECT t.qid, t.neighbor_id, t.rk,
           m.n_dims_moved, CAST({SQ8_DIM} AS BIGINT) AS n_dims_total
    FROM (
      SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dist ASC, vec_id) AS rk
        FROM sq8d) WHERE rk <= {TOPK}
    ) t, mvd m
    ORDER BY t.qid, t.rk
    """,
    doc="DIM-COLUMNAR SQ8 layout + partial grid refresh (the design "
    "point q_sq8_grid_refresh documents): codes land dim-partitioned "
    "(one d=K subdir per dimension — parquet's stand-in for one int8 "
    "column chunk per dim); refreshing the grid rewrites ONLY the moved "
    "dims' subdirs (per-dim staged write + atomic dir replace) while "
    "every unmoved dim's files are stat-pinned byte-untouched across the "
    "WHOLE refresh; serving reassembles rows via one groupBy(vec_id) and "
    "RAISES unless bit-identical to the array-row rebuild on the fresh "
    "grid; emits the refreshed top-k plus (n_dims_moved, n_dims_total) — "
    "the measured rewrite fraction; all-integer, full value oracle.",
)
def q_sq8_dim_columnar_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return sq8_dim_columnar_refresh_readout(spark, emb)


SQ8_DIMCOL_BUCKETS = 4


def sq8_dim_columnar_write(coded: DataFrame, root: str, buckets: int) -> None:
    """Materialize a (vec_id, codes) table dim-columnar: one d=K/bucket=b
    subdir per (dimension, vec_id-bucket), each holding ONE file sorted
    by vec_id — the co-bucketed co-sorted layout the zipper merge reads
    back without a shuffle. A bucket lives in exactly one write task
    (repartition on the bucket key) and the task is sorted (bucket, d,
    vec_id), so every (d, b) file comes out vec_id-ordered."""
    (
        coded.select("vec_id", F.posexplode("codes").alias("d", "code"))
        .withColumn("bucket", (F.col("vec_id") % buckets).cast("int"))
        .repartition(buckets, "bucket")
        # sorted in the WRITER'S partition-column order (d, bucket) so
        # the dynamic-partition writer adds no sort of its own — its
        # re-sort is not stable and would scramble vec_id within files
        .sortWithinPartitions("d", "bucket", "vec_id")
        .write.mode("overwrite")
        .partitionBy("d", "bucket")
        .parquet(root)
    )


def sq8_dim_columnar_zipper(
    spark: SparkSession, root: str, dim: int, buckets: int
) -> DataFrame:
    """Zero-shuffle row reassembly of the co-bucketed co-sorted
    dim-columnar layout: one task per bucket opens its ``dim`` column
    files and zips them POSITIONALLY into (vec_id, codes) rows —
    the scan-side zipper merge (no Exchange anywhere in the plan,
    pinned in tests/test_plans.py). RAISES unless every dim's vec_id
    sequence matches dim 0's (co-sortedness is verified, not assumed)."""

    def zip_bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq

        for pdf in batches:
            for b in pdf["id"]:
                b = int(b)
                vec = None
                cols = []
                missing = 0
                for d in range(dim):
                    files = sorted(
                        _glob.glob(
                            _os.path.join(
                                root, f"d={d}", f"bucket={b}", "*.parquet"
                            )
                        )
                    )
                    if not files:
                        missing += 1
                        continue
                    if len(files) != 1:
                        raise AssertionError(
                            f"dim {d} bucket {b}: expected one co-sorted "
                            f"file, got {len(files)}"
                        )
                    tbl = _pq.read_table(files[0], columns=["vec_id", "code"])
                    v = tbl.column("vec_id").to_numpy()
                    if vec is None:
                        vec = v
                    elif not np.array_equal(vec, v):
                        raise AssertionError(
                            f"dim {d} bucket {b} is not co-sorted with dim 0"
                        )
                    cols.append(tbl.column("code").to_numpy())
                if missing == dim:
                    continue  # empty bucket: no vectors hashed here
                if missing:
                    raise AssertionError(
                        f"bucket {b}: {missing}/{dim} dim files missing"
                    )
                yield pd.DataFrame(
                    {
                        "vec_id": vec,
                        "codes": np.stack(cols, axis=1)
                        .astype(np.int32)
                        .tolist(),
                    }
                )

    # B rows pre-split into B partitions: no Exchange feeds the zipper
    return spark.range(0, buckets, 1, buckets).mapInPandas(
        zip_bucket, "vec_id long, codes array<int>"
    )


@register(
    "q_sq8_dim_columnar_serve",
    f"""
    WITH {_SQL_SQ8_CTES}
    SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM sq8d) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """,
    doc="SQ8 serving over the DIM-COLUMNAR layout via the scan-side "
    "ZIPPER MERGE: the code table lands as one vec_id-co-bucketed, "
    "vec_id-sorted file per (dim, bucket); serving reassembles rows "
    "with one task per bucket zipping its 64 column files positionally "
    "— ZERO Exchange in the reassembly (plan-pinned; the round-16 "
    "groupBy reassembly paid an N·dim shuffle, 64× the logical table "
    "at 100 TB), co-sortedness verified per dim (RAISES on mismatch), "
    "then the standard asymmetric top-k; RAISES unless bit-identical "
    "to serving the array-row encode; shared ranking oracle with "
    "q_ann_sq8_topk.",
)
def q_sq8_dim_columnar_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mn, rng = sq8_stats(emb)
    root = _os.path.join(work_dir("sq8_dimcol_serve_index"), "codes")
    sq8_dim_columnar_write(sq8_encode(emb, mn, rng), root, SQ8_DIMCOL_BUCKETS)
    codes_arr = sq8_dim_columnar_zipper(
        spark, root, SQ8_DIM, SQ8_DIMCOL_BUCKETS
    )
    queries = _collect_query_eq(emb.where(F.col("vec_id") < N_QUERIES))
    probe = sq8_topk(codes_arr, queries, mn, rng, TOPK)
    probe_rows = probe.collect()
    full = sq8_topk(sq8_encode(emb, mn, rng), queries, mn, rng, TOPK)
    if sorted(map(tuple, probe_rows)) != sorted(map(tuple, full.collect())):
        raise AssertionError(
            "zipper-merge serving differs from the array-row scan"
        )
    out = spark.createDataFrame(probe_rows, probe.schema)
    return out.orderBy("qid", "rk")


def sq8_dim_columnar_refresh_readout(
    spark: SparkSession, emb: DataFrame
) -> DataFrame:
    """The dim-columnar refresh over ANY (vec_id, embedding) frame —
    split from the registered query so tests can drive it with a
    constructed corpus where exactly K dims move (the rewrite-fraction
    measurement)."""
    import os as _os
    import shutil as _shutil

    # stale grid: trained on the even-vec_id half (the original build)
    mn_h, mx_h = _sq8_raw_minmax(emb.where(F.col("vec_id") % 2 == 0))
    rng_h = [max(mx_h[d] - mn_h[d], 1) for d in range(len(mn_h))]

    # the live index, DIM-PARTITIONED and vec_id-co-bucketed/sorted:
    # (vec_id, code) under d=K/bucket=b subdirs — the zipper layout
    state = work_dir("sq8_dimcol_index")
    root = _os.path.join(state, "codes")
    sq8_dim_columnar_write(
        sq8_encode(emb, mn_h, rng_h), root, SQ8_DIMCOL_BUCKETS
    )

    # refresh: fresh grid over the full corpus; moved dims only
    mn_f, mx_f = _sq8_raw_minmax(emb)
    rng_f = [max(mx_f[d] - mn_f[d], 1) for d in range(len(mn_f))]
    moved = [
        d
        for d in range(len(mn_f))
        if mn_h[d] != mn_f[d] or mx_h[d] != mx_f[d]
    ]

    def stat_map(path: str) -> dict[str, tuple[int, int]]:
        out = {}
        for r, _, files in _os.walk(path):
            for fn in files:
                p = _os.path.join(r, fn)
                st = _os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
        return out

    # unmoved dims' column files must survive the WHOLE refresh untouched
    unmoved_pre = {
        d: stat_map(_os.path.join(root, f"d={d}"))
        for d in range(len(mn_f))
        if d not in moved
    }

    # rewrite ONLY the moved dims: per-dim staged write + atomic replace
    for d in moved:
        # the one-dim slice of sq8_encode's exact integer expression
        col_df = emb.select(
            "vec_id",
            F.expr(
                f"CAST(((floor(CAST(element_at(embedding, {d + 1}) AS DOUBLE)"
                f" * {QUANT} + 0.5D) - {mn_f[d]}L) * {SQ8_LEVELS})"
                f" DIV {rng_f[d]}L AS INT)"
            ).alias("code"),
        )
        staged_d = _os.path.join(state, f"staged_d{d}")
        _shutil.rmtree(staged_d, ignore_errors=True)
        (
            col_df.withColumn(
                "bucket",
                (F.col("vec_id") % SQ8_DIMCOL_BUCKETS).cast("int"),
            )
            .repartition(SQ8_DIMCOL_BUCKETS, "bucket")
            .sortWithinPartitions("bucket", "vec_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(staged_d)
        )
        target = _os.path.join(root, f"d={d}")
        retired = _os.path.join(state, f"retired_d{d}")
        _shutil.rmtree(retired, ignore_errors=True)
        _os.replace(target, retired)
        _os.replace(staged_d, target)
        _shutil.rmtree(retired, ignore_errors=True)

    unmoved_post = {
        d: stat_map(_os.path.join(root, f"d={d}")) for d in unmoved_pre
    }
    if unmoved_post != unmoved_pre:
        raise AssertionError("unmoved dims' column files were rewritten")

    # serving: the scan-side zipper merge over the co-sorted layout —
    # zero Exchange (the round-16 groupBy reassembly paid an N·dim
    # shuffle here)
    codes_arr = sq8_dim_columnar_zipper(
        spark, root, len(mn_f), SQ8_DIMCOL_BUCKETS
    )
    queries = _collect_query_eq(emb.where(F.col("vec_id") < N_QUERIES))
    probe = sq8_topk(codes_arr, queries, mn_f, rng_f, TOPK)
    probe_rows = probe.collect()
    full = sq8_topk(sq8_encode(emb, mn_f, rng_f), queries, mn_f, rng_f, TOPK)
    if sorted(map(tuple, probe_rows)) != sorted(map(tuple, full.collect())):
        raise AssertionError(
            "dim-columnar serving differs from the array-row rebuild"
        )

    counts = spark.createDataFrame(
        [(int(len(moved)), int(len(mn_f)))],
        "n_dims_moved bigint, n_dims_total bigint",
    )
    out = spark.createDataFrame(probe_rows, probe.schema)
    return out.crossJoin(F.broadcast(counts)).orderBy("qid", "rk")


# --------------------------------------------------------------------------
# Merge-on-read DELETES for the persisted SQ8 index (round 16, beyond the
# brief): the one lifecycle verb the index families lacked. Production
# vector stores take deletes as a tombstone list against immutable code
# files (Milvus delta deletes, Lucene live-docs bitmaps) — serving
# anti-joins the tombstones (merge-on-read), and a maintenance pass later
# APPLIES them by rewriting the files without the deleted rows (the
# manifest family's q_manifest_row_deletes / merge-on-read pattern, now
# on the ANN side). The trained artifacts (grid, cells) are NOT retrained
# on delete — that is drift-monitor territory; a delete only removes
# candidates.
#
# Scale: the tombstone anti-join is an equi-join on vec_id (broadcast
# while the tombstone list fits, shuffle past that — unhinted, the
# vocab-join discipline); the apply pass is one partitioned rewrite at
# maintenance cadence with the staged-rename swap, and serving afterwards
# reads strictly fewer bytes. Deterministic delete predicate (vec_id %
# 7 == 3) keeps the whole chain value-checkable by the oracle.
# --------------------------------------------------------------------------

_SQ8_DELETE_MOD = 7
_SQ8_DELETE_RESIDUE = 3


def _sq8_delete_oracle(base_sql: str) -> str:
    """The family oracle minus tombstoned candidates: the delete filter
    lands ONLY in the candidate clause — artifacts (grid, cells) stay
    trained on the full corpus, exactly like the implementation."""
    old = "WHERE r.vec_id <> p.qid"
    assert base_sql.count(old) == 1
    return base_sql.replace(
        old,
        f"WHERE r.vec_id <> p.qid"
        f" AND r.vec_id % {_SQ8_DELETE_MOD} <> {_SQ8_DELETE_RESIDUE}",
    )


_SQL_SQ8_DELETE = _sq8_delete_oracle(_SQL_IVF_SQ8)
_SQL_SQ8_RES_DELETE = _sq8_delete_oracle(_SQL_IVF_SQ8_RESIDUAL)


def _sq8_tombstones(emb: DataFrame) -> DataFrame:
    """The FIXTURE tombstone list: (vec_id) of deleted vectors via the
    deterministic predicate, so the whole delete chain stays
    value-checkable by the oracle. The operator contract the bodies
    below actually take is "deletes arrive as a keys TABLE" — any
    (vec_id) DataFrame works (e.g. an erasure-request feed, or the
    manifest family's delete files projected to keys); this predicate
    is just that contract's deterministic instance."""
    return emb.select("vec_id").where(
        F.col("vec_id") % _SQ8_DELETE_MOD == _SQ8_DELETE_RESIDUE
    )


def _sq8_delete_family(spark: SparkSession, sf_dir: str, residual: bool):
    """Closures for the delete pair over ONE persisted layout (raw or
    residual — the _sq8_family pattern, so the MOR and APPLY bodies are
    written once): (codes_path, encode survivors fn, serving-scan fn,
    probed labels, queries)."""
    from types import SimpleNamespace

    if residual:
        grid_path, codes_path, cells_path = sq8_residual_index_path(
            spark, sf_dir
        )
    else:
        grid_path, codes_path, cells_path = sq8_index_path(spark, sf_dir)
    [grid] = spark.read.parquet(grid_path).collect()  # bounded: 1 row
    mn, rng = list(grid["mn"]), list(grid["rng"])
    cells_df = spark.read.parquet(cells_path)
    cells = sorted(
        (int(r["label"]), [int(v) for v in r["cq"]])
        for r in cells_df.collect()  # bounded: |cells|
    )
    queries = _collect_query_eq(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    )
    probed = ivf_sq8_probes(queries, cells)
    all_probed = sorted({lb for labs in probed.values() for lb in labs})

    if residual:

        def encode(df: DataFrame) -> DataFrame:
            return sq8_encode_ints(_sq8_residuals(df, cells_df), "rv", mn, rng)

        def scan(pruned: DataFrame) -> DataFrame:
            return ivf_sq8_residual_scan_topk(
                pruned, queries, probed, mn, rng, cells, TOPK
            )

    else:

        def encode(df: DataFrame) -> DataFrame:
            return sq8_encode(df, mn, rng)

        def scan(pruned: DataFrame) -> DataFrame:
            return ivf_sq8_scan_topk(pruned, queries, probed, mn, rng, TOPK)

    return SimpleNamespace(
        codes_path=codes_path, encode=encode, scan=scan, all_probed=all_probed
    )


def _ann_delete_mor_body(
    spark: SparkSession, sf_dir: str, fam, dels: DataFrame
) -> DataFrame:
    """Merge-on-read serving over ANY persisted quantized layout (the
    SQ8/residual-SQ8/PQ/residual-PQ/BQ family namespaces all fit):
    partition-pruned code scan (fam.all_probed None ⇒ a flat layout
    with no coarse prune, the BQ shape) MINUS the tombstone KEYS TABLE
    (dels: any (vec_id) DataFrame — the erasure-feed contract); RAISES
    unless bit-identical to serving over a survivors-only encode
    against the same frozen artifacts."""

    def prune(df: DataFrame) -> DataFrame:
        if fam.all_probed is None:
            return df
        return df.where(F.col("label").isin(fam.all_probed))

    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    pruned = prune(spark.read.parquet(fam.codes_path)).join(
        dels, "vec_id", "left_anti"
    )
    probe = fam.scan(pruned)
    probe_rows = probe.collect()

    survivors = emb.join(dels, "vec_id", "left_anti")
    full = fam.scan(prune(fam.encode(survivors)))
    if sorted(map(tuple, probe_rows)) != sorted(map(tuple, full.collect())):
        raise AssertionError(
            "merge-on-read serving differs from the survivors-only encode"
        )
    out = spark.createDataFrame(probe_rows, probe.schema)
    return out.orderBy("qid", "rk")


def _ann_delete_apply_body(
    spark: SparkSession, sf_dir: str, fam, dels: DataFrame, state_name: str
) -> DataFrame:
    """The APPLY pass over ANY persisted quantized layout: rewrite the
    code table without the tombstoned rows (own copy — the
    session-cached index stays live), staged-rename swap, row delta must
    equal the tombstone count, and serving the compacted index DIRECTLY
    must equal the pre-apply MOR probe. dels is the same keys-table
    contract as the MOR body; fam.partition_by names the layout's
    physical partition columns (empty for flat layouts like BQ)."""
    import os as _os
    import shutil as _shutil

    def prune(df: DataFrame) -> DataFrame:
        if fam.all_probed is None:
            return df
        return df.where(F.col("label").isin(fam.all_probed))

    def write_codes(df: DataFrame, path: str) -> None:
        w = df.write.mode("overwrite")
        part = getattr(fam, "partition_by", ["label"])
        if part:
            w = w.partitionBy(*part)
        w.parquet(path)

    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")

    state = work_dir(state_name)
    current = _os.path.join(state, "codes")
    write_codes(fam.encode(emb), current)

    pre_df = fam.scan(
        prune(spark.read.parquet(current)).join(dels, "vec_id", "left_anti")
    )
    pre = sorted(map(tuple, pre_df.collect()))
    rows_before = spark.read.parquet(current).count()
    # expected removal in ROWS, not keys: SQ8 stores one code row per
    # vector, PQ stores M — count the tombstoned rows actually present
    n_tombstoned_rows = (
        spark.read.parquet(current).join(dels, "vec_id", "semi").count()
    )

    def stat_map(root: str) -> dict[str, tuple[int, int]]:
        out = {}
        for r, _, files in _os.walk(root):
            for fn in files:
                pth = _os.path.join(r, fn)
                st = _os.stat(pth)
                out[pth] = (st.st_size, st.st_mtime_ns)
        return out

    pre_stats = stat_map(current)
    staged = current + "_staged"
    _shutil.rmtree(staged, ignore_errors=True)
    write_codes(
        spark.read.parquet(current).join(dels, "vec_id", "left_anti"), staged
    )
    if stat_map(current) != pre_stats:
        raise AssertionError("live index files changed before the swap")
    retired = current + "_retired"
    _shutil.rmtree(retired, ignore_errors=True)
    _os.replace(current, retired)
    _os.replace(staged, current)
    _shutil.rmtree(retired, ignore_errors=True)

    rows_after = spark.read.parquet(current).count()
    if rows_before - rows_after != n_tombstoned_rows:
        raise AssertionError(
            f"apply dropped {rows_before - rows_after} rows, "
            f"expected {n_tombstoned_rows}"
        )

    post_df = fam.scan(prune(spark.read.parquet(current)))
    post_rows = post_df.collect()
    if sorted(map(tuple, post_rows)) != pre:
        raise AssertionError("probe changed across the delete apply")
    out = spark.createDataFrame(post_rows, post_df.schema)
    return out.orderBy("qid", "rk")


@register(
    "q_ann_sq8_delete_mor",
    _SQL_SQ8_DELETE,
    doc="MERGE-ON-READ deletes for the persisted SQ8 index: serving "
    "anti-joins a tombstone list (deterministic vec_id % "
    f"{_SQ8_DELETE_MOD} == {_SQ8_DELETE_RESIDUE}) against the "
    "label-partitioned code scan — an unhinted vec_id equi-join "
    "(broadcast while the list fits) — with grid and cells untouched "
    "(deletes remove candidates; retraining is the drift monitors' "
    "job); RAISES unless the probe is bit-identical to serving over an "
    "index encoded from only the survivors; full value oracle "
    "(the shared IVF-SQ8 ranking minus tombstoned candidates).",
)
def q_ann_sq8_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    fam = _sq8_delete_family(spark, sf_dir, residual=False)
    emb = tp(spark, sf_dir, "embeddings")
    return _ann_delete_mor_body(spark, sf_dir, fam, _sq8_tombstones(emb))


@register(
    "q_sq8_delete_compact",
    _SQL_SQ8_DELETE,
    doc="delete APPLICATION for the SQ8 index (the maintenance pass that "
    "turns merge-on-read tombstones into physically-compacted files): "
    "the code table is rewritten without the tombstoned rows — per-label "
    "partitioned rewrite, staged-rename swap, live files stat-pinned "
    "until the swap — after which serving reads the compacted index "
    "DIRECTLY (no anti-join) and must be bit-identical to the "
    "merge-on-read probe before the apply (RAISES otherwise); row count "
    "must shrink by exactly the tombstone count; shared oracle with "
    "q_ann_sq8_delete_mor.",
)
def q_sq8_delete_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    fam = _sq8_delete_family(spark, sf_dir, residual=False)
    emb = tp(spark, sf_dir, "embeddings")
    return _ann_delete_apply_body(
        spark, sf_dir, fam, _sq8_tombstones(emb), "sq8_delete_compact_index"
    )


@register(
    "q_ann_sq8_residual_delete_mor",
    _SQL_SQ8_RES_DELETE,
    doc="MERGE-ON-READ deletes for the persisted RESIDUAL SQ8 index — "
    "the layout an SQ8 store actually ships (by_residual default) gets "
    "the same tombstone verb as the raw twin, through the SAME "
    "parameterized body: anti-join on the partition-pruned residual "
    "code scan, artifacts untouched, RAISES unless bit-identical to a "
    "survivors-only residual encode; full value oracle (the residual "
    "ranking minus tombstoned candidates).",
)
def q_ann_sq8_residual_delete_mor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    fam = _sq8_delete_family(spark, sf_dir, residual=True)
    emb = tp(spark, sf_dir, "embeddings")
    return _ann_delete_mor_body(spark, sf_dir, fam, _sq8_tombstones(emb))


@register(
    "q_sq8_residual_delete_compact",
    _SQL_SQ8_RES_DELETE,
    doc="delete APPLICATION for the RESIDUAL SQ8 index: the raw twin's "
    "apply pass through the same parameterized body — partitioned "
    "rewrite without tombstoned rows, staged-rename swap, row delta == "
    "tombstone count, post-apply direct serving == pre-apply MOR probe "
    "(RAISES otherwise); shared oracle with "
    "q_ann_sq8_residual_delete_mor.",
)
def q_sq8_residual_delete_compact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    fam = _sq8_delete_family(spark, sf_dir, residual=True)
    emb = tp(spark, sf_dir, "embeddings")
    return _ann_delete_apply_body(
        spark, sf_dir, fam, _sq8_tombstones(emb), "sq8_res_delete_compact_index"
    )


# --------------------------------------------------------------------------
# Delete lifecycle for the PQ layouts (round 17, VERDICT r16 missing 1):
# the SQ8 family's tombstone verbs on the OTHER two persisted quantized
# layouts — raw IVF-PQ and residual IVF-PQ (the layout a production
# store actually ships). Same parameterized MOR + APPLY bodies, new
# family closures: artifacts = (codebooks, cell-partitioned codes,
# coarse cells); encode survivors = the frozen-artifact ingest encode
# (pq_assign / pq_residual_encode — bit-identical to the index build);
# serving scan = the shared ADC rank (pq_adc_rank / residual_adc_rank).
# A GDPR erasure path is not optional on the shipped layout; this closes
# the lifecycle symmetry (grow/compact/refresh/health existed, delete
# did not).
#
# Scale: identical to the SQ8 twins — the tombstone anti-join is an
# unhinted vec_id equi-join over the PARTITION-PRUNED code scan
# (broadcast while the keys table fits), the apply is one partitioned
# rewrite at maintenance cadence behind a staged-rename swap, and the
# codebooks/cells stay trained on the full corpus (deletes remove
# candidates; retraining is drift-monitor territory).
# --------------------------------------------------------------------------


def _pq_delete_oracle(base_sql: str) -> str:
    """A PQ serving oracle minus tombstoned candidates: the delete
    filter lands ONLY in the candidate clause (cand/rcand) — codebooks
    and cells stay trained on the full corpus, exactly like the
    implementation."""
    old = "WHERE a.vec_id <> p.qid"
    assert base_sql.count(old) == 1
    return base_sql.replace(
        old,
        f"WHERE a.vec_id <> p.qid"
        f" AND a.vec_id % {_SQ8_DELETE_MOD} <> {_SQ8_DELETE_RESIDUE}",
    )


_SQL_PQ_DELETE = _pq_delete_oracle(_IVFPQ_SERVE_ORACLE)
_SQL_PQ_RES_DELETE = _pq_delete_oracle(_ivfpq_residual_serve_oracle())


def _pq_delete_family(spark: SparkSession, sf_dir: str, residual: bool):
    """Closures for the delete pair over ONE persisted PQ layout (raw or
    residual): (codes_path, encode survivors fn, serving-scan fn, probed
    labels) — the namespace _ann_delete_mor_body/_ann_delete_apply_body
    consume, so the MOR and APPLY verbs are written once across all four
    quantized layouts."""
    from types import SimpleNamespace

    if residual:
        cb_path, codes_path, cells_path = pq_residual_index_path(spark, sf_dir)
    else:
        cb_path, codes_path, cells_path = pq_index_path(spark, sf_dir)
    cdf = spark.read.parquet(cb_path)
    cells = spark.read.parquet(cells_path)
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    anchor_ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(PQ_QUERIES).collect()
    ]
    # query-side subvectors only — corpus quantization lives in the index
    q = _pq_subvectors(emb.where(F.col("vec_id").isin(anchor_ids))).select(
        F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv")
    )
    if residual:
        probes, rqd = residual_probe_tables(q, cdf, cells)

        def encode(df: DataFrame) -> DataFrame:
            return pq_residual_encode(df, cells, cdf)

        def scan(pruned: DataFrame) -> DataFrame:
            return residual_adc_rank(pruned, probes, rqd)

    else:
        probes, qd = pq_probe_tables(q, cdf, cells)

        def encode(df: DataFrame) -> DataFrame:
            lbl = df.select("vec_id", "label")
            sv = _pq_subvectors(df.select("vec_id", "embedding"))
            return pq_assign(sv, cdf).join(lbl, "vec_id")

        def scan(pruned: DataFrame) -> DataFrame:
            return pq_adc_rank(pruned, probes, qd)

    # bounded: ≤ Q·nprobe labels — the literal IN partition filter
    all_probed = sorted(
        {r["label"] for r in probes.select("label").distinct().collect()}
    )
    return SimpleNamespace(
        codes_path=codes_path, encode=encode, scan=scan, all_probed=all_probed
    )


@register(
    "q_ann_pq_delete_mor",
    _SQL_PQ_DELETE,
    doc="MERGE-ON-READ deletes for the persisted IVF-PQ index: serving "
    "anti-joins the tombstone keys table (fixture: the deterministic "
    f"vec_id % {_SQ8_DELETE_MOD} == {_SQ8_DELETE_RESIDUE} instance of "
    "the erasure-feed contract) against the partition-pruned "
    "cell-partitioned code scan — an unhinted vec_id equi-join — with "
    "codebooks and cells untouched; RAISES unless the ADC probe is "
    "bit-identical to serving over an index encoded from only the "
    "survivors; full value oracle (the shared IVFADC serving chain "
    "minus tombstoned candidates).",
)
def q_ann_pq_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    fam = _pq_delete_family(spark, sf_dir, residual=False)
    emb = tp(spark, sf_dir, "embeddings")
    return _ann_delete_mor_body(spark, sf_dir, fam, _sq8_tombstones(emb))


@register(
    "q_pq_delete_compact",
    _SQL_PQ_DELETE,
    doc="delete APPLICATION for the IVF-PQ index: the code table is "
    "rewritten without the tombstoned rows — per-label partitioned "
    "rewrite, staged-rename swap, live files stat-pinned until the "
    "swap — after which serving reads the compacted index DIRECTLY (no "
    "anti-join) and must be bit-identical to the merge-on-read probe "
    "before the apply (RAISES otherwise); row delta must equal the "
    "tombstone count; shared oracle with q_ann_pq_delete_mor.",
)
def q_pq_delete_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    fam = _pq_delete_family(spark, sf_dir, residual=False)
    emb = tp(spark, sf_dir, "embeddings")
    return _ann_delete_apply_body(
        spark, sf_dir, fam, _sq8_tombstones(emb), "pq_delete_compact_index"
    )


@register(
    "q_ann_pq_residual_delete_mor",
    _SQL_PQ_RES_DELETE,
    doc="MERGE-ON-READ deletes for the persisted RESIDUAL IVF-PQ index — "
    "the layout a production PQ store actually ships gets the same "
    "tombstone verb through the SAME parameterized body: anti-join of "
    "the keys table on the partition-pruned residual code scan, "
    "artifacts untouched, RAISES unless bit-identical to a "
    "survivors-only pq_residual_encode; full value oracle (the residual "
    "ADC serving chain minus tombstoned candidates).",
)
def q_ann_pq_residual_delete_mor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    fam = _pq_delete_family(spark, sf_dir, residual=True)
    emb = tp(spark, sf_dir, "embeddings")
    return _ann_delete_mor_body(spark, sf_dir, fam, _sq8_tombstones(emb))


@register(
    "q_pq_residual_delete_compact",
    _SQL_PQ_RES_DELETE,
    doc="delete APPLICATION for the RESIDUAL IVF-PQ index: partitioned "
    "rewrite without tombstoned rows, staged-rename swap, row delta == "
    "tombstone count, post-apply direct serving == pre-apply MOR probe "
    "(RAISES otherwise); shared oracle with "
    "q_ann_pq_residual_delete_mor.",
)
def q_pq_residual_delete_compact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    fam = _pq_delete_family(spark, sf_dir, residual=True)
    emb = tp(spark, sf_dir, "embeddings")
    return _ann_delete_apply_body(
        spark, sf_dir, fam, _sq8_tombstones(emb), "pq_res_delete_compact_index"
    )


# --------------------------------------------------------------------------
# IVF-SQ8 nprobe tuning sweep (round 16, beyond the brief): the PQ
# family's q_ann_ivf_pq_nprobe_sweep on the SQ8 serving path — the knob
# read-out a deployment runs before fixing its serving nprobe. ONE
# corpus scan at the maximum swept nprobe computes per-(query, cell-rank)
# top-k partials; every smaller nprobe's top-k then re-ranks the bounded
# Q·nprobe·k partial rows (top-k of a union is inside the union of
# per-group top-ks), so the sweep never rescans codes. Candidate counts
# come off the |cells|-row occupancy table. All-integer — full value
# oracle for every swept point.
# --------------------------------------------------------------------------

IVF_SQ8_SWEEP_MAX = 4


def _sq8_sweep_oracle() -> str:
    base = _SQL_SQ8_CTES.replace("sq8q AS", "_sq8q_unused AS").replace(
        "sq8d AS", "_sq8d_unused AS"
    )
    legs = []
    for k in range(1, IVF_SQ8_SWEEP_MAX + 1):
        legs.append(f"""
    SELECT CAST({k} AS BIGINT) AS nprobe,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dd WHERE prk <= {k})
             AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM (
              SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY dist ASC, vec_id) AS rk
                FROM dd WHERE prk <= {k}) WHERE rk <= {TOPK}) t
            JOIN ext e ON t.qid = e.qid AND t.vec_id = e.vec_id)
             AS recall_hits,
           CAST({N_QUERIES * TOPK} AS BIGINT) AS recall_possible
    """)
    union = "\n    UNION ALL\n".join(legs)
    return f"""
    WITH {base},
    lbl AS (SELECT vec_id, label FROM embeddings),
    cc AS (SELECT l.label, v.d,
                  CAST(floor(CAST(SUM(v.e) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cq
           FROM ev v JOIN lbl l ON v.vec_id = l.vec_id
           GROUP BY l.label, v.d),
    qv AS (SELECT vec_id AS qid, d, e FROM ev WHERE vec_id < {N_QUERIES}),
    qc AS (SELECT q.qid, c.label, SUM((q.e - c.cq) * (q.e - c.cq)) AS cdist
           FROM qv q JOIN cc c ON q.d = c.d GROUP BY q.qid, c.label),
    probes AS (SELECT qid, label, prk FROM (
      SELECT qid, label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cdist ASC, label) AS prk
      FROM qc) WHERE prk <= {IVF_SQ8_SWEEP_MAX}),
    cand AS (SELECT p.qid, p.prk, r.vec_id, r.d, r.r
             FROM recon r JOIN lbl l ON r.vec_id = l.vec_id
             JOIN probes p ON l.label = p.label
             WHERE r.vec_id <> p.qid),
    qs AS (SELECT vec_id AS qid, d, e * {SQ8_LEVELS} AS qs
           FROM ev WHERE vec_id < {N_QUERIES}),
    dd AS (SELECT c.qid, c.vec_id, c.prk,
                  SUM((q.qs - c.r) * (q.qs - c.r)) AS dist
           FROM cand c JOIN qs q ON q.qid = c.qid AND q.d = c.d
           GROUP BY c.qid, c.vec_id, c.prk),
    exd AS (SELECT q.qid, r.vec_id,
                   SUM((q.e - r.e) * (q.e - r.e)) AS dist
            FROM (SELECT vec_id AS qid, d, e FROM ev
                  WHERE vec_id < {N_QUERIES}) q
            JOIN ev r ON q.d = r.d AND r.vec_id <> q.qid
            GROUP BY 1, 2),
    ext AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM exd) WHERE rk <= {TOPK})
    {union}
    ORDER BY nprobe
    """


def ivf_sq8_scan_ranked_topk(
    pruned: DataFrame,
    queries_eq: list[tuple[int, list[int]]],
    ranked: dict[int, list[int]],
    mn: list[int],
    rng: list[int],
    k: int = TOPK,
) -> DataFrame:
    """Per-(query, cell-rank) top-k in ONE numpy scan: ``ranked`` maps
    qid -> probed labels in rank order; each candidate ranks only within
    its cell's rank bucket, so every nprobe <= len(ranked[qid]) re-ranks
    from these bounded partials without rescanning codes."""
    mn_a = np.asarray(mn, dtype=np.int64)
    rng_a = np.asarray(rng, dtype=np.int64)
    qids = [qid for qid, _ in queries_eq]
    qs = {
        qid: np.asarray(eq, dtype=np.int64) * SQ8_LEVELS for qid, eq in queries_eq
    }

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            labs = pdf["label"].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            recon = mn_a * SQ8_LEVELS + codes * rng_a
            for qid in qids:
                for prk, lab in enumerate(ranked[qid], start=1):
                    mask = (labs == lab) & (ids != qid)
                    if not mask.any():
                        continue
                    diff = qs[qid][None, :] - recon[mask]
                    dist = (diff * diff).sum(axis=1)
                    cid = ids[mask]
                    order = np.lexsort((cid, dist))[:k]
                    yield pd.DataFrame(
                        {
                            "qid": qid,
                            "prk": prk,
                            "neighbor_id": cid[order],
                            "dist": dist[order],
                        }
                    )

    schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("prk", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("dist", LongType()),
        ]
    )
    partial = pruned.select("vec_id", "label", "codes").mapInPandas(scan, schema)
    w = Window.partitionBy("qid", "prk").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "prk", "neighbor_id", "dist")
    )


@register(
    "q_ann_ivf_sq8_nprobe_sweep",
    _sq8_sweep_oracle(),
    doc=f"IVF-SQ8 nprobe TUNING CURVE (the PQ sweep's SQ8 sibling): for "
    f"nprobe = 1..{IVF_SQ8_SWEEP_MAX}, the admitted candidate count and "
    "the exact-top-k recall those candidates buy — ONE corpus scan at "
    "the max swept nprobe yields per-(query, cell-rank) top-k partials, "
    "every smaller nprobe re-ranks those bounded rows (top-k of a union "
    "lives inside the union of per-group top-ks), candidate counts come "
    "off the |cells|-row occupancy table; the knob read-out a deployment "
    "runs before fixing its serving nprobe; all-integer, full value "
    "oracle at every swept point.",
)
def q_ann_ivf_sq8_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    mn, rng = sq8_stats(emb)
    coded = sq8_encode(emb, mn, rng)
    cells = ivf_sq8_cells(emb)
    queries = _collect_query_eq(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    )
    kmax = min(IVF_SQ8_SWEEP_MAX, len(cells))
    # like ivf_sq8_probes but keeping PROBE RANK order (the sweep needs
    # rank; the serving helper sorts labels for the partition filter)
    ranked = {}
    for qid, eq in queries:
        dists = sorted(
            (sum((e - c) ** 2 for e, c in zip(eq, cq)), label)
            for label, cq in cells
        )
        ranked[qid] = [label for _, label in dists[:kmax]]
    all_probed = sorted({lb for labs in ranked.values() for lb in labs})
    pruned = coded.where(F.col("label").isin(all_probed))

    # ONE scan; Q * kmax * TOPK bounded partial rows
    partials = ivf_sq8_scan_ranked_topk(
        pruned, queries, ranked, mn, rng, TOPK
    ).collect()

    # occupancy for candidate counts: |cells| rows
    occ = {
        int(r["label"]): int(r["n"])
        for r in coded.groupBy("label")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    qlabel = {
        int(r["vec_id"]): int(r["label"])
        for r in emb.select("vec_id", "label")
        .where(F.col("vec_id") < N_QUERIES)
        .collect()
    }

    # exact leg (identity grid), bounded Q*TOPK rows
    ones = [1] * len(mn)
    ext = {
        (int(r["qid"]), int(r["neighbor_id"]))
        for r in sq8_topk(
            sq8_encode(emb.select("vec_id", "embedding"), mn, ones, levels=1),
            queries,
            mn,
            ones,
            TOPK,
            levels=1,
        ).collect()
    }

    by_q: dict[int, list] = {}
    for r in partials:
        by_q.setdefault(int(r["qid"]), []).append(
            (int(r["prk"]), int(r["dist"]), int(r["neighbor_id"]))
        )
    rows = []
    for k in range(1, kmax + 1):
        n_cand = 0
        hits = 0
        for qid, _ in queries:
            labs = ranked[qid][:k]
            n_cand += sum(occ[lb] for lb in labs)
            if qlabel.get(qid) in labs:
                n_cand -= 1  # the query itself is never a candidate
            cand = sorted(
                (d, nid) for prk, d, nid in by_q.get(qid, []) if prk <= k
            )[:TOPK]
            hits += sum(1 for _, nid in cand if (qid, nid) in ext)
        rows.append((k, n_cand, hits, len(queries) * TOPK))
    return spark.createDataFrame(
        rows,
        "nprobe bigint, n_candidates bigint, recall_hits bigint, "
        "recall_possible bigint",
    ).orderBy("nprobe")


# --------------------------------------------------------------------------
# Binary quantization (round 16, beyond the brief): the 32× end of the
# compression ladder production vector stores ship below SQ8 (FAISS
# IndexBinaryFlat / LSH sign codes, Qdrant/Weaviate/Milvus binary
# quantization): one BIT per dimension (e > per-dim corpus threshold),
# Hamming distance for the scan, exact re-rank for the podium. 64 dims
# pack into TWO int64 halves (32 bits each — deliberately NOT one 64-bit
# word, so the sign bit never participates and the packing is portable),
# and the whole scan is JVM-side whole-stage codegen: XOR + bit_count +
# window top-k — no Python worker, no Arrow hop, unlike the numpy ANN
# scans. The oracle computes the same Hamming ranking per-dim (bit
# packing is an execution detail, not semantics), so the full ranking is
# value-checked; a property test pins packed == per-dim.
#
# Scale: the coded table is 16 bytes/vector (vs 256 float32) — at 100 TB
# of embeddings the BQ sketch is ~6 TB and scans at memory-bandwidth
# rates inside codegen; the exact re-rank touches only Q·R shortlisted
# raw vectors (the q_ann_sq8_refine shape). Ties are dense in Hamming
# space (0..64), so every ranking tie-breaks by vec_id in both engines.
# --------------------------------------------------------------------------

BQ_HALF = 32
BQ_REFINE_R = 4 * TOPK  # Hamming shortlist handed to the exact re-rank


def bq_thresholds(emb: DataFrame, dim: int = SQ8_DIM) -> list[int]:
    """Per-dim corpus threshold on the Q20 grid: floor(mean + 0.5) —
    one scan, dim partial-agg cells (the ivf_sq8_cells convention)."""
    import math as _math

    eqd = _eqd_cols(dim)
    aggs = [F.sum(eqd[d]).alias(f"s{d}") for d in range(dim)] + [
        F.count("*").alias("n")
    ]
    row = emb.agg(*aggs).collect()[0]
    n = int(row["n"])
    return [
        int(_math.floor(float(row[f"s{d}"]) / n + 0.5)) for d in range(dim)
    ]


def bq_pack(emb: DataFrame, t: list[int], dim: int = SQ8_DIM) -> DataFrame:
    """(vec_id, b0, b1): the sign bits packed into two 32-bit halves of
    int64 columns — one JVM projection, thresholds inlined as literals."""
    assert dim == 2 * BQ_HALF

    def half(lo: int) -> str:
        terms = [
            f"(CASE WHEN floor(CAST(element_at(embedding, {d + 1}) AS DOUBLE)"
            f" * {QUANT} + 0.5D) > {t[d]}L"
            f" THEN {1 << (d - lo)}L ELSE 0L END)"
            for d in range(lo, lo + BQ_HALF)
        ]
        return " + ".join(terms)

    keep = [c for c in emb.columns if c != "embedding"]
    return emb.select(
        *keep,
        F.expr(half(0)).alias("b0"),
        F.expr(half(BQ_HALF)).alias("b1"),
    )


def bq_hamming_topk(
    coded: DataFrame, qdf: DataFrame, k: int
) -> DataFrame:
    """(qid, neighbor_id, hamming, rk): XOR + bit_count + window top-k,
    all inside whole-stage codegen. qdf: (qid, qb0, qb1) — Q rows,
    broadcast."""
    ham = (
        F.bit_count(F.expr("b0 ^ qb0")) + F.bit_count(F.expr("b1 ^ qb1"))
    ).alias("hamming")
    w = Window.partitionBy("qid").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return (
        coded.select(F.col("vec_id").alias("neighbor_id"), "b0", "b1")
        .crossJoin(F.broadcast(qdf))  # Q-row broadcast: every (vector, query)
        .where(F.col("neighbor_id") != F.col("qid"))
        .select("qid", "neighbor_id", ham)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


# the trained state (eq → ev → th → bv): shared by the standard-anchor
# probe CTEs below and the health monitor's re-anchored twin
_SQL_BQ_BASE_CTES = f"""
    eq AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS eqv
           FROM embeddings),
    ev AS (SELECT vec_id, d, eqv[d] AS e
           FROM eq, generate_series(1, {SQ8_DIM}) g(d)),
    th AS (SELECT d, CAST(floor(CAST(SUM(e) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS t
           FROM ev GROUP BY d),
    bv AS (SELECT v.vec_id, v.d,
                  CASE WHEN v.e > s.t THEN 1 ELSE 0 END AS b
           FROM ev v JOIN th s ON v.d = s.d)"""

_SQL_BQ_CTES = (
    _SQL_BQ_BASE_CTES
    + f""",
    qb AS (SELECT vec_id AS qid, d, b FROM bv WHERE vec_id < {N_QUERIES}),
    hd AS (SELECT q.qid, r.vec_id,
                  CAST(SUM(CASE WHEN q.b <> r.b THEN 1 ELSE 0 END) AS BIGINT)
                    AS hamming
           FROM qb q JOIN bv r ON q.d = r.d AND r.vec_id <> q.qid
           GROUP BY 1, 2)"""
)


# the full Hamming ranking to top-k — shared by the inline scan, the
# persisted-index serving twin, and the streaming grow fold (all three
# must produce THIS ranking bit-for-bit)
_SQL_BQ_TOPK = f"""
    WITH {_SQL_BQ_CTES}
    SELECT qid, vec_id AS neighbor_id, hamming, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id, hamming,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY hamming ASC, vec_id) AS rk
      FROM hd) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """


@register(
    "q_ann_binary_quantized",
    _SQL_BQ_TOPK,
    # bench extended set (round 16): every ANN serving family now has a
    # per-round trend line (brute/LSH/PQ/SQ8/residuals/BQ); NOT legacy-14.
    headline=True,
    doc="BINARY-QUANTIZED ANN (the 32× end of the compression ladder — "
    "FAISS binary indexes, Qdrant/Weaviate/Milvus BQ): one sign bit per "
    "dim against a per-dim corpus-mean threshold, packed into two 32-bit "
    "halves of int64 columns; the scan is XOR + bit_count + window top-k "
    "entirely inside whole-stage codegen (no Python worker, no Arrow hop "
    "— unlike the numpy ANN scans); dense Hamming ties break by vec_id "
    "in both engines; the oracle ranks the same bits per-dim, so the "
    "full ranking is value-checked (packing pinned packed==per-dim "
    "suite-side).",
)
def q_ann_binary_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    t_ = bq_thresholds(emb)
    coded = bq_pack(emb, t_)
    qdf = (
        bq_pack(
            t(spark, sf_dir, "embeddings")
            .where(F.col("vec_id") < N_QUERIES)
            .select("vec_id", "embedding"),
            t_,
        )
        .select(
            F.col("vec_id").alias("qid"),
            F.col("b0").alias("qb0"),
            F.col("b1").alias("qb1"),
        )
    )
    return (
        bq_hamming_topk(coded, qdf, TOPK)
        .select(
            "qid",
            "neighbor_id",
            F.col("hamming").cast("bigint").alias("hamming"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("qid", "rk")
    )


@register(
    "q_ann_bq_refine",
    f"""
    WITH {_SQL_BQ_CTES},
    shortl AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY hamming ASC, vec_id) AS rk
      FROM hd) WHERE rk <= {BQ_REFINE_R}),
    rexd AS (SELECT s.qid, s.vec_id,
                    SUM((q.e - r.e) * (q.e - r.e)) AS dist
             FROM shortl s
             JOIN ev r ON r.vec_id = s.vec_id
             JOIN ev q ON q.vec_id = s.qid AND q.d = r.d
             GROUP BY 1, 2)
    SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM rexd) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """,
    doc=f"two-stage BINARY-QUANTIZED serving with exact re-rank (how BQ "
    "is actually deployed — the bit scan is a shortlist generator, never "
    f"the final ranking): Hamming top-{BQ_REFINE_R} inside codegen, then "
    "exact integer-grid L2 over only the Q·R shortlisted pairs (the "
    "broadcast semi-join of q_ann_sq8_refine); within-shortlist "
    "exactness makes refine recall dominate the raw bit ranking; "
    "all-integer, full value oracle.",
)
def q_ann_bq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    t_ = bq_thresholds(emb)
    coded = bq_pack(emb, t_)
    qraw = (
        t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
    )
    qdf = bq_pack(qraw, t_).select(
        F.col("vec_id").alias("qid"),
        F.col("b0").alias("qb0"),
        F.col("b1").alias("qb1"),
    )
    shortlist = bq_hamming_topk(coded, qdf, BQ_REFINE_R).select(
        "qid", "neighbor_id"
    )
    # stage 2: exact integer L2 over ONLY the Q·R shortlisted pairs
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.expr(_SQL_EQV).alias("ne")
    )
    queries = _collect_query_eq(qraw)
    qint = spark.createDataFrame(
        [(qid, eq) for qid, eq in queries], "qid bigint, qe array<bigint>"
    )
    dist = F.aggregate(
        F.zip_with("qe", "ne", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        F.broadcast(shortlist)
        .join(corpus, "neighbor_id")
        .join(F.broadcast(qint), "qid")
        .select("qid", "neighbor_id", dist.alias("dist"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("qid", "neighbor_id", F.col("rk").cast("int").alias("rk"))
        .orderBy("qid", "rk")
    )


@register(
    "q_ann_bq_recall",
    f"""
    WITH {_SQL_BQ_CTES},
    bqt AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY hamming ASC, vec_id) AS rk
      FROM hd) WHERE rk <= {TOPK}),
    exd AS (SELECT q.qid, r.vec_id,
                   SUM((q.e - r.e) * (q.e - r.e)) AS dist
            FROM (SELECT vec_id AS qid, d, e FROM ev
                  WHERE vec_id < {N_QUERIES}) q
            JOIN ev r ON q.d = r.d AND r.vec_id <> q.qid
            GROUP BY 1, 2),
    ext AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM exd) WHERE rk <= {TOPK})
    SELECT e.qid, CAST(COUNT(a.vec_id) AS BIGINT) AS recall_hits,
           CAST({TOPK} AS BIGINT) AS recall_possible
    FROM ext e LEFT JOIN bqt a ON e.qid = a.qid AND e.vec_id = a.vec_id
    GROUP BY e.qid ORDER BY e.qid
    """,
    doc="binary-quantization loss read-out (the q_ann_sq8_recall shape "
    "at the 32× rung): per-query overlap of the raw Hamming top-k with "
    "the EXACT integer-grid top-k — the acceptance gate run before "
    "trusting the bit sketch as a shortlist generator, and the number "
    "that sizes q_ann_bq_refine's R; all-integer, full value oracle.",
)
def q_ann_bq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    t_ = bq_thresholds(emb)
    coded = bq_pack(emb, t_)
    qraw = (
        t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
    )
    qdf = bq_pack(qraw, t_).select(
        F.col("vec_id").alias("qid"),
        F.col("b0").alias("qb0"),
        F.col("b1").alias("qb1"),
    )
    bqt = bq_hamming_topk(coded, qdf, TOPK).select("qid", "neighbor_id")

    # exact leg on the shared integer grid (identity-grid trick)
    mn, _ = sq8_stats(emb)
    ones = [1] * len(mn)
    queries = _collect_query_eq(qraw)
    ext = sq8_topk(
        sq8_encode(emb, mn, ones, levels=1), queries, mn, ones, TOPK, levels=1
    ).select("qid", "neighbor_id")
    return (
        ext.join(bqt.withColumn("hit", F.lit(1)), ["qid", "neighbor_id"], "left")
        .groupBy("qid")
        .agg(
            F.count("hit").cast("bigint").alias("recall_hits"),
            F.lit(TOPK).cast("bigint").alias("recall_possible"),
        )
        .orderBy("qid")
    )


# --------------------------------------------------------------------------
# Persisted BQ index (round 17, VERDICT r16 missing 2): the durable form
# of the 32× rung, so the compression actually amortizes — the inline
# twin re-derives thresholds and re-packs the corpus per query; a store
# pays that once. Artifacts: thresholds (ONE row — the per-dim sign
# cutoffs are the entire trained state of a BQ index) + the packed codes
# table (vec_id, b0, b1 — 16 bytes/vector). Serving loads the 1-row
# thresholds (bounded collect), packs ONLY the queries against the
# frozen cutoffs, and scans the 32×-smaller coded table — never the raw
# embeddings. Bit-identical to the inline twin (suite pin + the shared
# _SQL_BQ_TOPK oracle), and the scan keeps the codegen-only plan pin
# (no Python worker, no Arrow hop).
#
# Scale: at 100 TB of float32 embeddings the coded table is ~3 TB and
# the thresholds are 64 integers — serving I/O drops 32× and the scan
# runs at memory-bandwidth rates inside whole-stage codegen; the flat
# layout needs no coarse quantizer (Hamming scans are cheap enough to
# run un-pruned at this rung, the FAISS IndexBinaryFlat shape).
# --------------------------------------------------------------------------

_bq_index_paths: dict[tuple[str, str], tuple[str, str]] = {}


def bq_index_path(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Build (once per session+fixture) the persisted BQ index; return
    (thresholds_path, codes_path). thresholds: 1 row (t array<bigint>).
    codes: (vec_id, b0, b1) — the packed sign bits."""
    import os
    import re

    key = (session_key(spark), sf_dir)
    if key not in _bq_index_paths:
        base = work_dir("bq_index_" + re.sub(r"\W+", "_", sf_dir))
        th_path = os.path.join(base, "thresholds")
        codes_path = os.path.join(base, "codes")
        emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        t_ = bq_thresholds(emb)
        spark.createDataFrame([(t_,)], "t array<bigint>").write.mode(
            "overwrite"
        ).parquet(th_path)
        bq_pack(emb, t_).write.mode("overwrite").parquet(codes_path)
        _bq_index_paths[key] = (th_path, codes_path)
    return _bq_index_paths[key]


def bq_query_bits(
    spark: SparkSession, sf_dir: str, t_: list[int]
) -> DataFrame:
    """The standard-anchor query side of a BQ probe: the vec_id <
    N_QUERIES anchors packed against the (frozen) thresholds —
    (qid, qb0, qb1), Q rows, always broadcast."""
    qraw = (
        t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
    )
    return bq_pack(qraw, t_).select(
        F.col("vec_id").alias("qid"),
        F.col("b0").alias("qb0"),
        F.col("b1").alias("qb1"),
    )


def bq_serve(coded: DataFrame, qdf: DataFrame) -> DataFrame:
    """The BQ serving tail shared by the inline twin, the persisted
    serving, and the grown-index probe: Hamming top-k, output-shaped."""
    return (
        bq_hamming_topk(coded, qdf, TOPK)
        .select(
            "qid",
            "neighbor_id",
            F.col("hamming").cast("bigint").alias("hamming"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("qid", "rk")
    )


@register(
    "q_ann_bq_persisted",
    _SQL_BQ_TOPK,
    # bench extended set (round 17): the persisted-BQ serving path gets a
    # per-round trend line next to q_ann_sq8_persisted; NOT legacy-14.
    headline=True,
    doc="BINARY-QUANTIZED serving over the DURABLE index (the 32× "
    "compression rung actually amortized): thresholds persisted as ONE "
    "row — the entire trained state — and the packed codes as a "
    "16-byte/vector table; serving loads the bounded thresholds, packs "
    "ONLY the queries against the frozen cutoffs, and scans the coded "
    "table (never the raw embeddings) — XOR + bit_count + window top-k "
    "entirely inside whole-stage codegen; bit-identical to the inline "
    "twin (suite pin) under the shared Hamming-ranking oracle.",
)
def q_ann_bq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    th_path, codes_path = bq_index_path(spark, sf_dir)
    [row] = spark.read.parquet(th_path).collect()  # bounded: 1 row
    t_ = [int(v) for v in row["t"]]
    coded = spark.read.parquet(codes_path)
    return bq_serve(coded, bq_query_bits(spark, sf_dir, t_))


# --------------------------------------------------------------------------
# BQ delete pair + threshold refresh (round 17, beyond the brief): the
# lifecycle symmetry closed on the FIFTH persisted layout. Deletes ride
# the same generalized MOR/APPLY bodies as SQ8/PQ — the BQ family
# namespace just has NO coarse prune (all_probed=None: the flat Hamming
# scan IS the prune) and a flat write (partition_by=[]). The refresh is
# the BQ analogue of q_sq8_grid_refresh: stale sign thresholds (trained
# on the even half) re-trained on the full corpus and the coded table
# re-packed — necessarily a FULL rewrite (moved bits live inside packed
# int64 words; there is no per-dim partial path on the packed layout —
# that trade belongs to the dim-columnar experiment), but of the
# 32×-smaller table. RAISES unless the refreshed serving equals a
# from-scratch rebuild; emits n_dims_moved — the drift magnitude the
# health monitor's popcount stat alarms on.
# --------------------------------------------------------------------------


def _bq_delete_oracle(base_sql: str) -> str:
    """The BQ Hamming-ranking oracle minus tombstoned candidates: the
    filter lands ONLY in the candidate clause — thresholds stay trained
    on the full corpus, exactly like the implementation."""
    old = "ON q.d = r.d AND r.vec_id <> q.qid"
    assert base_sql.count(old) == 1
    return base_sql.replace(
        old,
        f"ON q.d = r.d AND r.vec_id <> q.qid"
        f" AND r.vec_id % {_SQ8_DELETE_MOD} <> {_SQ8_DELETE_RESIDUE}",
    )


_SQL_BQ_DELETE = _bq_delete_oracle(_SQL_BQ_TOPK)


def _bq_delete_family(spark: SparkSession, sf_dir: str):
    """The BQ instance of the delete-family namespace: flat codes (no
    coarse prune — all_probed None; partition_by empty), frozen-threshold
    pack as the survivors encode, the Hamming serve as the scan."""
    from types import SimpleNamespace

    th_path, codes_path = bq_index_path(spark, sf_dir)
    [row] = spark.read.parquet(th_path).collect()  # bounded: 1 row
    t_ = [int(v) for v in row["t"]]
    qdf = bq_query_bits(spark, sf_dir, t_)

    def encode(df: DataFrame) -> DataFrame:
        return bq_pack(df.select("vec_id", "embedding"), t_)

    def scan(codes: DataFrame) -> DataFrame:
        return bq_serve(codes, qdf)

    return SimpleNamespace(
        codes_path=codes_path,
        encode=encode,
        scan=scan,
        all_probed=None,
        partition_by=[],
    )


@register(
    "q_ann_bq_delete_mor",
    _SQL_BQ_DELETE,
    doc="MERGE-ON-READ deletes for the persisted BQ index — the fifth "
    "persisted layout gets the same tombstone verb through the SAME "
    "generalized body: the keys-table anti-join runs on the flat coded "
    "scan (BQ has no coarse prune; the 32× bit scan is the prune), "
    "thresholds untouched; RAISES unless bit-identical to serving over "
    "a survivors-only frozen-threshold pack; full value oracle (the "
    "Hamming ranking minus tombstoned candidates).",
)
def q_ann_bq_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    fam = _bq_delete_family(spark, sf_dir)
    emb = tp(spark, sf_dir, "embeddings")
    return _ann_delete_mor_body(spark, sf_dir, fam, _sq8_tombstones(emb))


@register(
    "q_bq_delete_compact",
    _SQL_BQ_DELETE,
    doc="delete APPLICATION for the BQ index: flat rewrite without the "
    "tombstoned rows (one row per vector — row delta == tombstoned row "
    "count), staged-rename swap, live files stat-pinned until the swap, "
    "post-apply direct serving == pre-apply MOR probe (RAISES "
    "otherwise); shared oracle with q_ann_bq_delete_mor.",
)
def q_bq_delete_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    fam = _bq_delete_family(spark, sf_dir)
    emb = tp(spark, sf_dir, "embeddings")
    return _ann_delete_apply_body(
        spark, sf_dir, fam, _sq8_tombstones(emb), "bq_delete_compact_index"
    )


_SQL_BQ_REFRESH = f"""
    WITH {_SQL_BQ_CTES},
    thh AS (SELECT d, CAST(floor(CAST(SUM(e) AS DOUBLE) / COUNT(*) + 0.5)
                      AS BIGINT) AS t
            FROM ev WHERE vec_id % 2 = 0 GROUP BY d),
    mvd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dims_moved
            FROM th f JOIN thh h ON f.d = h.d WHERE f.t <> h.t)
    SELECT t.qid, t.neighbor_id, t.hamming, t.rk,
           m.n_dims_moved, CAST({SQ8_DIM} AS BIGINT) AS n_dims_total
    FROM (
      SELECT qid, vec_id AS neighbor_id, hamming, CAST(rk AS INT) AS rk FROM (
        SELECT qid, vec_id, hamming,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY hamming ASC, vec_id) AS rk
        FROM hd) WHERE rk <= {TOPK}
    ) t, mvd m
    ORDER BY t.qid, t.rk
    """


@register(
    "q_bq_threshold_refresh",
    _SQL_BQ_REFRESH,
    doc="BQ sign-threshold REFRESH (the q_sq8_grid_refresh verb on the "
    "32× rung — the APPLY step the health monitor's popcount drift "
    "alarms): thresholds re-trained on the full corpus (stale = trained "
    "on the even half), the coded table re-packed and swapped in behind "
    "a staged rename (live files stat-pinned until the swap) — "
    "necessarily a FULL rewrite (moved bits live inside packed int64 "
    "words) but of the 32×-smaller table; RAISES unless the refreshed "
    "serving is bit-identical to a from-scratch rebuild on the fresh "
    "thresholds; emits the refreshed top-k plus (n_dims_moved, "
    "n_dims_total); all-integer, full value oracle.",
)
def q_bq_threshold_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import shutil as _shutil

    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # the live index, packed on STALE thresholds (even-half training)
    t_h = bq_thresholds(emb.where(F.col("vec_id") % 2 == 0))
    state = work_dir("bq_refresh_index")
    current = _os.path.join(state, "codes")
    bq_pack(emb, t_h).write.mode("overwrite").parquet(current)

    # retrain on the full corpus; measure drift
    t_f = bq_thresholds(emb)
    n_moved = sum(1 for a, b in zip(t_h, t_f) if a != b)

    def stat_map(root: str) -> dict[str, tuple[int, int]]:
        out = {}
        for r, _, files in _os.walk(root):
            for fn in files:
                p = _os.path.join(r, fn)
                st = _os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
        return out

    pre_stats = stat_map(current)
    staged = current + "_staged"
    _shutil.rmtree(staged, ignore_errors=True)
    bq_pack(emb, t_f).write.mode("overwrite").parquet(staged)
    if stat_map(current) != pre_stats:
        raise AssertionError("live index files changed before the swap")
    retired = current + "_retired"
    _shutil.rmtree(retired, ignore_errors=True)
    _os.replace(current, retired)
    _os.replace(staged, current)
    _shutil.rmtree(retired, ignore_errors=True)

    probe = bq_serve(
        spark.read.parquet(current), bq_query_bits(spark, sf_dir, t_f)
    )
    probe_rows = probe.collect()
    full = bq_serve(bq_pack(emb, t_f), bq_query_bits(spark, sf_dir, t_f))
    if sorted(map(tuple, probe_rows)) != sorted(map(tuple, full.collect())):
        raise AssertionError("refreshed probe differs from the full rebuild")

    counts = spark.createDataFrame(
        [(int(n_moved), int(SQ8_DIM))],
        "n_dims_moved bigint, n_dims_total bigint",
    )
    out = spark.createDataFrame(probe_rows, probe.schema)
    return out.crossJoin(F.broadcast(counts)).orderBy("qid", "rk")


# --------------------------------------------------------------------------
# FILTERED vector search (round 17, beyond the brief): the production
# verb every vector store leads with (Qdrant/Milvus/Weaviate filtered
# ANN, FAISS IDSelector) — top-k among only the vectors satisfying a
# metadata predicate. Two strategies exist and the difference is the
# whole story:
#   PRE-filter   restrict candidates BEFORE ranking — exact recall at
#                any selectivity; on the label-partitioned persisted
#                index the metadata filter IS a partition filter (the
#                storage dividend: scan only matching label dirs).
#   POST-filter  rank unfiltered top-R, then drop non-matching rows —
#                cheap, but under a selective filter the surviving set
#                starves (< k rows returned, recall lost). The loss
#                read-out measures exactly this as a function of R —
#                the number that justifies pre-filter as the default
#                and sizes R where post-filter is unavoidable.
# Deterministic predicate (label % 3 == 0) keeps both value-checkable.
#
# Scale: pre-filter serving scans |match|/|corpus| of the coded table
# via partition pruning (plan-pinned) — no new shuffle; the loss
# read-out ranks once at max R and re-ranks bounded Q·R partials.
# --------------------------------------------------------------------------

ANN_FILTER_MOD = 3
ANN_FILTER_RESIDUE = 0


def _sq8_filtered_ctes() -> str:
    """_SQL_SQ8_CTES with the metadata filter landed ONLY in the
    candidate clause (queries stay unfiltered — any vector may query a
    filtered corpus)."""
    old = "FROM sq8q q JOIN recon r ON q.d = r.d AND r.vec_id <> q.qid"
    assert _SQL_SQ8_CTES.count(old) == 1
    ctes = _SQL_SQ8_CTES.replace(
        old,
        old
        + f"""
             JOIN lblf l ON r.vec_id = l.vec_id
                        AND l.label % {ANN_FILTER_MOD} = {ANN_FILTER_RESIDUE}""",
    )
    anchor = "sq8q AS (SELECT"
    assert ctes.count(anchor) == 1
    return ctes.replace(
        anchor,
        "lblf AS (SELECT vec_id, label FROM embeddings),\n    " + anchor,
    )


@register(
    "q_ann_sq8_filtered",
    f"""
    WITH {_sq8_filtered_ctes()}
    SELECT qid, vec_id AS neighbor_id, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM sq8d) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """,
    doc="metadata PRE-FILTERED ANN over the persisted SQ8 index (the "
    "filtered-search verb every vector store leads with): top-k among "
    f"only label % {ANN_FILTER_MOD} == {ANN_FILTER_RESIDUE} vectors — "
    "the matching labels (a bounded |cells| collect) become a literal "
    "IN PARTITION filter on the label-partitioned code scan "
    "(plan-pinned: the metadata filter IS partition pruning at scale), "
    "then the standard asymmetric scan ranks only surviving "
    "candidates; queries stay unfiltered (any vector may query a "
    "filtered corpus); RAISES unless bit-identical to encode-then-"
    "filter; exact recall at any selectivity by construction; full "
    "value oracle.",
)
def q_ann_sq8_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid_path, codes_path, cells_path = sq8_index_path(spark, sf_dir)
    [grid] = spark.read.parquet(grid_path).collect()  # bounded: 1 row
    mn, rng = list(grid["mn"]), list(grid["rng"])
    labels = [
        int(r["label"]) for r in spark.read.parquet(cells_path).collect()
    ]  # bounded: |cells|
    match = sorted(
        lb for lb in labels if lb % ANN_FILTER_MOD == ANN_FILTER_RESIDUE
    )
    pruned = spark.read.parquet(codes_path).where(F.col("label").isin(match))
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    queries = _collect_query_eq(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    )
    probe = sq8_topk(pruned, queries, mn, rng, TOPK)
    probe_rows = probe.collect()
    full = sq8_topk(
        sq8_encode(
            emb.where(F.col("label") % ANN_FILTER_MOD == ANN_FILTER_RESIDUE),
            mn,
            rng,
        ),
        queries,
        mn,
        rng,
        TOPK,
    )
    if sorted(map(tuple, probe_rows)) != sorted(map(tuple, full.collect())):
        raise AssertionError(
            "partition-pruned filtered serving differs from "
            "encode-then-filter"
        )
    out = spark.createDataFrame(probe_rows, probe.schema)
    return out.orderBy("qid", "rk")


_POSTFILTER_CUTS = [TOPK, 2 * TOPK, 4 * TOPK]


@register(
    "q_ann_filtered_postfilter_loss",
    f"""
    WITH {_SQL_SQ8_CTES},
    lblf AS (SELECT vec_id, label FROM embeddings),
    urk AS (SELECT qid, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY dist ASC, vec_id) AS urk
            FROM sq8d),
    fd AS (SELECT s.qid, s.vec_id, s.dist
           FROM sq8d s JOIN lblf l ON s.vec_id = l.vec_id
           WHERE l.label % {ANN_FILTER_MOD} = {ANN_FILTER_RESIDUE}),
    ft AS (SELECT qid, vec_id FROM (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dist ASC, vec_id) AS rk
      FROM fd) WHERE rk <= {TOPK}),
    cuts AS (SELECT unnest([{", ".join(str(c) for c in _POSTFILTER_CUTS)}]) AS rc),
    pf AS (SELECT c.rc, u.qid, u.vec_id,
                  ROW_NUMBER() OVER (PARTITION BY c.rc, u.qid
                                     ORDER BY u.urk) AS prk
           FROM urk u
           JOIN lblf l ON u.vec_id = l.vec_id
                      AND l.label % {ANN_FILTER_MOD} = {ANN_FILTER_RESIDUE},
                cuts c
           WHERE u.urk <= c.rc),
    pfk AS (SELECT rc, qid, vec_id FROM pf WHERE prk <= {TOPK})
    SELECT CAST(c.rc AS BIGINT) AS r_cutoff,
           CAST((SELECT COUNT(*) FROM pfk WHERE pfk.rc = c.rc) AS BIGINT)
             AS n_returned,
           CAST((SELECT COUNT(*) FROM pfk p
                 JOIN ft f ON p.qid = f.qid AND p.vec_id = f.vec_id
                 WHERE p.rc = c.rc) AS BIGINT) AS recall_hits,
           CAST((SELECT COUNT(*) FROM ft) AS BIGINT) AS recall_possible
    FROM cuts c ORDER BY r_cutoff
    """,
    doc="POST-filter loss read-out for filtered ANN (the number that "
    "justifies pre-filter as the default): rank the UNFILTERED SQ8 "
    f"top-R, drop non-matching rows, keep the best {TOPK} — for R in "
    f"{_POSTFILTER_CUTS}, how many rows actually survive and how much "
    "of the TRUE filtered top-k do they recover? ONE ranking at max R "
    "serves every cutoff (a smaller R's ranking is a prefix); "
    "monotone-in-R suite pin; all-integer, full value oracle.",
)
def q_ann_filtered_postfilter_loss(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    mn, rng = sq8_stats(emb.select("vec_id", "embedding"))
    coded = sq8_encode(emb, mn, rng)  # keeps label next to codes
    queries = _collect_query_eq(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    )
    rmax = max(_POSTFILTER_CUTS)
    # one unfiltered ranking at max R; every cutoff re-ranks its prefix
    urk = sq8_topk(coded, queries, mn, rng, rmax).withColumnRenamed(
        "rk", "urk"
    )
    lblf = emb.select(
        F.col("vec_id").alias("neighbor_id"), "label"
    ).where(F.col("label") % ANN_FILTER_MOD == ANN_FILTER_RESIDUE)
    ft = sq8_topk(
        coded.where(F.col("label") % ANN_FILTER_MOD == ANN_FILTER_RESIDUE),
        queries,
        mn,
        rng,
        TOPK,
    ).select("qid", "neighbor_id")
    n_possible = ft.count()  # bounded: Q·k
    wpf = Window.partitionBy("qid").orderBy("urk")
    parts = []
    for rc in _POSTFILTER_CUTS:
        pfk = (
            urk.where(F.col("urk") <= rc)
            .join(lblf.select("neighbor_id"), "neighbor_id")
            .withColumn("prk", F.row_number().over(wpf))
            .where(F.col("prk") <= TOPK)
            .select("qid", "neighbor_id")
        )
        n_returned = pfk.count()
        hits = pfk.join(ft, ["qid", "neighbor_id"]).count()
        parts.append((rc, n_returned, hits, n_possible))
    return spark.createDataFrame(
        parts,
        "r_cutoff bigint, n_returned bigint, recall_hits bigint, "
        "recall_possible bigint",
    ).orderBy("r_cutoff")


# --------------------------------------------------------------------------
# Binary IVF (round 17, beyond the brief): the FAISS IndexBinaryIVF
# shape — the missing rung between the flat Hamming scan (fine up to
# ~10^8 codes) and what a 100 TB corpus needs: a coarse quantizer in
# HAMMING space. Cells follow the repo's IVF convention (label = the
# coarse cell); each cell's centroid is its per-dim MAJORITY bit
# (ties → 0 — deterministic in both engines), trained straight OFF the
# packed index by summing extracted bits (shiftright + AND — no second
# pass over raw vectors). A probe ranks the query's bits against the
# |cells| packed centroids (broadcast), keeps nprobe cells, and scans
# only their codes — the same XOR + bit_count + window tail as the flat
# scan, still entirely inside codegen.
#
# Scale: the scan shrinks from |corpus| to ~nprobe/|cells| of the coded
# table; with label-partitioned packed codes the probed cells become a
# partition filter (the SQ8/PQ discipline); centroids are |cells| rows.
# Recall < 1 vs the flat scan by construction — measured by comparing
# against q_ann_binary_quantized (suite pin), exactly like the IVF-PQ
# family's read-outs.
# --------------------------------------------------------------------------

BQ_IVF_NPROBE = 2


def _bq_ivf_oracle() -> str:
    return f"""
    WITH {_SQL_BQ_BASE_CTES},
    lbl AS (SELECT vec_id, label FROM embeddings),
    cbm AS (SELECT l.label, b.d,
                   CASE WHEN 2 * SUM(b.b) > COUNT(*) THEN 1 ELSE 0 END AS cb
            FROM bv b JOIN lbl l ON b.vec_id = l.vec_id
            GROUP BY l.label, b.d),
    qb AS (SELECT vec_id AS qid, d, b FROM bv WHERE vec_id < {N_QUERIES}),
    qcd AS (SELECT q.qid, c.label,
                   CAST(SUM(CASE WHEN q.b <> c.cb THEN 1 ELSE 0 END)
                        AS BIGINT) AS cdist
            FROM qb q JOIN cbm c ON q.d = c.d GROUP BY 1, 2),
    probes AS (SELECT qid, label FROM (
      SELECT qid, label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cdist ASC, label) AS prk
      FROM qcd) WHERE prk <= {BQ_IVF_NPROBE}),
    hd AS (SELECT q.qid, r.vec_id,
                  CAST(SUM(CASE WHEN q.b <> r.b THEN 1 ELSE 0 END) AS BIGINT)
                    AS hamming
           FROM qb q
           JOIN bv r ON q.d = r.d AND r.vec_id <> q.qid
           JOIN lbl l ON r.vec_id = l.vec_id
           JOIN probes p ON p.qid = q.qid AND p.label = l.label
           GROUP BY 1, 2)
    SELECT qid, vec_id AS neighbor_id, hamming, CAST(rk AS INT) AS rk FROM (
      SELECT qid, vec_id, hamming,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY hamming ASC, vec_id) AS rk
      FROM hd) WHERE rk <= {TOPK}
    ORDER BY qid, rk
    """


@register(
    "q_ann_bq_ivf",
    _bq_ivf_oracle(),
    doc="BINARY IVF (the FAISS IndexBinaryIVF shape — the coarse rung "
    "the flat Hamming scan needs past ~10^8 codes): per-cell MAJORITY-"
    "bit centroids (ties → 0) trained straight OFF the packed index by "
    "bit extraction (shiftright + AND — one agg over the coded table, "
    "no second raw-vector pass), packed and broadcast (|cells| rows); "
    f"each query probes its {BQ_IVF_NPROBE} Hamming-nearest cells and "
    "scans ONLY their codes — the same codegen XOR + bit_count tail as "
    "the flat scan; recall vs the flat scan measured suite-side; "
    "all-integer, full value oracle.",
)
def q_ann_bq_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    t_ = bq_thresholds(emb.select("vec_id", "embedding"))
    coded = bq_pack(emb, t_)  # keeps label next to the packed bits

    # majority-bit centroids straight off the packed index: per-cell
    # bit sums via shiftright + AND (64 integer aggs), |cells| rows
    bit_sums = [
        F.sum(
            F.shiftright(F.col("b0" if d < BQ_HALF else "b1"), d % BQ_HALF)
            .bitwiseAND(F.lit(1))
        ).alias(f"s{d}")
        for d in range(SQ8_DIM)
    ]
    occ = coded.groupBy("label").agg(*bit_sums, F.count("*").alias("n"))
    cells = []
    for r in occ.collect():  # bounded: |cells| rows
        cb0 = sum(
            1 << d for d in range(BQ_HALF) if 2 * int(r[f"s{d}"]) > int(r["n"])
        )
        cb1 = sum(
            1 << (d - BQ_HALF)
            for d in range(BQ_HALF, SQ8_DIM)
            if 2 * int(r[f"s{d}"]) > int(r["n"])
        )
        cells.append((int(r["label"]), cb0, cb1))
    cells_df = spark.createDataFrame(
        cells, "label int, cb0 long, cb1 long"
    )

    qdf = bq_query_bits(spark, sf_dir, t_)
    cdist = (
        F.bit_count(F.expr("qb0 ^ cb0")) + F.bit_count(F.expr("qb1 ^ cb1"))
    ).alias("cdist")
    wprobe = Window.partitionBy("qid").orderBy(F.asc("cdist"), F.asc("label"))
    probes = (
        F.broadcast(qdf)
        .crossJoin(F.broadcast(cells_df))  # Q × |cells| rows — tiny
        .select("qid", "label", "qb0", "qb1", cdist)
        .withColumn("prk", F.row_number().over(wprobe))
        .where(F.col("prk") <= BQ_IVF_NPROBE)
        .select("qid", "label", "qb0", "qb1")
    )
    ham = (
        F.bit_count(F.expr("b0 ^ qb0")) + F.bit_count(F.expr("b1 ^ qb1"))
    ).alias("hamming")
    w = Window.partitionBy("qid").orderBy(F.asc("hamming"), F.asc("neighbor_id"))
    return (
        coded.select(
            F.col("vec_id").alias("neighbor_id"), "label", "b0", "b1"
        )
        .join(F.broadcast(probes), "label")
        .where(F.col("neighbor_id") != F.col("qid"))
        .select("qid", "neighbor_id", ham)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select(
            "qid",
            "neighbor_id",
            F.col("hamming").cast("bigint").alias("hamming"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("qid", "rk")
    )
