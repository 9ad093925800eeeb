"""Similarity search over embedding columns (`array<float>`).

Three strategies, mirroring how ANN actually gets done on big corpora:

  brute-force   broadcast the (small) query matrix, scan the corpus with an
                Arrow-batched mapInPandas doing one numpy matmul per batch,
                keep per-batch top-k, reduce to global top-k with a window.
                Exact; scales linearly with corpus size — the 100 TB shape
                (queries ≪ corpus) keeps the broadcast tiny.
  LSH-bucketed  deterministic random-hyperplane signatures; candidates are
                same-bucket rows only. Sub-linear candidate sets; recall < 1
                by construction → rows-only check (no SQL oracle).
  IVF           coarse quantizer = per-label centroids ("trained" by a
                groupBy avg); probe the nprobe nearest centroids and scan
                only their clusters. Also rows-only.

The exact threshold-join variant lives in operators/dedup.py
(q_dedup_embedding_cosine) with a full DuckDB oracle.
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
from ..plans.util import t, tp

TOPK = 5
N_QUERIES = 5  # fixture queries: vec_id < 5
LSH_PLANES = 12
LSH_SEED = 42
IVF_NPROBE = 2

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
    qrows = queries.select("vec_id", "embedding").collect()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)

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


def _hyperplanes(dim: int, n_planes: int = LSH_PLANES, seed: int = LSH_SEED) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(df: DataFrame, dim: int) -> DataFrame:
    """Sign-of-projection bucket id per row, Arrow-batched numpy.

    The planes ship inside the UDF closure; each batch is ONE (n, dim) @
    (dim, n_planes) matmul — the right shape for a 100 TB corpus scan. (A
    previous all-JVM formulation built the 12x64 literal coefficient
    matrix into the expression tree; Catalyst spent multiple seconds just
    analyzing it — planning cost, not compute, dominated.)"""
    planes = _hyperplanes(dim)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))

    @pandas_udf(LongType())
    def bucket_udf(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (mat @ planes.T) > 0  # (n, n_planes)
        return pd.Series((bits @ weights).astype(np.int64))

    return df.withColumn("bucket", bucket_udf("embedding"))


@register(
    "q_ann_lsh_bucketed",
    None,  # recall < 1 by construction — rows-only check
    doc="LSH (random hyperplane) bucketed ANN: same-bucket candidates, "
    "exact cosine rerank. Sub-linear; recall traded for scan cost.",
)
def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = lsh_bucket(tp(spark, sf_dir, "embeddings"), 64)
    queries = lsh_bucket(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES), 64
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qb"),
    )
    cand = emb.select("vec_id", "embedding", "bucket")
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        F.broadcast(queries)
        .join(cand, (F.col("qb") == F.col("bucket")) & (F.col("vec_id") != F.col("qid")))
        .withColumn("sim", cosine_udf(F.col("qe"), F.col("embedding")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("qid", F.col("vec_id").alias("neighbor_id"), F.col("rk").cast("int").alias("rk"))
        .orderBy("qid", "rk")
    )


# --------------------------------------------------------------------------
# IVF ANN — coarse quantizer via per-label centroids (rows-only check).
# --------------------------------------------------------------------------


@register(
    "q_ann_ivf",
    None,  # centroid float sums are reduction-order-dependent — rows-only
    doc="IVF: per-label centroids as the coarse quantizer; probe nprobe=2 "
    "nearest clusters only. The inverted-list scan is a semi-join, not O(n²).",
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tp(spark, sf_dir, "embeddings")
    queries_src = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    # "train": one pass, map-side partial aggregation
    centroids = emb.groupBy("label").agg(
        F.array(
            *[
                F.avg(F.element_at("embedding", i + 1).cast("double")).alias(f"c{i}")
                for i in range(64)
            ]
        ).alias("centroid")
    )
    queries = queries_src.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    wprobe = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("label"))
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(centroids))
        .withColumn("csim", cosine_udf(F.col("qe"), F.col("centroid")))
        .withColumn("prk", F.row_number().over(wprobe))
        .where(F.col("prk") <= IVF_NPROBE)
        .select("qid", "qe", "label")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        F.broadcast(probes)
        .join(emb, "label")
        .where(F.col("vec_id") != F.col("qid"))
        .withColumn("sim", cosine_udf(F.col("qe"), F.col("embedding")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("qid", F.col("vec_id").alias("neighbor_id"), F.col("rk").cast("int").alias("rk"))
        .orderBy("qid", "rk")
    )
