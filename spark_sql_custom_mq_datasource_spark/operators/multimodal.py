"""Multimodal column handling: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct
(format, dims, sample rate, ...). The Spark-side plumbing — schema,
Arrow-batched mapInPandas decode, frame sampling, partitioning — is real
and tested; the actual codec step is STUBBED (this container has no
image/audio libraries): `_decode_stub` derives deterministic pseudo-features
from the bytes, and a real deployment swaps in PIL/ffmpeg inside the same
batch loop (the import-try below picks PIL up automatically if present).

The fixtures have no binary tables, so payloads are fabricated from
`documents.text` (utf-8 bytes) — deterministic, oracle-checkable where the
feature is byte-arithmetic (lengths, frame counts).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..plans.registry import register
from ..plans.util import t, tp

try:  # real decoder if available; the container ships without it
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

FRAME_BYTES = 256  # "video": fixed-size frame records inside the payload
FRAME_SAMPLE_STEP = 4


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → multimodal rows: binary payload + metadata struct."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/rgb8").alias("format"),
            (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
        ).alias("meta"),
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("format", StringType()),
        StructField("decoder", StringType()),
    ]
)


def decode_batch(df: DataFrame) -> DataFrame:
    """Arrow-batched decode over mapInPandas — the 100 TB shape: payloads
    never leave the executor, one Python worker per core, bytes handled as
    zero-copy Arrow buffers per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            # Real path would branch on _HAS_PIL: Image.open(BytesIO(b)),
            # extract (width, height, mode). The payloads here are not real
            # images, so the stub features are used either way.
            n_bytes = payloads.map(len)
            checksum = payloads.map(lambda b: sum(b) % 997)  # deterministic fake
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "checksum": checksum,
                    "format": pdf["fmt"],
                    "decoder": "stub",
                }
            )

    return df.select(
        "doc_id", "payload", F.col("meta.format").alias("fmt")
    ).mapInPandas(run, _DECODE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", IntegerType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_bytes: int = FRAME_BYTES, step: int = FRAME_SAMPLE_STEP
) -> DataFrame:
    """Treat the payload as fixed-size frames; emit every `step`-th frame.
    1→N row expansion stays executor-side (mapInPandas, no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_len = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, step):
                    chunk = payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                    out_doc.append(doc_id)
                    out_idx.append(fi)
                    out_len.append(len(chunk))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_bytes": out_len}
            )

    return df.select("doc_id", "payload").mapInPandas(run, _FRAME_SCHEMA)


# --------------------------------------------------------------------------
# Registered queries
# --------------------------------------------------------------------------


@register(
    "q_multimodal_binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(doc_id % 640 + 64 AS INT) AS width,
           CAST(doc_id % 480 + 48 AS INT) AS height
    FROM documents
    ORDER BY doc_id
    """,
    doc="binary payload + typed metadata projection (byte-length oracle).",
)
def q_multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payload(tp(spark, sf_dir, "documents"))
    return mm.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ).orderBy("doc_id")


@register(
    "q_multimodal_frame_sample",
    f"""
    SELECT doc_id,
           CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
           CAST(ceil(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) / {FRAME_SAMPLE_STEP}.0) AS BIGINT) AS sampled_frames
    FROM documents
    ORDER BY doc_id
    """,
    doc="frame-sampling plumbing: mapInPandas frame split, per-doc counts "
    "checked against closed-form byte arithmetic.",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payload(tp(spark, sf_dir, "documents"))
    frames = sample_frames(mm)
    sizes = mm.select(
        "doc_id",
        F.ceil(F.length("payload") / float(FRAME_BYTES)).cast("bigint").alias("n_frames"),
    )
    sampled = frames.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("sampled_frames")
    )
    return (
        sizes.join(sampled, "doc_id")
        .select("doc_id", "n_frames", "sampled_frames")
        .orderBy("doc_id")
    )


@register(
    "q_multimodal_decode",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(str_split(to_hex(encode(text)), ''),
                (c, i) -> (strpos('0123456789ABCDEF', c) - 1)
                          * CASE WHEN i % 2 = 1 THEN 16 ELSE 1 END)) % 997
                AS BIGINT) AS checksum,
           'fake/rgb8' AS format,
           'stub' AS decoder
    FROM documents
    ORDER BY doc_id
    """,
    doc="mapInPandas decode stub: deterministic pseudo-features per payload. "
    "Value oracle (VERDICT.md r03 item 6): DuckDB reproduces the byte-sum "
    "checksum via hex-digit arithmetic over the utf-8 payload.",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payload(tp(spark, sf_dir, "documents"))
    return decode_batch(mm).orderBy("doc_id")
