"""`mqlog` — a file-backed append-only topic: the MQ WRITE path, completed.

The reference declares `SupportsWrite` but its write builder throws
(CustomTable.java:52-54); the README's subject (the Kafka connector) of
course has a real sink. This source completes that contract in PySpark:
`df.write.format("mqlog")` / `writeStream.format("mqlog")` append message
segments to a topic directory, and the matching batch/stream readers
consume them — a round-trippable micro-MQ.

Commit protocol (the part that makes it exactly-once):
  * Executors write parquet SEGMENT files into `<topic>/.staging/` with
    collision-free names and return them as commit messages; nothing under
    `.staging/` is visible to readers.
  * The driver's `commit()` promotes the staged files into
    `<topic>/segments/` (atomic rename) and appends ONE line to the
    `_commits.jsonl` manifest. A segment exists for readers exactly when a
    manifest line names it — the manifest is the log's source of truth,
    exactly like the offset/commit WAL pairing the reference README
    documents for Structured Streaming itself (README.md:471, :705-712).
  * Streaming commits carry Spark's epoch `batchId`; a re-delivered epoch
    (task retry after a driver failover) finds its batchId already in the
    manifest and is dropped — idempotent sink, no duplicates.
  * `abort()` deletes staged files; a crash between staging and commit
    leaves only invisible garbage in `.staging/`, never torn reads.
  * The sink is APPEND-ONLY (an MQ is a log): batch `mode("overwrite")`
    raises, like the Kafka sink.

Read side: offsets are manifest line numbers — `{"commit": n}` covers
segments of manifest lines [0, n). `latestOffset` is a manifest line
count (no data IO on the driver); `partitions(start, end)` maps one task
per segment file, so read parallelism tracks the number of commits a
batch spans (producers control segment granularity via their write
parallelism). At 100 TB the same layout holds: the manifest stays tiny
(one line per commit), data volume lives in the segment files, and a
real deployment swaps the local renames for an object store's
put-if-absent — the protocol is unchanged.
"""

from __future__ import annotations

import datetime
import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from .replay import _arrow_to_spark as _arrow_to_spark_base


def _arrow_to_spark(t):
    """Like replay's mapping, but distinguishes NTZ (no-tz) timestamps."""
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return TimestampType() if t.tz else TimestampNTZType()
    return _arrow_to_spark_base(t)


def _spark_to_arrow(dt):
    import pyarrow as pa

    if isinstance(dt, TimestampNTZType):
        return pa.timestamp("us")
    if isinstance(dt, LongType):
        return pa.int64()
    if isinstance(dt, IntegerType):
        return pa.int32()
    if isinstance(dt, DoubleType):
        return pa.float64()
    if isinstance(dt, FloatType):
        return pa.float32()
    if isinstance(dt, StringType):
        return pa.string()
    if isinstance(dt, BinaryType):
        return pa.binary()
    if isinstance(dt, BooleanType):
        return pa.bool_()
    if isinstance(dt, TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(dt, ArrayType):
        return pa.list_(_spark_to_arrow(dt.elementType))
    raise ValueError(f"mqlog: unsupported write type {dt}")


# ---------------------------------------------------------------- topic dir


class _Topic:
    def __init__(self, path: str):
        self.path = path
        self.staging = os.path.join(path, ".staging")
        self.segments = os.path.join(path, "segments")
        self.manifest = os.path.join(path, "_commits.jsonl")

    def ensure(self) -> None:
        os.makedirs(self.staging, exist_ok=True)
        os.makedirs(self.segments, exist_ok=True)

    def read_manifest(self) -> list[dict]:
        if not os.path.exists(self.manifest):
            return []
        with open(self.manifest) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def append_manifest(self, entry: dict) -> None:
        with open(self.manifest, "a") as fh:
            fh.write(json.dumps(entry) + "\n")
            fh.flush()
            os.fsync(fh.fileno())

    def batch_ids(self) -> set:
        return {
            e["batch_id"] for e in self.read_manifest() if e.get("batch_id") is not None
        }

    def promote(self, names: list[str]) -> None:
        for n in names:
            os.replace(os.path.join(self.staging, n), os.path.join(self.segments, n))

    def discard(self, names: list[str]) -> None:
        for n in names:
            try:
                os.remove(os.path.join(self.staging, n))
            except FileNotFoundError:
                pass


# ---------------------------------------------------------------- write path


@dataclass
class _SegmentCommit(WriterCommitMessage):
    files: list = field(default_factory=list)  # staged file names
    rows: int = 0


def _write_segment(topic: _Topic, schema: StructType, iterator) -> _SegmentCommit:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [r.asDict(recursive=True) for r in iterator]
    if not rows:
        return _SegmentCommit(files=[], rows=0)
    utc = datetime.timezone.utc
    ts_fields = [f.name for f in schema.fields if isinstance(f.dataType, TimestampType)]
    for r in rows:
        for name in ts_fields:
            v = r.get(name)
            if v is not None and v.tzinfo is None:
                r[name] = v.replace(tzinfo=utc)
    arrow_schema = pa.schema(
        [(f.name, _spark_to_arrow(f.dataType)) for f in schema.fields]
    )
    table = pa.Table.from_pylist(rows, schema=arrow_schema)
    name = f"seg-{uuid.uuid4().hex}.parquet"
    pq.write_table(table, os.path.join(topic.staging, name))
    return _SegmentCommit(files=[name], rows=table.num_rows)


class MQLogBatchWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "mqlog is an append-only message log; mode('overwrite') is "
                "not supported (same as the Kafka sink)"
            )
        self.topic = _Topic(_path_option(options))
        self.schema = schema
        self.topic.ensure()

    def write(self, iterator) -> _SegmentCommit:
        return _write_segment(self.topic, self.schema, iterator)

    def commit(self, messages) -> None:
        files = [n for m in messages if m is not None for n in m.files]
        rows = sum(m.rows for m in messages if m is not None)
        self.topic.promote(files)
        self.topic.append_manifest(
            {"commit": len(self.topic.read_manifest()), "batch_id": None,
             "files": files, "rows": rows}
        )

    def abort(self, messages) -> None:
        self.topic.discard(
            [n for m in messages if m is not None for n in m.files]
        )


class MQLogStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.topic = _Topic(_path_option(options))
        self.schema = schema
        self.topic.ensure()

    def write(self, iterator) -> _SegmentCommit:
        return _write_segment(self.topic, self.schema, iterator)

    def commit(self, messages, batchId: int) -> None:
        files = [n for m in messages if m is not None for n in m.files]
        if batchId in self.topic.batch_ids():
            # epoch re-delivery after recovery: already durable, drop dupes
            self.topic.discard(files)
            return
        rows = sum(m.rows for m in messages if m is not None)
        self.topic.promote(files)
        self.topic.append_manifest(
            {"commit": len(self.topic.read_manifest()), "batch_id": batchId,
             "files": files, "rows": rows}
        )

    def abort(self, messages, batchId: int) -> None:
        self.topic.discard(
            [n for m in messages if m is not None for n in m.files]
        )


# ----------------------------------------------------------------- read path


@dataclass
class MQLogPartition(InputPartition):
    path: str
    files: list = field(default_factory=list)
    columns: list = field(default_factory=list)


def _read_segments(part: MQLogPartition):
    import pyarrow.parquet as pq

    utc = datetime.timezone.utc
    for name in part.files:
        table = pq.read_table(
            os.path.join(part.path, "segments", name), columns=part.columns
        )
        import pyarrow as pa

        # only tz-AWARE columns surface as aware datetimes; NTZ stays naive
        ts_cols = {
            n
            for n, typ in zip(table.schema.names, table.schema.types)
            if pa.types.is_timestamp(typ) and typ.tz
        }
        for row in table.to_pylist():
            yield tuple(
                (
                    row[c].replace(tzinfo=utc)
                    if c in ts_cols and row[c] is not None and row[c].tzinfo is None
                    else row[c]
                )
                for c in part.columns
            )


def _path_option(options: dict) -> str:
    path = {k.lower(): v for k, v in options.items()}.get("path")
    if not path:
        raise ValueError("mqlog: 'path' option is required")
    return path


def _topic_schema(topic: _Topic) -> StructType:
    import pyarrow.parquet as pq

    entries = topic.read_manifest()
    for e in entries:
        if e["files"]:
            s = pq.ParquetFile(
                os.path.join(topic.segments, e["files"][0])
            ).schema_arrow
            return StructType(
                [StructField(n, _arrow_to_spark(t)) for n, t in zip(s.names, s.types)]
            )
    raise ValueError(
        f"mqlog: topic '{topic.path}' has no committed segments to infer a "
        "schema from; write to it first"
    )


def _files_between(topic: _Topic, start: int, end: int) -> list[str]:
    entries = topic.read_manifest()[start:end]
    return [n for e in entries for n in e["files"]]


class MQLogBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.topic = _Topic(_path_option(options))
        self.columns = [f.name for f in _topic_schema(self.topic).fields]

    def partitions(self):
        files = _files_between(self.topic, 0, len(self.topic.read_manifest()))
        return [
            MQLogPartition(path=self.topic.path, files=[f], columns=self.columns)
            for f in files
        ] or [MQLogPartition(path=self.topic.path, files=[], columns=self.columns)]

    def read(self, partition: MQLogPartition):
        return _read_segments(partition)


class MQLogStreamReader(DataSourceStreamReader):
    """Tail the topic: offset = manifest line count (commits consumed)."""

    def __init__(self, options: dict):
        self.topic = _Topic(_path_option(options))
        self.columns = [f.name for f in _topic_schema(self.topic).fields]

    def initialOffset(self) -> dict:
        return {"commit": 0}

    def latestOffset(self) -> dict:
        return {"commit": len(self.topic.read_manifest())}

    def partitions(self, start: dict, end: dict):
        files = _files_between(self.topic, int(start["commit"]), int(end["commit"]))
        return [
            MQLogPartition(path=self.topic.path, files=[f], columns=self.columns)
            for f in files
        ]

    def read(self, partition: MQLogPartition):
        return _read_segments(partition)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class MQLogDataSource(DataSource):
    """`spark.read/readStream/write/writeStream.format("mqlog")`."""

    @classmethod
    def name(cls) -> str:
        return "mqlog"

    def schema(self) -> StructType:
        return _topic_schema(_Topic(_path_option(dict(self.options))))

    def reader(self, schema: StructType) -> DataSourceReader:
        return MQLogBatchReader(dict(self.options))

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return MQLogStreamReader(dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return MQLogBatchWriter(dict(self.options), schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> DataSourceStreamWriter:
        return MQLogStreamWriter(dict(self.options), schema, overwrite)
