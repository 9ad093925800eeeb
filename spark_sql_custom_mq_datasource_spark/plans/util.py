"""Shared helpers for oracle-matched queries.

Numeric convention (engine-portability): money/quantity aggregates are summed
in DECIMAL (exact, order-independent — immune to Spark's parallel partial-agg
summation order vs DuckDB's sequential order) and the FINAL value is cast to
DOUBLE, so both engines produce bit-identical doubles for the value-hash.
Averages are computed as double(sum)/count — one IEEE division of identical
inputs. Timestamps in outputs are formatted to strings or DATE to sidestep
tz-awareness differences between engines.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (used throughout)

from .. import TABLES

# keys: (id(spark), sf_dir, name) from t(); (id(spark), sf_dir, name, "tp")
# from tp() — the trailing tag keeps the two families collision-free
_cache: dict[tuple, DataFrame] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (cached lazy parquet scan)."""
    key = (id(spark), sf_dir, name)
    if key not in _cache:
        assert name in TABLES, name
        if name == "events":
            # Robustness: if the fixture ever stores TIMESTAMP(NANOS), Spark 4
            # rejects the scan unless nanos arrive as int64. Runtime-set so it
            # works under ANY session (incl. the driver's); no-op for the
            # current timestamp[us] fixture.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = _normalize_events_ts(df)
        _cache[key] = df
    return _cache[key]


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to a micros timestamp regardless of fixture encoding.

    The fixture has shipped `ts` both as TIMESTAMP(NANOS) (read as int64 nanos
    under legacy.parquet.nanosAsLong — truncate to micros exactly like DuckDB)
    and as timestamp[us] (Spark reads TIMESTAMP_NTZ — cast to TIMESTAMP so
    downstream `unix_micros`/window code sees one dtype; the wall clock
    round-trips through the session tz, so formatted outputs match DuckDB's
    naive timestamps either way). Applying the DIV-1000 cast unconditionally
    was the round-2/3 regression that killed every events query
    (VERDICT.md r03 item 1)."""
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if ts_type != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tp(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fixture table repartitioned to cluster parallelism for compute-heavy
    per-row work (shingling, hashing, vector math).

    Small fixture tables arrive as a single parquet split, which would
    serialize CPU-bound stages onto one task; at 100 TB the same principle
    applies whenever row *cost* (not byte size) dominates — split count must
    track cores (byte-based split sizing is exactly the wrong signal for
    text/vector compute), so pay one narrow round-robin shuffle up front.
    CONDITIONAL (VERDICT.md r03 perf watch item): the shuffle only happens
    when the scan yields fewer splits than cores — a 100 TB table already
    arrives in thousands of splits and passes through untouched.
    Aggregates downstream are order-independent (decimal sums / min / max),
    so the nondeterministic row order a repartition introduces is safe."""
    key = (id(spark), sf_dir, name, "tp")
    if key not in _cache:
        df = t(spark, sf_dir, name)
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
        _cache[key] = df
    return _cache[key]


def work_dir(name: str) -> str:
    """Fixed scratch directory for queries that persist intermediate data
    (index builds, roundtrips, partitioned-table fixtures).

    A fresh ``mkdtemp`` per invocation leaks a full dataset copy into /tmp
    on every bench/correctness run (ADVICE r05 item 4). A FIXED per-query
    path with clear-on-entry semantics makes repeated runs reuse the same
    footprint: the previous run's output (already consumed — the returned
    DataFrame is collected before the query can run again) is deleted and
    rewritten. Callers that append (e.g. the BM25 incremental index) rely
    on the clear to start from an empty directory."""
    import shutil
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "spark_graft_work", name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def cached_fixture_dir(name: str, sf_dir: str, spec: str, build) -> str:
    """Build ONCE (per name+sf_dir+spec) a fixture directory via
    build(path); reuse on every later invocation and across sessions.
    The _READY marker records the spec, so any spec change rebuilds.
    Underscore-prefixed marker files are invisible to Spark's readers."""
    import hashlib
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_inbox", f"{name}_{tag}"
    )
    marker = os.path.join(path, "_READY")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == spec:
                return path
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    build(path)
    with open(marker, "w") as f:
        f.write(spec)
    return path


def stream_inbox(df: DataFrame, name: str, sf_dir: str, slices: int = 4) -> str:
    """Build ONCE a deterministic micro-batch arrival directory for the
    streaming queries (N parquet slices + maxFilesPerTrigger=1 = N real
    triggers) and REUSE it on every later invocation.

    Rebuilding the slices inside each query invocation made the
    fixture-write dominate the timed body, so the streaming family could
    never join the bench without measuring harness I/O (VERDICT r06
    "what's wrong" item 2). The slice content is a deterministic function
    of (fixture sf_dir, column set, slice count), so a _READY marker
    recording that spec makes reuse safe across invocations AND across
    sessions; any spec change rebuilds."""
    import hashlib
    import json
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_inbox", f"{name}_{tag}"
    )
    marker = os.path.join(path, "_READY")
    spec = json.dumps({"slices": slices, "cols": df.columns, "sf_dir": sf_dir})
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == spec:
                return path
    shutil.rmtree(path, ignore_errors=True)
    df.repartition(slices).write.mode("overwrite").parquet(path)
    with open(marker, "w") as f:
        f.write(spec)
    return path


def dec(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col: str | Column, alias: str, prec: int = 18, scale: int = 2) -> Column:
    """Exact decimal sum, exported as double."""
    return F.sum(dec(col, prec, scale)).cast("double").alias(alias)


def davg(col: str | Column, alias: str, prec: int = 18, scale: int = 2) -> Column:
    """Portable average: double(exact decimal sum) / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, prec, scale)).cast("double") / F.count(c)).alias(alias)


# SQL-side equivalents (DuckDB dialect is ANSI enough for these).
def sql_dsum(expr: str, alias: str, prec: int = 18, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, prec: int = 18, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def revenue() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal — scales (18,2)*(4,2)."""
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2))


REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)
