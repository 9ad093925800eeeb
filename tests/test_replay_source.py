"""mq-replay source tests: offset math from footer stats, row-group/range
pruning, batch range reads, multi-batch streaming replay with checkpoint
restart (README.md:705-712 no-loss/no-dup contract over REAL table data)."""

from __future__ import annotations

import tempfile
import time
import uuid

import pytest
from pyspark.sql import functions as F

from spark_sql_custom_mq_datasource_spark.sources.replay import (
    ReplayStreamReader,
    _ReplayMeta,
    _ReplayOptions,
)

SF = "/root/testdata/sf0.001"
PATH = f"{SF}/events.parquet"
DAY = 86_400_000


class TestMeta:
    def test_stats_offsets(self):
        m = _ReplayMeta(PATH, "ts")
        # fixture spans Jan 2024
        assert 1704067200000 <= m.min_ms() < m.max_ms() <= 1706659200000

    def test_group_pruning_empty_range(self):
        m = _ReplayMeta(PATH, "ts")
        assert m.groups_in_range(0, 1000) == []  # 1970 — before all data
        assert len(m.groups_in_range(m.min_ms(), m.max_ms() + 1)) >= 1


class TestStreamOffsets:
    def test_drain_in_one_batch_by_default(self):
        r = ReplayStreamReader({"path": PATH})
        start = r.initialOffset()["ts"]
        end = r.latestOffset()["ts"]
        m = _ReplayMeta(PATH, "ts")
        assert start == m.min_ms() and end == m.max_ms() + 1

    def test_fixed_advance_is_monotone_and_capped(self):
        r = ReplayStreamReader({"path": PATH, "advanceMsPerBatch": str(10 * DAY)})
        r.initialOffset()
        offs = [r.latestOffset()["ts"] for _ in range(6)]
        assert offs == sorted(offs)
        m = _ReplayMeta(PATH, "ts")
        assert offs[-1] == m.max_ms() + 1  # capped at table end, no overrun

    def test_admission_control_estimate(self):
        r = ReplayStreamReader({"path": PATH, "maxRecordsPerBatch": "100"})
        r.initialOffset()
        end = r.latestOffset()["ts"]
        m = _ReplayMeta(PATH, "ts")
        assert end < m.max_ms() + 1  # clamped below full drain
        assert r._estimate(m.min_ms(), end) <= 100 + 1e-6


class TestBatchRead:
    def test_full_equals_parquet(self, spark):
        got = (
            spark.read.format("mq-replay").option("path", PATH).load().count()
        )
        assert got == spark.read.parquet(PATH).count()

    def test_range_read_left_closed_right_open(self, spark):
        m = _ReplayMeta(PATH, "ts")
        mid = (m.min_ms() + m.max_ms()) // 2
        lo = (
            spark.read.format("mq-replay").option("path", PATH)
            .option("startingTimestamp", m.min_ms())
            .option("endingTimestamp", mid).load().count()
        )
        hi = (
            spark.read.format("mq-replay").option("path", PATH)
            .option("startingTimestamp", mid)
            .option("endingTimestamp", m.max_ms() + 1).load().count()
        )
        assert lo + hi == spark.read.parquet(PATH).count()  # additivity


@pytest.mark.slow
class TestStreamingReplay:
    def test_multibatch_replay_and_restart(self, spark):
        ckpt = tempfile.mkdtemp()
        name = "replay_" + uuid.uuid4().hex[:6]

        def start():
            s = (
                spark.readStream.format("mq-replay")
                .option("path", PATH)
                .option("advanceMsPerBatch", str(2 * DAY))
                .load()
                .groupBy("event_type")
                .agg(F.count("*").alias("cnt"))
            )
            return (
                s.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="1 second")
                .start()
            )

        exp = {
            r["event_type"]: r["cnt"]
            for r in spark.read.parquet(PATH)
            .groupBy("event_type")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }

        def table_counts():
            return {r["event_type"]: r["cnt"] for r in spark.table(name).collect()}

        # run 1: 2-day slices, 1s triggers, stopped after a few batches —
        # normally mid-replay (timing-dependent; both outcomes checked below)
        q = start()
        time.sleep(5)
        q.stop()
        q.awaitTermination()
        run1 = table_counts()
        # restart from checkpoint: the first post-restart batch drains the
        # remainder (uncapped, see ReplayStreamReader.latestOffset). Poll
        # until the complete-mode output converges to the full counts.
        q = start()
        deadline = time.time() + 60
        got = table_counts()
        while time.time() < deadline and got != exp and q.isActive:
            time.sleep(1)
            got = table_counts()
        q.stop()
        q.awaitTermination()
        if not got:
            # run 1 already drained everything, so the restarted query had
            # no batch to run and its (fresh) memory sink stayed empty —
            # the pre-restart output must then already be complete
            got = run1
        assert got == exp  # no loss, no dup across restart


class TestExecutorPooling:
    """Consumer-pool + prefetch-buffer analogue (README.md:566-591): open
    file handles and decoded row groups are reused across tasks within a
    worker process."""

    def test_decoded_groups_cache_hits(self):
        from spark_sql_custom_mq_datasource_spark.sources import replay as R

        meta = _ReplayMeta(PATH, "ts")
        part = R.ReplayPartition(
            path=PATH, ts_col="ts",
            start_ms=meta.min_ms(), end_ms=meta.min_ms() + DAY,
            row_groups=[g for g, *_ in meta.groups],
            columns=list(meta.arrow_schema.names),
        )
        before = dict(R.pool_stats)
        n1 = sum(1 for _ in R._read_replay(part))
        n2 = sum(1 for _ in R._read_replay(part))
        assert n1 == n2 > 0  # cache is transparent
        assert R.pool_stats["decode_hits"] >= before["decode_hits"] + 1
        # second read re-decoded nothing
        assert R.pool_stats["decode_misses"] <= before["decode_misses"] + 1

    def test_lru_bound_is_respected(self):
        from spark_sql_custom_mq_datasource_spark.sources import replay as R

        total = sum(t.num_rows for t in R._decoded.values())
        assert total <= R._DECODED_MAX_ROWS
