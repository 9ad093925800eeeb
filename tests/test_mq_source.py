"""Contract tests for the mq source — SURVEY.md §5.2 item 1.

Each test cites the reference behavior it checks (or deliberately fixes):
offset sentinel (CustomMicroBatchStream.java:63-66), offset JSON round-trip
(MockTimestampOffset.java:12-19), monotone latestOffset (:32-35), partition
planning (:44-54), bounded deterministic read (fixing
MockInputPartitionReader.java:19-21).
"""

from __future__ import annotations

import tempfile
import time

import pyspark.sql.functions as F
import pytest

from spark_sql_custom_mq_datasource_spark.sources.mq import (
    DataLossError,
    MQStreamReader,
    _indices_in_range,
    _payload,
)


class TestOffsets:
    def test_initial_offset_explicit(self):
        r = MQStreamReader(None, {"startingTimestamp": "0"})
        assert r.initialOffset() == {"ts": 0}

    def test_initial_offset_now_sentinel(self):
        # reference initial sentinel -1 = "begin now"; we resolve eagerly
        before = int(time.time() * 1000)
        r = MQStreamReader(None, {})
        ts = r.initialOffset()["ts"]
        assert before <= ts <= int(time.time() * 1000)

    def test_latest_offset_monotone_deterministic(self):
        r = MQStreamReader(
            None,
            {"startingTimestamp": "0", "advanceMsPerBatch": "100", "maxRecordsPerBatch": "0"},
        )
        r.initialOffset()
        offs = [r.latestOffset()["ts"] for _ in range(5)]
        assert offs == [100, 200, 300, 400, 500]

    def test_latest_offset_wall_clock_monotone(self):
        r = MQStreamReader(None, {})
        r.initialOffset()
        a = r.latestOffset()["ts"]
        b = r.latestOffset()["ts"]
        assert b >= a

    def test_admission_control_clamps(self):
        # 4 partitions, 10ms interval, 40 records/batch cap -> 10 per part
        r = MQStreamReader(
            None,
            {
                "startingTimestamp": "0",
                "advanceMsPerBatch": "100000",
                "maxRecordsPerBatch": "40",
                "numPartitions": "4",
            },
        )
        r.initialOffset()
        end = r.latestOffset()["ts"]
        n = len(_indices_in_range(0, end, 10))
        assert n == 10  # per-partition cap honored

    def test_partition_planning(self):
        r = MQStreamReader(None, {"numPartitions": "7"})
        parts = r.partitions({"ts": 0}, {"ts": 100})
        assert len(parts) == 7
        assert sorted(p.index for p in parts) == list(range(7))
        assert all(p.start_ts == 0 and p.end_ts == 100 for p in parts)


class TestBoundedRead:
    def test_indices_left_closed_right_open(self):
        # README.md:337-345 offset-range convention
        assert list(_indices_in_range(0, 100, 10)) == list(range(10))
        assert list(_indices_in_range(0, 101, 10)) == list(range(11))
        assert list(_indices_in_range(50, 100, 10)) == [5, 6, 7, 8, 9]
        assert list(_indices_in_range(100, 100, 10)) == []
        assert list(_indices_in_range(100, 50, 10)) == []  # never negative

    def test_payload_deterministic(self):
        assert _payload(42, 0, 0) == _payload(42, 0, 0)
        assert _payload(42, 0, 0) != _payload(42, 1, 0)  # varies by partition
        assert _payload(42, 0, 0) != _payload(42, 0, 1)  # varies by index
        assert _payload(7, 0, 0) != _payload(42, 0, 0)  # varies by seed

    def test_read_is_bounded(self):
        r = MQStreamReader(None, {"numPartitions": "1"})
        (part,) = r.partitions({"ts": 0}, {"ts": 50})
        rows = list(r.read(part))
        assert len(rows) == 5  # fixes next()==true unboundedness


class TestDataLossPolicy:
    """README.md:618-631 / :642-645 — abort vs skip when offsets were purged."""

    def test_fail_on_data_loss_aborts(self):
        r = MQStreamReader(None, {"retentionMs": "50"})
        with pytest.raises(DataLossError):
            r.partitions({"ts": 0}, {"ts": 200})  # horizon=150 > start=0

    def test_skip_clamps_to_horizon(self):
        r = MQStreamReader(
            None, {"retentionMs": "50", "failOnDataLoss": "false", "numPartitions": "2"}
        )
        parts = r.partitions({"ts": 0}, {"ts": 200})
        assert all(p.start_ts == 150 and p.end_ts == 200 for p in parts)

    def test_within_retention_untouched(self):
        r = MQStreamReader(None, {"retentionMs": "500"})
        parts = r.partitions({"ts": 100}, {"ts": 200})
        assert all(p.start_ts == 100 for p in parts)

    def test_batch_read_skips_purged_range(self, spark):
        df = (
            spark.read.format("mq")
            .option("numPartitions", 1)
            .option("intervalMs", 10)
            .option("startingTimestamp", 0)
            .option("endingTimestamp", 200)
            .option("retentionMs", 100)
            .option("failOnDataLoss", "false")
            .load()
        )
        assert df.count() == 10  # only [100, 200) survives


class TestBatchRead:
    def test_batch_count_and_schema(self, spark):
        df = (
            spark.read.format("mq")
            .option("numPartitions", 3)
            .option("intervalMs", 10)
            .option("startingTimestamp", 0)
            .option("endingTimestamp", 200)
            .load()
        )
        assert df.schema.simpleString() == "struct<value:binary>"
        assert df.count() == 60

    def test_batch_deterministic(self, spark):
        def read():
            return sorted(
                r["value"]
                for r in spark.read.format("mq")
                .option("startingTimestamp", 0)
                .option("endingTimestamp", 100)
                .load()
                .collect()
            )

        assert read() == read()

    def test_wide_schema(self, spark):
        df = (
            spark.read.format("mq")
            .option("includeMetadata", "true")
            .option("numPartitions", 2)
            .option("startingTimestamp", 0)
            .option("endingTimestamp", 30)
            .load()
        )
        cols = df.columns
        assert cols == [
            "key", "value", "topic", "partition", "offset",
            "timestamp", "timestampType", "headers",
        ]
        rows = df.orderBy("partition", "offset").collect()
        assert rows[0]["offset"] == 0 and rows[0]["topic"] == "mock-topic"
        assert rows[0]["headers"][0]["key"] == "src"


@pytest.mark.slow
class TestStreaming:
    def test_wordcount_end_to_end_and_restart(self, spark):
        """README.md:64-124 WordCount + restart-from-checkpoint (no loss)."""
        ckpt = tempfile.mkdtemp()

        def start(name):
            s = (
                spark.readStream.format("mq")
                .option("numPartitions", 2)
                .option("intervalMs", 10)
                .option("startingTimestamp", 0)
                .option("advanceMsPerBatch", 200)
                .load()
            )
            counts = (
                s.selectExpr("CAST(value AS STRING) AS line")
                .select(F.explode(F.split("line", " ")).alias("word"))
                .groupBy("word")
                .count()
            )
            return (
                counts.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="500 milliseconds")
                .start()
            )

        def drain_until(name, predicate, deadline_sec=90):
            """Poll the sink until predicate(total) holds — fixed sleeps are
            flaky when the first micro-batch competes for CPU with a
            concurrent suite/benchmark run."""
            deadline = time.time() + deadline_sec
            total = 0
            while time.time() < deadline:
                total = spark.sql(
                    f"select coalesce(sum(count),0) s from {name}"
                ).collect()[0]["s"]
                if predicate(total):
                    break
                time.sleep(0.5)
            return total

        q = start("wc_t")
        total1 = drain_until("wc_t", lambda t: t > 0)
        q.stop()
        q.awaitTermination()
        total1 = spark.sql("select coalesce(sum(count),0) s from wc_t").collect()[0]["s"]
        assert total1 > 0
        # every record yields 3-8 words; totals must be consistent with
        # 2 partitions x 20 records per batch
        q = start("wc_t")
        total2 = drain_until("wc_t", lambda t: t >= total1)
        q.stop()
        q.awaitTermination()
        total2 = spark.sql("select coalesce(sum(count),0) s from wc_t").collect()[0]["s"]
        assert total2 >= total1  # resumed, not reset
