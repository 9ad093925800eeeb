"""PII detection/redaction (operators/privacy.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_sql_custom_mq_datasource_spark.operators.privacy import (
    pii_counts,
    redact_pii,
)


def _redact(spark, text: str) -> tuple[str, int, int, int]:
    df = spark.createDataFrame([(text,)], "t string").select(
        redact_pii("t").alias("r"), pii_counts("t").alias("c")
    )
    row = df.collect()[0]
    return row["r"], row["c"]["n_email"], row["c"]["n_ip"], row["c"]["n_phone"]


class TestRedaction:
    def test_masks_all_three_classes(self, spark):
        r, ne, ni, np_ = _redact(
            spark,
            "mail a.b+c@ex-ample.co.uk from 192.168.0.1 call 555-123-4567 done",
        )
        assert r == "mail <EMAIL> from <IP> call <PHONE> done"
        assert (ne, ni, np_) == (1, 1, 1)

    def test_clean_text_is_untouched(self, spark):
        r, ne, ni, np_ = _redact(spark, "no pii here at all")
        assert r == "no pii here at all"
        assert (ne, ni, np_) == (0, 0, 0)

    def test_email_domain_dots_not_rematched_as_ip(self, spark):
        # masking order contract: email first, so "1.2.3.4@x.io"-adjacent
        # shapes can't leave dotted quads behind for the IP pass
        r, ne, ni, _ = _redact(spark, "u@1.2.3.4in.com end")
        assert ne == 1 and ni == 0
        assert r == "<EMAIL> end"

    def test_multiple_matches_counted(self, spark):
        r, ne, ni, np_ = _redact(
            spark, "a@b.co c@d.io 1.1.1.1 2.2.2.2 111-222-3333"
        )
        assert (ne, ni, np_) == (2, 2, 1)
        assert r == "<EMAIL> <EMAIL> <IP> <IP> <PHONE>"

    def test_idempotent(self, spark):
        df = spark.createDataFrame(
            [("x a@b.co 1.2.3.4 555-123-4567",)], "t string"
        ).select(redact_pii(redact_pii("t")).alias("r"))
        assert df.collect()[0]["r"] == "x <EMAIL> <IP> <PHONE>"

    def test_linear_time_patterns_on_adversarial_input(self, spark):
        # backtracking-safe: a long run of dots/digits must not blow up
        evil = "1." * 5000 + "@" * 100
        df = spark.createDataFrame([(evil,)], "t string").select(
            F.length(redact_pii("t")).alias("n")
        )
        assert df.collect()[0]["n"] > 0
