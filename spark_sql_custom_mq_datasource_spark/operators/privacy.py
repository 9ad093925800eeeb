"""Privacy operators — PII detection and redaction over the text corpus.

Training-data pipelines must strip personally identifiable information
(emails, IP addresses, phone numbers) before a corpus ships. This module
implements the standard regex-redaction pass as pure Catalyst expressions:
``regexp_count`` for per-class detection counts and chained
``regexp_replace`` for masking. No UDF, no shuffle — the whole operator is
scan-shaped and embarrassingly parallel.

Scale design (100 TB corpus, 1000 executors):
  * Redaction is a per-row projection: zero shuffles, zero state. Cost is
    exactly one pass over the text bytes; Catalyst compiles the regexes once
    per task (whole-stage codegen keeps the match loop JVM-side).
  * The only aggregate the registered query performs is the per-class count
    summary, a partial+final agg over tiny int columns.
  * Patterns are anchored, backtracking-safe character classes (no nested
    quantifiers), so worst-case match time is linear in the input — a
    pathological document cannot stall an executor.

Oracle portability: the same patterns run under Java's regex engine (Spark)
and RE2 (DuckDB); only constructs in the common subset are used
(character classes, bounded repetition, ``\\b`` word boundaries). Because
the fixture corpus is synthetic word-salad with no natural PII, the
registered query deterministically INJECTS pii spans (derived from doc_id,
identical SQL on both sides) before redacting — so the operator is
genuinely exercised, not a no-op over clean text.

Reference parity note: the reference repo (a source-only mock MQ,
/root/reference/src/main/java/org/example/) has no text surface; this
module is part of the LLM-data-pipeline brief (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..plans.util import t

# Patterns restricted to the Java-regex ∩ RE2 common subset (no lookaround,
# no backreferences). Order matters: emails are masked first so their
# domain dots can never be re-matched by the IP pattern.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

_CLASSES: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def pii_counts(text: Column | str) -> Column:
    """struct(n_email, n_ip, n_phone) — per-class match counts (pre-mask)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.struct(
        *(
            F.regexp_count(c, F.lit(pat)).cast("int").alias(f"n_{name}")
            for name, pat, _ in _CLASSES
        )
    )


def redact_pii(text: Column | str) -> Column:
    """Mask every PII span with its class token (email -> ip -> phone)."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, token in _CLASSES:
        c = F.regexp_replace(c, pat, token)
    return c


# Deterministic PII injection: a function of doc_id only, written once here
# and mirrored verbatim in the oracle SQL below.
def _injected_text() -> Column:
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 5 == 0,
        F.concat(F.lit(" from 10."), (did % 256).cast("string"), F.lit(".0.1")),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 7 == 0,
        F.concat(F.lit(" call 555-867-"), F.lpad((did % 10000).cast("string"), 4, "0")),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, ip, phone)


_SQL_INJECT = """
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
"""

_SQL_PII = f"""
  WITH injected AS (
    SELECT doc_id, {_SQL_INJECT} AS itext FROM documents
  ),
  red AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(itext, '{EMAIL_RE}')) AS INTEGER) AS n_email,
           CAST(len(regexp_extract_all(itext, '{IPV4_RE}')) AS INTEGER) AS n_ip,
           CAST(len(regexp_extract_all(itext, '{PHONE_RE}')) AS INTEGER) AS n_phone,
           regexp_replace(
             regexp_replace(
               regexp_replace(itext, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{IPV4_RE}', '<IP>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g') AS rtext
    FROM injected
  )
  SELECT doc_id, n_email, n_ip, n_phone, md5(rtext) AS red_md5
  FROM red ORDER BY doc_id
"""


@register(
    "q_pii_redact",
    _SQL_PII,
    doc="PII redaction pass: deterministic injected emails/IPs/phones are "
    "counted (regexp_count) and masked (chained regexp_replace) per row — "
    "pure Catalyst projection, zero shuffles; md5 of the redacted text "
    "value-checks the masking byte-for-byte against DuckDB's RE2.",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    injected = docs.select("doc_id", _injected_text().alias("itext"))
    counts = pii_counts("itext")
    return (
        injected.select(
            "doc_id",
            counts["n_email"].alias("n_email"),
            counts["n_ip"].alias("n_ip"),
            counts["n_phone"].alias("n_phone"),
            F.md5(redact_pii("itext")).alias("red_md5"),
        )
        .orderBy("doc_id")
    )
