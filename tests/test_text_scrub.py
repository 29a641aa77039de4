"""Pattern scrubbing / PII redaction on constructed strings.

The driver corpus contains no PII, so the PII classes are exercised
here on fabricated rows; the registry's doc_token_scrub oracle covers
the same machinery end-to-end on corpus-dense patterns.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.functions.text import (
    PII_PATTERNS,
    match_count,
    redact_pii,
    scrub,
)


def _one(spark, text: str) -> str:
    df = spark.createDataFrame([Row(text=text)])
    return df.select(redact_pii(F.col("text")).alias("t")).collect()[0].t


def test_email_redacted(spark):
    assert (
        _one(spark, "contact alice.smith+x@sub.example.org for details")
        == "contact [EMAIL] for details"
    )


def test_phone_redacted(spark):
    assert _one(spark, "call +1 (415) 555-0199 now") == "call [PHONE] now"
    assert _one(spark, "tel: 020-7946-0958.") == "tel: [PHONE]."


def test_url_redacted(spark):
    assert (
        _one(spark, "see https://example.com/a?b=c and http://x.io")
        == "see [URL] and [URL]"
    )


def test_clean_text_unchanged(spark):
    clean = "the quick brown fox jumps over the lazy dog"
    assert _one(spark, clean) == clean


def test_match_counts(spark):
    df = spark.createDataFrame(
        [Row(text="a@b.co and c@d.org via https://e.fg")]
    )
    row = df.select(
        match_count(F.col("text"), PII_PATTERNS["email"][0]).alias("emails"),
        match_count(F.col("text"), PII_PATTERNS["url"][0]).alias("urls"),
    ).collect()[0]
    assert (row.emails, row.urls) == (2, 1)


def test_scrub_applies_patterns_in_order(spark):
    df = spark.createDataFrame([Row(text="alpha beta")])
    # first pattern rewrites alpha -> beta; second then hits BOTH betas
    out = df.select(
        scrub(
            F.col("text"),
            {"a": (r"\balpha\b", "beta"), "b": (r"\bbeta\b", "X")},
        ).alias("t")
    ).collect()[0].t
    assert out == "X X"
