"""KMV sketch tests: exact on small groups, bounded relative error on
large ones, cross-engine estimate parity covered by the registry oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.operators.sketches import (
    kmv_distinct_estimate,
)


def test_kmv_exact_below_k(spark):
    df = spark.range(100).select(
        F.lit("g").alias("g"), (F.col("id") % 37).alias("v")
    )
    got = kmv_distinct_estimate(df, ["g"], "v", k=256).collect()[0]
    assert got["distinct_est"] == 37  # below k: exact by construction


def test_kmv_error_bounded_above_k(spark):
    # 50k distinct values, k=256 -> stderr ~ 1/sqrt(254) ~ 6.3%
    df = spark.range(50_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    got = kmv_distinct_estimate(df, ["g"], "v", k=256).collect()[0]
    rel_err = abs(got["distinct_est"] - 50_000) / 50_000
    assert rel_err < 0.2, f"estimate {got['distinct_est']} rel_err {rel_err:.3f}"


def test_kmv_insensitive_to_duplication(spark):
    # the sketch sees distinct hashes only: duplicating rows changes nothing
    base = spark.range(10_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    dup = base.union(base).union(base)
    a = kmv_distinct_estimate(base, ["g"], "v").collect()[0]["distinct_est"]
    b = kmv_distinct_estimate(dup, ["g"], "v").collect()[0]["distinct_est"]
    assert a == b
