"""Salted-join equivalence tests: result identical to the plain join,
salt actually spreads hot keys across sub-keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # one pathologically hot key + a long tail
    rows = [(i, "HOT" if i % 10 != 9 else f"K{i}", float(i)) for i in range(1000)]
    large = spark.createDataFrame(rows, ["row_id", "k", "v"])
    small = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"K{i}", f"dim{i}") for i in range(9, 1000, 10)],
        ["k", "label"],
    )
    return large, small


def test_salted_inner_join_equals_plain_join(spark, skewed):
    large, small = skewed
    plain = sorted(
        (r["row_id"], r["label"])
        for r in large.join(small, on="k").select("row_id", "label").collect()
    )
    salted = sorted(
        (r["row_id"], r["label"])
        for r in salted_join(large, small, ["k"], n_salts=8)
        .select("row_id", "label")
        .collect()
    )
    assert salted == plain and len(salted) == 1000


def test_salted_left_join_keeps_unmatched(spark, skewed):
    large, small = skewed
    unmatched = spark.createDataFrame([(5555, "NOKEY", 0.0)], ["row_id", "k", "v"])
    out = salted_join(large.union(unmatched), small, ["k"], n_salts=4, how="left")
    assert out.count() == 1001
    row = out.filter(F.col("row_id") == 5555).collect()[0]
    assert row["label"] is None


def test_salt_spreads_hot_key(spark, skewed):
    large, _ = skewed
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(8))
    n_distinct = (
        large.filter(F.col("k") == "HOT")
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_distinct == 8  # 900 hot rows cover all 8 salt sub-keys


def test_salted_join_rejects_unsupported_how(spark, skewed):
    large, small = skewed
    with pytest.raises(ValueError):
        salted_join(large, small, ["k"], 4, how="full")
