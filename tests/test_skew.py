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


@pytest.mark.slow
def test_salted_join_property_equals_plain_join(spark):
    """Property (hypothesis): for ANY large/small inputs - NULL keys,
    duplicate keys on both sides (multiset semantics), any salt count -
    salted_join is row-for-row identical to the plain join for both
    supported join types. Salting must be a pure physical rewrite."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_data_engineering_assignment_spark.operators.skew import (
        salted_join,
    )

    keys = st.none() | st.integers(min_value=0, max_value=3)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        lrows=st.lists(
            st.tuples(keys, st.integers(min_value=0, max_value=9)),
            min_size=1,
            max_size=10,
        ),
        srows=st.lists(
            st.tuples(keys, st.integers(min_value=100, max_value=109)),
            min_size=1,
            max_size=6,
        ),
        n_salts=st.sampled_from([1, 2, 4]),
        how=st.sampled_from(["inner", "left"]),
    )
    def prop(lrows, srows, n_salts, how):
        large = spark.createDataFrame(lrows, "k long, lv long")
        small = spark.createDataFrame(srows, "k long, sv long")
        none_last = lambda r: tuple(  # noqa: E731
            (x is None, x if x is not None else 0) for x in r
        )
        got = sorted(
            (
                tuple(r)
                for r in salted_join(
                    large, small, ["k"], n_salts, how=how
                ).collect()
            ),
            key=none_last,
        )
        expect = sorted(
            (tuple(r) for r in large.join(small, on=["k"], how=how).collect()),
            key=none_last,
        )
        assert got == expect, (lrows, srows, n_salts, how, got, expect)

    prop()
