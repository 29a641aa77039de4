"""Unit pins for functions/guards.py - the type-dispatched validity
guards every NaN/NULL-hardened operator composes.

The dispatch itself earned a regression test the hard way: round 8's
blanket ``~isnan(cast(col AS DOUBLE))`` guard crashed date-typed as-of
joins at analysis time, and the round-9 fix resolved column names
case-sensitively (finding 49). This file pins the remaining contract:
case-insensitive resolution mirrors the analyzer, INCLUDING its
AMBIGUOUS_REFERENCE error when two fields differ only by case (the
advisor's round-9 low: silently guarding whichever field came first
could isnan-test the wrong column's type).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.functions.guards import (
    _dtype_of,
    can_hold_nan,
    not_nan,
    valid_vector,
)


def test_not_nan_filters_floats_and_noops_non_floats(spark):
    df = spark.createDataFrame(
        [(1, float("nan"), "2024-01-01"), (2, 1.5, "2024-01-02")],
        "id long, v double, d string",
    ).withColumn("d", F.col("d").cast("date"))
    assert [r.id for r in df.filter(not_nan(df, "v")).collect()] == [2]
    # date/long columns cannot hold NaN - the guard is a free True
    # (and, per the round-8 regression, must not crash at analysis)
    assert df.filter(not_nan(df, "d")).count() == 2
    assert df.filter(not_nan(df, "id")).count() == 2


def test_dtype_of_resolves_case_insensitively(spark):
    df = spark.createDataFrame([(1.0,)], "Value double")
    # spark.sql.caseSensitive=false: F.col('value') legally targets
    # 'Value', so the guard must resolve it too
    assert can_hold_nan(_dtype_of(df, "value"))
    assert not_nan(df, "value") is not None


def test_dtype_of_raises_on_case_ambiguous_reference(spark):
    # two fields differing only by case: Spark's analyzer raises
    # AMBIGUOUS_REFERENCE for F.col('value') - the guard must not
    # silently pick one (it could isnan-guard the wrong column's type)
    df = spark.createDataFrame([(1.0, "x")], "Value double, VALUE2 string")
    df = df.withColumnRenamed("VALUE2", "VALUE")
    with pytest.raises(ValueError, match="ambiguous"):
        _dtype_of(df, "value")
    # exact matches stay unambiguous even on the conflicted schema
    assert can_hold_nan(_dtype_of(df, "Value"))
    assert not can_hold_nan(_dtype_of(df, "VALUE"))


def test_dtype_of_missing_column_raises_keyerror(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(KeyError):
        _dtype_of(df, "nope")


def test_valid_vector_three_arms(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, None),
            (3, [float("nan"), 1.0]),
            (4, [None, 1.0]),  # NULL-holed: F.exists(isnan) misses it
        ],
        "id long, vec array<double>",
    )
    kept = [r.id for r in df.filter(valid_vector("vec")).collect()]
    assert kept == [1]


def test_money_dec_composes_with_non_float_columns(spark):
    """Round-13 advice: money_dec used a bare F.isnan(c), which fails at
    ANALYSIS time for non-float money columns (decimal, string). The
    overflow probe now runs in the double domain via try_cast, so the
    guard composes with any input type - and the overflow contract is
    unchanged per type: finite |amount| >= 10^16 still raises, NaN and
    non-numeric strings still land NULL."""
    from pyspark_data_engineering_assignment_spark.functions.guards import money_dec

    # decimal input: analysis-safe, overflow still loud
    dec = spark.createDataFrame(
        [("1.50",), ("9999999999999999.00",)], "amount string"
    ).select(F.col("amount").cast("decimal(20,2)").alias("amount"))
    ok = dec.filter(F.col("amount") < 10).select(money_dec("amount")).collect()
    assert str(ok[0][0]) == "1.50"
    with pytest.raises(Exception, match="money overflow"):
        dec.select(money_dec("amount")).collect()

    # string input: numeric strings convert, junk and 'NaN' -> NULL,
    # oversized numeric string -> loud
    s = spark.createDataFrame(
        [("2.25",), ("abc",), ("NaN",)], "amount string"
    )
    got = {r[0] is None or str(r[0]) for r in s.select(money_dec("amount")).collect()}
    assert got == {True, "2.25"}  # abc and NaN both NULL, 2.25 converts
    with pytest.raises(Exception, match="money overflow"):
        spark.createDataFrame([("99999999999999999",)], "amount string").select(
            money_dec("amount")
        ).collect()

    # double input: unchanged semantics (NaN -> NULL, overflow -> loud)
    d = spark.createDataFrame([(2.5,), (float("nan"),)], "amount double")
    vals = sorted(
        ("NULL" if r[0] is None else str(r[0]))
        for r in d.select(money_dec("amount")).collect()
    )
    assert vals == ["2.50", "NULL"]
