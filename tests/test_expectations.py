"""Data-quality expectations: one-pass rule evaluation with exact
violation counts, and the single-aggregation plan contract."""

from __future__ import annotations

from pyspark_data_engineering_assignment_spark.tools.expectations import (
    quality_report,
)


def test_quality_report_counts_violations_exactly(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (2, "a", -1.0),       # between violation
            (2, None, 7.0),       # unique violation (id 2) + null name
            (4, "zz", None),      # in_set violation + null value (between)
        ],
        "id long, name string, value double",
    )
    rep = {
        r["rule"]: (r["violations"], r["passed"])
        for r in quality_report(
            df,
            [
                ("not_null", "name"),
                ("unique", "id"),
                ("between", "value", 0, 10),
                ("in_set", "name", ["a", "b"]),
                ("positive", "id"),
            ],
        ).collect()
    }
    assert rep["not_null(name)"] == (1, 0)
    assert rep["unique(id)"] == (1, 0)
    assert rep["between(value)"] == (2, 0)  # -1.0 and the NULL
    assert rep["in_set(name)"] == (2, 0)  # 'zz' and the NULL
    assert rep["positive(id)"] == (0, 1)


def test_quality_report_is_single_pass(spark):
    import contextlib
    import io

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    plan_buf = io.StringIO()
    rep = quality_report(df, [("not_null", "v"), ("unique", "id")])
    with contextlib.redirect_stdout(plan_buf):
        rep.explain(mode="simple")
    p = plan_buf.getvalue()
    # one scan feeding one aggregation chain - no self-join/union of scans
    assert p.count("Range (0, 100") == 1, p
