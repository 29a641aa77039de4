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


def test_streaming_quality_metrics_per_batch(spark, tmp_path):
    import os
    import time
    import uuid

    import pandas as pd
    import pytest

    from pyspark.sql import functions as F

    from pyspark_data_engineering_assignment_spark.tools.expectations import (
        streaming_quality_metrics,
    )

    rows = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "v": [1.0, -2.0, 3.0, None, 5.0, -6.0],
        }
    )
    src = str(tmp_path / "in")
    os.makedirs(src)
    now = time.time()
    for i in range(3):  # 2 rows per file -> 3 batches
        p = os.path.join(src, f"c{i}.csv")
        rows.iloc[i * 2 : (i + 1) * 2].to_csv(p, index=False)
        os.utime(p, (now + i, now + i))
    stream = (
        spark.readStream.format("csv").option("header", "true")
        .schema("id long, v double").option("maxFilesPerTrigger", "1").load(src)
    )
    instrumented = streaming_quality_metrics(
        stream, "quality", [("positive", "v"), ("not_null", "v")]
    )
    sink = f"q_{uuid.uuid4().hex[:8]}"
    q = (
        instrumented.groupBy().count()
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    audits = [
        p["observedMetrics"]["quality"]
        for p in q.recentProgress
        if p["observedMetrics"]
    ]
    assert sum(a["n_rows"] for a in audits) == 6
    # -2.0, NULL, -6.0 violate positive; NULL violates not_null
    assert sum(a["positive(v)"] for a in audits) == 3
    assert sum(a["not_null(v)"] for a in audits) == 1

    with pytest.raises(ValueError):
        streaming_quality_metrics(stream, "x", [("unique", "id")])


def test_positive_rule_flags_nan(spark):
    """NaN is not a positive number, but Spark's total ordering puts NaN
    above every value so `NaN <= 0` is false - unguarded, the positive
    rule silently blessed NaN. It must count as a violation, `between`
    must keep flagging it (NaN sorts above any finite hi), and integral
    columns are unaffected by the isnan arm."""
    from pyspark_data_engineering_assignment_spark.tools.expectations import (
        quality_report,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, float("nan")), (3, -1.0), (4, None)],
        "k long, v double",
    )
    rep = {
        r["rule"]: (r["violations"], r["passed"])
        for r in quality_report(
            df, [("positive", "v"), ("between", "v", 0.0, 10.0), ("positive", "k")]
        ).collect()
    }
    assert rep["positive(v)"] == (3, 0)   # NaN + negative + NULL
    assert rep["between(v)"] == (3, 0)    # NaN above hi; -1 below lo; NULL
    assert rep["positive(k)"] == (0, 1)   # integral column: unchanged
