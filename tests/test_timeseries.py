"""resample_gapfill: hypertable-style rollup + densification golden tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.operators.timeseries import (
    resample_gapfill,
)
import pytest


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


def test_gapfill_golden(spark):
    rows = [
        # series A: events in hours 0 and 2, gap at hour 1
        Row(series="A", ts=_ts(0, 10), value=1.50),
        Row(series="A", ts=_ts(0, 40), value=2.25),
        Row(series="A", ts=_ts(2, 5), value=4.00),
        # series B: only hour 1 - leading and trailing gaps
        Row(series="B", ts=_ts(1, 30), value=10.00),
    ]
    df = spark.createDataFrame(rows)
    out = resample_gapfill(df, "series", "ts", "value", unit="hour")
    got = {
        (r.series, r.bucket_ts.hour): (
            r.n_events,
            r.sum_value_cents,
            r.locf_sum_cents,
            r.is_gap,
        )
        for r in out.collect()
    }
    # Spine covers the full global span (hours 0..2) for BOTH series.
    assert len(got) == 6
    assert got[("A", 0)] == (2, 375, 375, False)
    assert got[("A", 1)] == (0, 0, 375, True)  # zero-filled, locf carries
    assert got[("A", 2)] == (1, 400, 400, False)
    assert got[("B", 0)] == (0, 0, None, True)  # before first obs: locf null
    assert got[("B", 1)] == (1, 1000, 1000, False)
    assert got[("B", 2)] == (0, 0, 1000, True)


def test_gapfill_single_bucket_no_gaps(spark):
    df = spark.createDataFrame(
        [Row(series="X", ts=_ts(5, i) , value=1.0) for i in range(3)]
    )
    out = resample_gapfill(df, "series", "ts", "value", unit="hour").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_events, r.sum_value_cents, r.is_gap) == (3, 300, False)


def test_ewma_matches_reference_recurrence(spark):
    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        ewma_by_key,
    )

    rows = [  # (key, order, value) - inserted out of order on purpose
        ("u1", 3, 30.0),
        ("u1", 1, 10.0),
        ("u1", 2, 20.0),
        ("u2", 1, 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    got = {
        r["k"]: (r["n_events"], r["ewma_value"])
        for r in ewma_by_key(df, ["k"], ["o"], "v", alpha=0.25).collect()
    }

    def ref(xs, a=0.25):
        s = xs[0]
        for x in xs[1:]:
            s = a * x + (1 - a) * s
        return s

    assert got["u1"] == (3, ref([10.0, 20.0, 30.0]))
    assert got["u2"] == (1, 5.0)
    # partitioning must not change the fold order (total order by o)
    got2 = {
        r["k"]: r["ewma_value"]
        for r in ewma_by_key(
            df.repartition(5, "v"), ["k"], ["o"], "v", alpha=0.25
        ).collect()
    }
    assert got2 == {k: v for k, (_, v) in got.items()}


def test_ewma_alpha_validation(spark):
    import pytest as _pytest

    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        ewma_by_key,
    )

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, o long, v double")
    with _pytest.raises(ValueError):
        ewma_by_key(df, ["k"], ["o"], "v", alpha=0.0)


def test_funnel_counts_strictly_after_semantics(spark):
    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        funnel_counts,
    )

    rows = [
        # u1 completes the funnel in order
        ("u1", 1, "view"), ("u1", 2, "click"), ("u1", 3, "purchase"),
        # u2 clicks BEFORE viewing: click must not count (not after view)
        ("u2", 1, "click"), ("u2", 2, "view"),
        # u3 purchase without click: stops at stage 1
        ("u3", 1, "view"), ("u3", 2, "purchase"),
        # u4 same-timestamp click: strict > excludes it
        ("u4", 5, "view"), ("u4", 5, "click"),
        # u5 never views: contributes nowhere
        ("u5", 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts long, event_type string")
    got = {
        r["stage"]: (r["event_type"], r["n_users"])
        for r in funnel_counts(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {1: ("view", 4), 2: ("click", 1), 3: ("purchase", 1)}


def test_funnel_counts_empty_stages_rejected(spark):
    import pytest as _pytest

    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        funnel_counts,
    )

    df = spark.createDataFrame([("u", 1, "view")], "user_id string, ts long, event_type string")
    with _pytest.raises(ValueError):
        funnel_counts(df, "user_id", "ts", "event_type", [])


@pytest.mark.slow
def test_ewma_property_matches_python_fold(spark):
    """Property (hypothesis): for ANY (key, unique order, value-or-NULL)
    rows and any alpha, ewma_by_key equals the Python recurrence folded
    over the key's non-null values in order - NULL observations are
    skipped (not poison), n_events counts the values actually used, and
    an all-NULL key is absent from the output."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        ewma_by_key,
    )

    vals = st.none() | st.integers(min_value=-1000, max_value=1000)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(st.sampled_from(["a", "b"]), vals), min_size=1, max_size=12
        ),
        alpha=st.sampled_from([0.125, 0.5, 1.0]),
    )
    def prop(rows, alpha):
        # order key = list index: unique (tie-free contract) and total
        df = spark.createDataFrame(
            [
                (k, i, None if v is None else float(v))
                for i, (k, v) in enumerate(rows)
            ],
            "k string, o long, v double",
        )
        got = {
            r["k"]: (r["n_events"], r["ewma_value"])
            for r in ewma_by_key(df, ["k"], ["o"], "v", alpha=alpha).collect()
        }
        expect = {}
        for key in ("a", "b"):
            seq = [float(v) for k, v in rows if k == key and v is not None]
            if not seq:
                continue  # all-NULL / absent key: no output row
            s = seq[0]
            for x in seq[1:]:
                s = alpha * x + (1.0 - alpha) * s
            expect[key] = (len(seq), s)
        # identical IEEE fold order on both sides -> exact equality
        assert got == expect, (rows, alpha, got, expect)

    prop()


def test_gapfill_spine_budget_guard(spark):
    """Round-12 guard: a span over max_spine_buckets fails loudly
    BEFORE densifying, naming the observed bounds; the same data under
    a sufficient budget (or a coarser unit) proceeds."""
    import pytest

    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        resample_gapfill,
    )

    df = spark.createDataFrame(
        [("a", "1970-01-01 00:00:00", 1.0), ("a", "1970-01-03 00:00:00", 2.0)],
        "series string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError, match="1970-01-03.*max_spine_buckets=10"):
        resample_gapfill(df, "series", "ts", "value", unit="hour",
                         max_spine_buckets=10)
    assert (
        resample_gapfill(df, "series", "ts", "value", unit="hour",
                         max_spine_buckets=49).count() == 49
    )
    assert (
        resample_gapfill(df, "series", "ts", "value", unit="day",
                         max_spine_buckets=10).count() == 3
    )


def test_gapfill_budget_covers_month_and_year_units(spark):
    """Round-12 advice: the densification budget previously skipped any
    unit outside second..week, so a corrupt far-future timestamp could
    still explode a MONTHLY spine unguarded. Pins that month/year (via
    conservative fixed divisors) now hit the same loud failure, and
    that a sane monthly span still proceeds."""
    import pytest

    df = spark.createDataFrame(
        [("a", "1970-01-01 00:00:00", 1.0), ("a", "2262-01-01 00:00:00", 2.0)],
        "series string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    # 292 years = ~3.5k monthly buckets / ~292 yearly buckets
    with pytest.raises(ValueError, match="month buckets.*max_spine_buckets=100"):
        resample_gapfill(df, "series", "ts", "value", unit="month",
                         max_spine_buckets=100)
    with pytest.raises(ValueError, match="year buckets.*max_spine_buckets=100"):
        resample_gapfill(df, "series", "ts", "value", unit="year",
                         max_spine_buckets=100)
    sane = spark.createDataFrame(
        [("a", "2024-01-15 00:00:00", 1.0), ("a", "2024-04-02 00:00:00", 2.0)],
        "series string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert (
        resample_gapfill(sane, "series", "ts", "value", unit="month",
                         max_spine_buckets=100).count() == 4  # Jan..Apr
    )


def test_gapfill_bounds_aggregate_runs_once_as_literals(spark):
    """Round-12 advice: the spine reuses the collected bounds as plan
    literals instead of re-running the min/max aggregate inside a
    broadcast cross join - the optimized plan must contain no join at
    all between the series list and a bounds subquery (exactly one
    Aggregate over the input for the spine side: the groupBy)."""
    df = spark.createDataFrame(
        [("a", "2024-01-01 03:00:00", 1.0)],
        "series string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = resample_gapfill(df, "series", "ts", "value", unit="hour")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the only join left is the spine LEFT JOIN actuals
    assert plan.lower().count("join") == 1, plan
