"""Bucketed range join unit tests: containment, half-open boundaries,
bucket-straddling intervals, single-match-per-pair (no dup from
multi-bucket overlap)."""

from __future__ import annotations

from pyspark_data_engineering_assignment_spark.operators.rangejoin import (
    bucketed_range_join,
)


def test_bucketed_range_join_semantics(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 24.99), (3, 25.0), (4, 99.0), (5, 250.0), (6, 999.0)],
        ["pid", "v"],
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 25.0), ("b", 25.0, 100.0), ("c", 90.0, 260.0)],
        ["label", "lo", "hi"],
    )
    out = bucketed_range_join(points, intervals, "v", "lo", "hi", bucket_width=50.0)
    got = sorted((r["pid"], r["label"]) for r in out.collect())
    assert got == [
        (1, "a"),          # lo boundary included
        (2, "a"),
        (3, "b"),          # hi of a excluded, lo of b included
        (4, "b"), (4, "c"),  # overlapping intervals both match
        (5, "c"),          # interval straddles several buckets, one match
    ]                       # 999.0 outside all -> dropped (inner join)


def test_bucketed_range_join_no_duplicate_matches(spark):
    # a wide interval overlapping many buckets still matches each point once
    points = spark.createDataFrame([(i, float(i)) for i in range(100)], ["pid", "v"])
    intervals = spark.createDataFrame([("all", 0.0, 100.0)], ["label", "lo", "hi"])
    out = bucketed_range_join(points, intervals, "v", "lo", "hi", bucket_width=7.0)
    assert out.count() == 100
    assert out.select("pid").distinct().count() == 100


def test_bucketed_range_join_rejects_clash(spark):
    import pytest

    points = spark.createDataFrame([(1, 1.0)], ["pid", "v"])
    intervals = spark.createDataFrame([(2, 0.0, 5.0)], ["pid", "lo", "hi"])
    with pytest.raises(ValueError, match="clash"):
        bucketed_range_join(points, intervals, "v", "lo", "hi", 10.0)


def test_bucketed_range_join_equals_brute_force_property(spark):
    """Property (hypothesis): for ANY points, intervals, and bucket
    width, the bucketed plan returns exactly the brute-force theta-join
    pair set - the bucketing is a pure execution strategy, never a
    semantics change. Random widths exercise bucket-straddling,
    sub-bucket intervals, and negative domains."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vals = st.integers(min_value=-40, max_value=40)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pts=st.lists(vals, min_size=1, max_size=8),
        ivs=st.lists(st.tuples(vals, vals), min_size=1, max_size=5),
        width=st.sampled_from([0.5, 1.0, 3.0, 7.5, 50.0]),
    )
    def prop(pts, ivs, width):
        points = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(pts)], ["pid", "v"]
        )
        intervals = spark.createDataFrame(
            [
                (j, float(min(a, b)), float(max(a, b) + 1))
                for j, (a, b) in enumerate(ivs)
            ],
            ["iid", "lo", "hi"],
        )
        got = sorted(
            (r["pid"], r["iid"])
            for r in bucketed_range_join(
                points, intervals, "v", "lo", "hi", bucket_width=width
            ).collect()
        )
        expect = sorted(
            (i, j)
            for i, v in enumerate(pts)
            for j, (a, b) in enumerate(ivs)
            if min(a, b) <= v < max(a, b) + 1
        )
        assert got == expect

    prop()


def test_inverted_and_null_intervals_are_dropped_cheaply(spark):
    """An inverted interval (hi <= lo) matches no point under the
    half-open predicate - but F.sequence(start, stop) with start > stop
    generates a DESCENDING sequence, so before the guard one corrupt
    interval exploded into |lo-hi|/width bucket rows (measured: 10M rows
    from a single input row) that the exact filter then discarded.
    Now it is dropped before the explode; NULL bounds and NULL points
    match nothing; the result is exactly the valid matches."""
    from pyspark_data_engineering_assignment_spark.operators.rangejoin import (
        bucketed_range_join,
    )

    pts = spark.createDataFrame([(5.0,), (None,)], "p double")
    iv = spark.createDataFrame(
        [
            (10_000_000.0, 0.0, "inverted"),
            (3.0, 3.0, "empty"),
            (None, 10.0, "null_lo"),
            (0.0, None, "null_hi"),
            (0.0, 10.0, "good"),
        ],
        "lo double, hi double, tag string",
    )
    out = bucketed_range_join(pts, iv, "p", "lo", "hi", 1.0)
    assert [(r["p"], r["tag"]) for r in out.collect()] == [(5.0, "good")]
    # and the plan never materializes the inverted interval's buckets:
    # the filter sits below the generator
    import re

    plan = out._jdf.queryExecution().optimizedPlan().toString()
    gen_pos = plan.find("Generate")
    filt = re.search(r"Filter .*(hi|lo)", plan[gen_pos:])
    assert gen_pos >= 0 and filt is not None


def test_range_join_property_with_corrupt_rows(spark):
    """Property (hypothesis): with NULL points, NULL bounds, and RAW
    (possibly inverted or empty) intervals in the mix - and NaN points
    and bounds, which Spark's NaN-is-greatest comparisons would
    otherwise let lie - the bucketed plan still returns exactly the
    brute-force pair set over the half-open predicate (Python NaN
    comparisons are all false, so the oracle naturally says corrupt
    rows match nothing), for ANY inputs and bucket width."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_data_engineering_assignment_spark.operators.rangejoin import (
        bucketed_range_join,
    )

    vals = st.integers(min_value=-20, max_value=20)
    maybe = st.none() | vals | st.just(float("nan"))

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pts=st.lists(maybe, min_size=1, max_size=8),
        ivs=st.lists(st.tuples(maybe, maybe), min_size=1, max_size=5),
        width=st.sampled_from([1.0, 3.0, 7.5]),
    )
    def prop(pts, ivs, width):
        points = spark.createDataFrame(
            [(i, None if v is None else float(v)) for i, v in enumerate(pts)],
            "pid long, v double",
        )
        intervals = spark.createDataFrame(
            [
                (
                    j,
                    None if a is None else float(a),
                    None if b is None else float(b),
                )
                for j, (a, b) in enumerate(ivs)
            ],
            "iid long, lo double, hi double",
        )
        got = sorted(
            (r["pid"], r["iid"])
            for r in bucketed_range_join(
                points, intervals, "v", "lo", "hi", bucket_width=width
            ).collect()
        )
        expect = sorted(
            (i, j)
            for i, v in enumerate(pts)
            if v is not None
            for j, (a, b) in enumerate(ivs)
            if a is not None and b is not None and a <= v < b
        )
        assert got == expect

    prop()


def test_nan_bounded_interval_matches_nothing(spark):
    """NaN > lo is TRUE (NaN-is-greatest), floor(NaN) casts to bucket 0,
    and v < NaN is true for every v - so a NaN-hi interval passed the
    inverted-interval guard and matched real points, but only those in
    its descending 0-anchored bucket range (measured: [4, NaN) matched
    v=5 and missed v=50 - wrong twice over). A NaN bound is corrupt:
    the interval matches nothing."""
    import re

    from pyspark_data_engineering_assignment_spark.operators.rangejoin import (
        bucketed_range_join,
    )

    nan = float("nan")
    pts = spark.createDataFrame([(1, 5.0), (2, 50.0)], "pid long, v double")
    ivs = spark.createDataFrame(
        [(100, 4.0, nan), (101, nan, 6.0), (102, nan, nan), (103, 4.0, 6.0)],
        "iid long, lo double, hi double",
    )
    out = bucketed_range_join(pts, ivs, "v", "lo", "hi", bucket_width=3.0)
    assert sorted((r["pid"], r["iid"]) for r in out.collect()) == [(1, 103)]
