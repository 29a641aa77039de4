"""As-of join unit tests (operators/temporal.py): backward semantics,
tie inclusion, per-key isolation, no-match nulls. The registry query
``purchase_asof_click`` additionally pins it against DuckDB's native
ASOF JOIN at every oracle run."""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pyspark_data_engineering_assignment_spark.operators.temporal import as_of_join
import pytest


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


LEFT_SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("ts", TimestampType()),
        StructField("left_id", LongType()),
    ]
)

RIGHT_SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("ts", TimestampType()),
        StructField("price", DoubleType()),
    ]
)


def test_as_of_join_semantics(spark):
    left = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 1),   # before any right -> null
            ("A", _ts("2024-01-01 11:00:00"), 2),   # tie with right @11:00 -> included
            ("A", _ts("2024-01-01 11:30:00"), 3),   # latest right <= is 11:00
            ("A", _ts("2024-01-01 13:00:00"), 4),   # latest right <= is 12:00
            ("B", _ts("2024-01-01 11:30:00"), 5),   # other key: only B rights apply
            ("C", _ts("2024-01-01 11:30:00"), 6),   # key with no right rows -> null
        ],
        LEFT_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 11:00:00"), 10.0),
            ("A", _ts("2024-01-01 12:00:00"), 20.0),
            ("B", _ts("2024-01-01 11:00:00"), 99.0),
        ],
        RIGHT_SCHEMA,
    )
    out = as_of_join(left, right, ["k"], "ts", "ts", ["price"])
    got = {r["left_id"]: r["price"] for r in out.collect()}
    assert got == {1: None, 2: 10.0, 3: 10.0, 4: 20.0, 5: 99.0, 6: None}
    # left row count preserved (left join), left columns intact
    assert out.count() == 6
    assert set(out.columns) == {"k", "ts", "left_id", "price"}


def test_as_of_join_on_date_typed_order_column(spark):
    """Round-8 ADVICE medium regression: the NaN guard's unconditional
    cast-to-double crashed date-typed as-of joins at analysis time
    (Spark cannot cast DATE to DOUBLE). The guard is now type-dispatched
    (functions/guards.py), so a DATE order column - a daily-grain as-of,
    a perfectly normal input - must work end to end."""
    left = spark.createDataFrame(
        [
            ("A", dt.date(2024, 1, 1), 1),
            ("A", dt.date(2024, 1, 5), 2),
            ("B", dt.date(2024, 1, 5), 3),
        ],
        "k string, d date, left_id long",
    )
    right = spark.createDataFrame(
        [
            ("A", dt.date(2024, 1, 2), 10.0),
            ("A", dt.date(2024, 1, 5), 20.0),
        ],
        "k string, d date, price double",
    )
    out = as_of_join(left, right, ["k"], "d", "d", ["price"])
    got = {r["left_id"]: r["price"] for r in out.collect()}
    assert got == {1: None, 2: 20.0, 3: None}


def test_percentile_threshold_on_date_typed_value_column(spark):
    """Same cast-to-double hazard in exact_percentile_threshold
    (relational.py): a date-typed value column must rank fine."""
    from pyspark_data_engineering_assignment_spark.operators.relational import (
        exact_percentile_threshold,
    )

    df = spark.createDataFrame(
        [("g", dt.date(2024, 1, i)) for i in range(1, 11)] + [("g", None)],
        "g string, d date",
    )
    # percent_rank(i) = (i-1)/9 over Jan 1..10; <= 0.5 keeps i <= 5
    out = exact_percentile_threshold(df, ["g"], "d", 0.5, out_col="median_d")
    assert out.collect()[0]["median_d"] == dt.date(2024, 1, 5)


def test_as_of_join_rejects_column_clash(spark):
    left = spark.createDataFrame([("A", _ts("2024-01-01 10:00:00"), 1)], LEFT_SCHEMA)
    right = left.withColumnRenamed("left_id", "x")
    import pytest

    with pytest.raises(ValueError, match="collide"):
        as_of_join(left, right, ["k"], "ts", "ts", ["x", "left_id"])


@pytest.mark.slow
def test_as_of_join_equals_brute_force_property(spark):
    """Property (hypothesis): for ANY left/right event sets, the union-
    tag-window as-of join equals the brute-force definition (latest
    right row with right_ts <= left_ts per key; ties by... none - right
    timestamps are made unique per key so the spec is unambiguous)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_data_engineering_assignment_spark.operators.temporal import (
        as_of_join,
    )

    keys = st.sampled_from([1, 2])
    ts = st.integers(min_value=0, max_value=20)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        lrows=st.lists(st.tuples(keys, ts), min_size=1, max_size=8),
        rrows=st.lists(st.tuples(keys, ts), min_size=1, max_size=8),
    )
    def prop(lrows, rrows):
        # unique right (key, ts) so "the latest right row" is well-defined
        rrows = sorted(set(rrows))
        left = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(lrows)], ["k", "lts", "lid"]
        )
        right = spark.createDataFrame(
            [(k, t, 100 + i) for i, (k, t) in enumerate(rrows)],
            ["k", "rts", "rid"],
        )
        got = {
            (r["k"], r["lts"], r["lid"]): r["rid"]
            for r in as_of_join(
                left, right, ["k"], "lts", "rts", ["rid"]
            ).collect()
        }
        for i, (k, t) in enumerate(lrows):
            cands = [(rt, 100 + j) for j, (rk, rt) in enumerate(rrows)
                     if rk == k and rt <= t]
            expect = max(cands)[1] if cands else None
            assert got[(k, t, i)] == expect, (k, t, cands, got)

    prop()


def test_as_of_join_null_right_rows_match_nothing(spark):
    """A right row with a NULL timestamp has no position in the as-of
    order: before the guard it sorted to the window's FRONT and its
    value carried forward into every left row preceding the first real
    right row (measured: a no-match left row silently received the
    corrupt row's value). NULL-keyed right rows likewise match nothing,
    as they would in an equi join. NULL-ts/NULL-key LEFT rows keep left
    join semantics: passed through with NULL right values."""
    left = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 1),  # before real right -> null
            ("A", _ts("2024-01-01 12:00:00"), 2),  # after real right @11
            (None, _ts("2024-01-01 12:00:00"), 3),  # null-key left: null
            ("A", None, 4),                          # null-ts left: null
        ],
        LEFT_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            ("A", None, 666.0),                         # corrupt: null ts
            (None, _ts("2024-01-01 09:00:00"), 667.0),  # corrupt: null key
            ("A", _ts("2024-01-01 11:00:00"), 10.0),
        ],
        RIGHT_SCHEMA,
    )
    out = as_of_join(left, right, ["k"], "ts", "ts", ["price"])
    got = {r["left_id"]: r["price"] for r in out.collect()}
    assert got == {1: None, 2: 10.0, 3: None, 4: None}
    assert out.count() == 4  # every left row preserved


@pytest.mark.slow
def test_as_of_join_property_with_corrupt_rows(spark):
    """Property (hypothesis): with NULL keys and NULL timestamps on
    BOTH sides in the mix, the union-tag-window as-of join equals the
    brute-force definition where corrupt right rows (NULL key or ts)
    match nothing and every left row survives with its brute-force
    match (NULL for corrupt/unmatched left rows)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_data_engineering_assignment_spark.operators.temporal import (
        as_of_join,
    )

    keys = st.none() | st.sampled_from([1, 2])
    ts = st.none() | st.integers(min_value=0, max_value=20)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        lrows=st.lists(st.tuples(keys, ts), min_size=1, max_size=8),
        rrows=st.lists(st.tuples(keys, ts), min_size=1, max_size=8),
    )
    def prop(lrows, rrows):
        # unique right (key, ts) among VALID rows so "latest" is unambiguous
        seen, rkeep = set(), []
        for k, t in rrows:
            if k is not None and t is not None and (k, t) in seen:
                continue
            seen.add((k, t))
            rkeep.append((k, t))
        left = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(lrows)],
            "k long, lts long, lid long",
        )
        right = spark.createDataFrame(
            [(k, t, 100 + j) for j, (k, t) in enumerate(rkeep)],
            "k long, rts long, rid long",
        )
        got = {
            r["lid"]: r["rid"]
            for r in as_of_join(
                left, right, ["k"], "lts", "rts", ["rid"]
            ).collect()
        }
        assert set(got) == set(range(len(lrows)))  # every left row survives
        for i, (k, t) in enumerate(lrows):
            if k is None or t is None:
                expect = None
            else:
                cands = [
                    (rt, 100 + j)
                    for j, (rk, rt) in enumerate(rkeep)
                    if rk == k and rt is not None and rt <= t
                ]
                expect = max(cands)[1] if cands else None
            assert got[i] == expect, (i, k, t, got[i], expect)

    prop()


def test_as_of_join_nan_ts_rows_are_corrupt(spark):
    """With a float order column, NaN survives isNotNull and sorts LAST
    (NaN-is-greatest): a NaN-ts left row inherited the key's LATEST
    right value as if its timestamp were +infinity, and a NaN-ts right
    row matched NaN-ts left rows (corrupt matching corrupt). Both must
    behave exactly like their NULL-ts twins: a NaN-ts right row matches
    nothing; a NaN-ts left row survives with NULL right values."""
    from pyspark_data_engineering_assignment_spark.operators.temporal import (
        as_of_join,
    )

    nan = float("nan")
    left = spark.createDataFrame(
        [(1, 5.0, 1), (1, nan, 2), (1, None, 3)],
        "k long, lts double, lid long",
    )
    right = spark.createDataFrame(
        [(1, 4.0, 100), (1, nan, 999)],
        "k long, rts double, rid long",
    )
    got = {
        r["lid"]: r["rid"]
        for r in as_of_join(left, right, ["k"], "lts", "rts", ["rid"]).collect()
    }
    # real row matches the real right; NaN-ts and NULL-ts rows match
    # nothing; the NaN-ts right row 999 appears nowhere
    assert got == {1: 100, 2: None, 3: None}
