"""Calendar-boundary axis (round-12, new): leap days, the century
leap-rule exception, and ISO-week truncation across year boundaries.

The generator's corpus lives inside one ordinary stretch of 2024;
every dow/week/cohort operator has only ever seen mid-year dates. The
planted hazards:

* **2024-02-29** (leap day) and its neighbors: day arithmetic
  (``date_diff // 7`` in the cohort matrix) must count the 29th.
* **2000-02-29** (divisible-by-400 century: IS a leap year) and
  **2100-02-28 -> 03-01** (divisible-by-100 only: NOT a leap year):
  the leap rule's both exceptions.
* **year-boundary ISO weeks**: 2023-12-31 is a SUNDAY - its ISO
  Monday-week starts 2023-12-25, while 2024-01-01 (a Monday) starts
  its own; and 2021-01-01 belongs to ISO week 53 OF 2020. Engines
  that truncate weeks via year-local week numbers diverge exactly
  here; both Spark and DuckDB must land on the same Monday DATE.
* a **user whose cohort week spans the year boundary** (first seen
  2023-12-31, active 2024-01-01 and 01-08): weeks_since must be 0, 0,
  1 - integer day arithmetic, not week-number subtraction (which
  would yield a negative at the wrap).

Findings (first run): every events-reading oracle query hash-matches -
both engines implement ISO Monday truncation as a date operation and
the proleptic Gregorian leap rule identically; the cohort pin below
confirms the year-wrap arithmetic directly.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from tests.oracle_harness import (

    oracle_queries_reading_only,
    run_parity_gate,
)

pytestmark = pytest.mark.axis

SF = "/root/testdata/sf0.001"
T = dt.datetime


@pytest.fixture(scope="module")
def calendar_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/events.parquet")
    rows = src.slice(0, 120).to_pylist()
    nxt = max(r["event_id"] for r in rows) + 1

    def e(i, ts, uid, etype, value):
        return dict(event_id=i, ts=ts, user_id=uid, event_type=etype,
                    value=value, props='{"k": 1}')

    planted = [
        # leap day 2024 and neighbors
        e(nxt + 0, T(2024, 2, 28, 23, 59, 59), 500, "view", 1.0),
        e(nxt + 1, T(2024, 2, 29, 0, 0, 1), 500, "view", 2.0),
        e(nxt + 2, T(2024, 2, 29, 12, 0, 0), 500, "purchase", 20.0),
        e(nxt + 3, T(2024, 3, 1, 0, 0, 1), 500, "view", 3.0),
        # century rule: 2000 leaps, 2100 does not
        e(nxt + 4, T(2000, 2, 29, 10, 0, 0), 501, "signup", 0.0),
        e(nxt + 5, T(2100, 2, 28, 10, 0, 0), 501, "view", 4.0),
        e(nxt + 6, T(2100, 3, 1, 10, 0, 0), 501, "view", 5.0),
        # ISO week across the year wrap: Sunday -> Monday
        e(nxt + 7, T(2023, 12, 31, 9, 0, 0), 502, "signup", 0.0),
        e(nxt + 8, T(2024, 1, 1, 9, 0, 0), 502, "purchase", 30.0),
        e(nxt + 9, T(2024, 1, 8, 9, 0, 0), 502, "view", 6.0),
        # ISO week 53 of the PREVIOUS year
        e(nxt + 10, T(2021, 1, 1, 9, 0, 0), 503, "view", 7.0),
    ]
    sf = tmp_path_factory.mktemp("calendar_sf")
    pq.write_table(
        pa.Table.from_pylist(rows + planted, schema=src.schema),
        str(sf / "events.parquet"),
    )
    return str(sf)


def test_events_oracles_agree_on_calendar_boundaries(spark, calendar_sf):
    names = oracle_queries_reading_only({"events"})
    assert len(names) >= 25, f"query discovery collapsed: {names}"
    # gapfill densifies the 2000..2100 planted span to ~876k hourly
    # buckets x 5 series (minutes of pure spine volume, no calendar
    # logic) - its span behavior is the timestamp-extremes axis's job
    names = [n for n in names if n != "events_hourly_gapfill"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{calendar_sf}/events.parquet'"
    )
    try:
        fails = run_parity_gate(spark, con, names, calendar_sf)
    finally:
        con.close()
    assert not fails, "calendar-boundary divergence:\n" + "\n".join(
        f"  {n}: {m}" for n, m in fails
    )


def test_cohort_week_arithmetic_across_year_wrap(spark, calendar_sf):
    """Direct pin: user 502 first seen Sunday 2023-12-31 -> cohort week
    2023-12-25 (ISO Monday); activity on 01-01 (+1 day) is
    weeks_since 0 and on 01-08 (+8 days) weeks_since 1 - day
    arithmetic, never week-number subtraction (which wraps negative at
    the year boundary)."""
    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    rows = QUERIES["user_cohort_retention"].fn(spark, calendar_sf).collect()
    wrap = {
        (r["cohort_week"], r["weeks_since"]): r
        for r in rows
        if str(r["cohort_week"]).startswith("2023-12-25")
    }
    assert set(wrap) == {("2023-12-25", 0), ("2023-12-25", 1)}, rows
