"""Session-timezone invariance of the temporal query family (round-11).

The driver builds its own vanilla SparkSession, and a deployment's
driver may run in ANY timezone - `spark.sql.session.timeZone` changes
how TIMESTAMP values are interpreted at every string boundary and how
hour/day extraction resolves. The engine's contract is that results
are timezone-INVARIANT: events.parquet carries UTC-normalized
instants, every temporal operator derives from those instants, and the
DuckDB oracles run in UTC regardless. A non-UTC driver probe was part
of the round-gate verification but never committed as a regression
pin; this file is that pin.

Asia/Kolkata on purpose: a half-hour offset (+05:30) breaks any
accidental whole-hour alignment that Europe/Berlin-style offsets would
mask - bucketing by hour, day-of-week heatmaps, trailing windows and
session gaps all shift by 30 minutes if anything resolves through the
session zone.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import duckdb_connection, compare_query

pytestmark = pytest.mark.axis

SF = "/root/testdata/sf0.001"

# the queries where session-zone leakage would show: hour/dow
# extraction, window buckets, session gaps, as-of alignment, gap-fill
# spines, trailing-window arithmetic
TEMPORAL = [
    "events_hourly",
    "events_hourly_gapfill",
    "events_sessions",
    "activity_dow_hour_heatmap",
    "user_trailing_hour_spend",
    "user_moving_spend",
    "purchase_asof_click",
    "event_burst_compaction",
    "value_hour_regression_stats",
    "user_cohort_retention",
]


@pytest.fixture()
def kolkata_session(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_temporal_queries_are_session_timezone_invariant(kolkata_session):
    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    missing = [n for n in TEMPORAL if n not in QUERIES]
    assert not missing, f"registry lost temporal queries: {missing}"
    con = duckdb_connection(SF)
    fails = []
    try:
        for name in TEMPORAL:
            spec = QUERIES[name]
            sql = spec.oracle or spec.local_oracle
            assert sql, f"{name} has no oracle"
            ok, msg = compare_query(
                kolkata_session, con, spec.fn, sql, SF
            )
            if not ok:
                fails.append((name, msg[:200]))
    finally:
        con.close()
    assert not fails, "session-timezone leakage:\n" + "\n".join(
        f"  {n}: {m}" for n, m in fails
    )
