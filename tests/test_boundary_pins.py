"""Boundary-convention audit (round-8 verdict task #6).

The session-window bug was a CLASS, not an instance: an operator with
an interval edge (window start/end, gap, RANGE frame, as-of tie,
attribution lookback, bin edge, week/day truncation) can silently
disagree with its oracle exactly ON the edge, and organic test data
rarely lands there - ``events_sessions`` was green for seven rounds
because sf0.01 contains no two events exactly 30:00.000 apart.

This file manufactures the collisions: a tiny events table where every
interval-edged query family has at least one row pair exactly on its
boundary, then runs EVERY oracle-bearing events-only registry query
through the same strict compare (rows + schema + value hash) the
driver gate applies. A convention drift on any edge reds this file
deterministically instead of waiting for unlucky data.

Edges planted (see ROWS):
  * two events exactly gap (30 min) apart        -> session MERGE
  * two events exactly 3600 s apart              -> trailing-hour RANGE
  * same (user, type) exactly 5 min apart        -> burst compaction gap
  * click at the purchase's exact ts             -> as-of <= tie
  * click exactly 1 h before a purchase          -> attribution lookback
  * events exactly on hour / midnight / Monday   -> tumbling, dow, week
  * values exactly on width_bucket bin edges     -> 0.0 / 250.0 / 500.0
  * two days with exactly equal day-spend        -> top-days tie-break
  * funnel stages at the SAME timestamp          -> strictly-after rule
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from tests.oracle_harness import oracle_queries_reading_only, run_parity_gate

T = dt.datetime  # base day: Monday 2024-01-15 (an exact week boundary)


def _e(eid, ts, uid, etype, value, k=1):
    return (eid, ts, uid, etype, value, '{"k": %d}' % k)


ROWS = [
    # user 1 - session gap edges: 12:00 and 12:30 are EXACTLY 30 min
    # apart (merge); the third event is 30 min + 1 us after (split)
    _e(1, T(2024, 1, 15, 12, 0, 0), 1, "view", 10.0),
    _e(2, T(2024, 1, 15, 12, 30, 0), 1, "view", 20.0),
    _e(3, T(2024, 1, 15, 13, 0, 0, 1), 1, "view", 30.0),
    # user 2 - trailing-hour RANGE frame: exactly 3600 s apart
    _e(4, T(2024, 1, 15, 10, 0, 0), 2, "click", 100.0),
    _e(5, T(2024, 1, 15, 11, 0, 0), 2, "click", 50.0),
    _e(6, T(2024, 1, 15, 12, 0, 0, 1), 2, "click", 25.0),
    # user 3 - burst compaction: same type exactly 5 min apart (merge),
    # then 5 min + 1 us (new burst)
    _e(7, T(2024, 1, 15, 9, 0, 0), 3, "error", 1.0),
    _e(8, T(2024, 1, 15, 9, 5, 0), 3, "error", 2.0),
    _e(9, T(2024, 1, 15, 9, 10, 0, 1), 3, "error", 3.0),
    # user 4 - as-of tie (click at the purchase's exact ts) and
    # attribution lookback edge (click exactly 1 h before a purchase)
    _e(10, T(2024, 1, 15, 14, 0, 0), 4, "click", 5.0),
    _e(11, T(2024, 1, 15, 14, 0, 0), 4, "purchase", 60.0),
    _e(12, T(2024, 1, 15, 13, 30, 0), 4, "click", 4.0),
    _e(13, T(2024, 1, 15, 14, 30, 0), 4, "purchase", 80.0),
    # user 5 - funnel strictly-after: view and click share a timestamp
    # (click must NOT count as reached), purchase 1 s later
    _e(14, T(2024, 1, 15, 15, 0, 0), 5, "view", 7.0),
    _e(15, T(2024, 1, 15, 15, 0, 0), 5, "click", 8.0),
    _e(16, T(2024, 1, 15, 15, 0, 1), 5, "purchase", 90.0),
    # user 6 - width_bucket bin edges (bins [0,500)/50 -> edges every
    # 10): exactly 0.0 (first bin), exactly 250.0 (interior edge),
    # exactly 500.0 (overflow bin), and just-below-edge
    _e(17, T(2024, 1, 15, 16, 0, 0), 6, "signup", 0.0),
    _e(18, T(2024, 1, 15, 16, 10, 0), 6, "signup", 250.0),
    _e(19, T(2024, 1, 15, 16, 20, 0), 6, "signup", 500.0),
    _e(20, T(2024, 1, 15, 16, 30, 0), 6, "signup", 249.99),
    # user 7 - truncation edges: exactly midnight Monday (hour, day,
    # dow AND week boundary all at once), exactly midnight Sunday
    _e(21, T(2024, 1, 15, 0, 0, 0), 7, "view", 11.0),
    _e(22, T(2024, 1, 14, 0, 0, 0), 7, "view", 12.0),
    # user 8 - two days with EXACTLY equal total spend (tie-break by
    # day must be deterministic both sides): 30+70 vs 50+50
    _e(23, T(2024, 1, 16, 8, 0, 0), 8, "purchase", 30.0),
    _e(24, T(2024, 1, 16, 9, 0, 0), 8, "purchase", 70.0),
    _e(25, T(2024, 1, 17, 8, 0, 0), 8, "purchase", 50.0),
    _e(26, T(2024, 1, 17, 9, 0, 0), 8, "purchase", 50.0),
    # user 9 - equal-value rank ties for quantiles/winsor/deciles
    _e(27, T(2024, 1, 15, 17, 0, 0), 9, "view", 100.0),
    _e(28, T(2024, 1, 15, 17, 5, 0), 9, "view", 100.0),
    _e(29, T(2024, 1, 15, 17, 10, 0), 9, "view", 100.0),
    _e(30, T(2024, 1, 15, 17, 15, 0), 9, "error", 100.0),
    # filler variety so group-by queries have >1 group everywhere
    _e(31, T(2024, 1, 15, 18, 0, 0), 10, "signup", 42.5),
    _e(32, T(2024, 1, 15, 18, 30, 0), 10, "click", 17.25, k=3),
    _e(33, T(2024, 1, 15, 19, 0, 0), 10, "purchase", 201.01, k=5),
    _e(34, T(2024, 1, 22, 12, 0, 0), 10, "view", 3.5),  # next ISO week
    _e(35, T(2024, 1, 8, 12, 0, 0), 2, "view", 6.25),  # prior ISO week
]


@pytest.fixture(scope="module")
def boundary_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = tmp_path_factory.mktemp("boundary_sf")
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in ROWS], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    pq.write_table(table, str(sf / "events.parquet"))
    return str(sf)




@pytest.mark.slow
def test_every_events_oracle_agrees_on_boundary_collisions(spark, boundary_sf):
    names = oracle_queries_reading_only({"events"})
    assert len(names) >= 35, f"query discovery collapsed: {names}"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{boundary_sf}/events.parquet'"
    )
    try:
        fails = run_parity_gate(spark, con, names, boundary_sf)
        assert not fails, "boundary-convention drift:\n" + "\n".join(
            f"  {n}: {m}" for n, m in fails
        )
    finally:
        con.close()
