"""DST-boundary temporal axis (round-12 verdict task #4).

Round 11 pinned session-timezone invariance only for a FIXED-OFFSET
zone (Asia/Kolkata, +05:30 year-round). A DST zone is the harder case:
America/New_York has a nonexistent local hour (2024-03-10 02:00-02:59
never happens - spring forward, 07:00 UTC) and an ambiguous local hour
(2024-11-03 01:00-01:59 happens TWICE - fall back, 05:00-07:00 UTC).
Any temporal operator that resolved through the session zone would:

* split a session whose events straddle spring-forward (25-minute UTC
  gaps render as an 85-minute local gap across the jump),
* double-count the fall-back hour in hourly buckets (UTC hours 05 and
  06 both render as local 01:00),
* mis-order or mis-window as-of joins across the transitions.

The engine's contract is UTC-instant semantics everywhere
(``ensure_session_confs`` pins ``spark.sql.session.timeZone=UTC`` at
query-build time precisely so a driver session born in ANY zone - DST
or not - computes identical results). This corpus makes that claim
falsifiable: events planted on both 2024 US transitions, with
session-chains and click->purchase pairs crossing each boundary, run
under a session zone reset to America/New_York BEFORE EVERY query
build, against the naive-UTC DuckDB oracle. Every events-reading
oracle query must stay rows+schema+value-hash identical.

Findings (first run, recorded COVERAGE-style): no divergence - all
events-reading oracle queries hash-match on the DST corpus, because
the UTC pin is applied at build time and events.parquet carries UTC
instants end-to-end. The axis is kept as a regression gate: a future
operator that calls from_utc_timestamp / date_format with a zone, or
drops the conf pin, reds here deterministically.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from tests.oracle_harness import (

    compare_query,
    oracle_queries_reading_only,
)

pytestmark = pytest.mark.axis

SF = "/root/testdata/sf0.001"
T = dt.datetime


@pytest.fixture(scope="module")
def dst_events_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/events.parquet")
    rows = src.slice(0, 120).to_pylist()
    nxt = max(r["event_id"] for r in rows) + 1

    def e(i, ts, uid, etype, value, props='{"k": 1}'):
        return dict(event_id=i, ts=ts, user_id=uid, event_type=etype,
                    value=value, props=props)

    # --- spring forward: 2024-03-10 07:00 UTC == 03:00 EDT (02:xx local
    # never exists). User 100 chains events at 25-min UTC gaps ACROSS
    # the jump: local rendering jumps 01:45 -> 03:10, an apparent
    # 85-minute local gap that would split a session resolved locally.
    sf_day = T(2024, 3, 10)
    spring = [
        e(nxt + 0, sf_day.replace(hour=6, minute=15), 100, "click", 1.0),
        e(nxt + 1, sf_day.replace(hour=6, minute=45), 100, "view", 2.0),
        e(nxt + 2, sf_day.replace(hour=6, minute=59, second=59), 100,
          "click", 3.0),
        e(nxt + 3, sf_day.replace(hour=7, minute=0, second=0), 100,
          "purchase", 40.0),
        e(nxt + 4, sf_day.replace(hour=7, minute=10), 100, "view", 4.0),
        e(nxt + 5, sf_day.replace(hour=7, minute=35), 100, "purchase", 40.0),
        e(nxt + 6, sf_day.replace(hour=8, minute=5), 100, "view", 5.0),
    ]
    # --- fall back: 2024-11-03 05:00 UTC == 01:00 EDT, 06:00 UTC ==
    # 01:00 EST - the local 01:xx hour happens twice. User 101 chains
    # 30-min UTC gaps through BOTH renditions; hourly buckets must
    # stay the four distinct UTC hours 04/05/06/07, never a merged
    # double-weight "01:00 local".
    fb_day = T(2024, 11, 3)
    fall = [
        e(nxt + 7, fb_day.replace(hour=4, minute=50), 101, "click", 1.0),
        e(nxt + 8, fb_day.replace(hour=5, minute=20), 101, "view", 2.0),
        e(nxt + 9, fb_day.replace(hour=5, minute=50), 101, "click", 3.0),
        e(nxt + 10, fb_day.replace(hour=6, minute=20), 101, "purchase", 55.0),
        e(nxt + 11, fb_day.replace(hour=6, minute=50), 101, "view", 4.0),
        e(nxt + 12, fb_day.replace(hour=7, minute=20), 101, "purchase", 55.0),
        # a second user entirely inside the ambiguous window
        e(nxt + 13, fb_day.replace(hour=5, minute=5), 102, "signup", 0.0),
        e(nxt + 14, fb_day.replace(hour=6, minute=5), 102, "purchase", 12.5),
    ]
    sf = tmp_path_factory.mktemp("dst_events_sf")
    pq.write_table(
        pa.Table.from_pylist(rows + spring + fall, schema=src.schema),
        str(sf / "events.parquet"),
    )
    return str(sf)


def test_events_oracles_agree_across_dst_boundaries(spark, dst_events_sf):
    """Every events-reading oracle query, with the session zone reset to
    America/New_York before EACH query build (the engine re-pins UTC at
    build time - setting it once would only test the first query),
    against the naive-UTC DuckDB oracle on the DST-straddling corpus."""
    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    names = oracle_queries_reading_only({"events"})
    assert len(names) >= 25, f"query discovery collapsed: {names}"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{dst_events_sf}/events.parquet'"
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    fails = []
    try:
        for name in names:
            spark.conf.set(
                "spark.sql.session.timeZone", "America/New_York"
            )
            spec = QUERIES[name]
            sql = spec.oracle or spec.local_oracle
            try:
                ok, msg = compare_query(spark, con, spec.fn, sql, dst_events_sf)
            except Exception as ex:  # noqa: BLE001 - collect, report all
                ok, msg = False, f"{type(ex).__name__}: {ex}"
            if not ok:
                fails.append((name, msg[:250]))
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
        con.close()
    assert not fails, "DST-boundary divergence:\n" + "\n".join(
        f"  {n}: {m}" for n, m in fails
    )


def test_sessions_and_hourly_shape_across_transitions(spark, dst_events_sf):
    """Direct semantic pins (independent of the oracle, so a BOTH-sides
    -wrong bug can't hide): the spring chain is ONE session despite the
    85-minute apparent local gap, the fall chain is ONE session through
    the doubled local hour, and the fall-back window buckets into four
    distinct UTC hours with the planted counts."""
    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        sessions = QUERIES["events_sessions"].fn(spark, dst_events_sf)
        by_user = {
            r["user_id"]: r
            for r in sessions.filter(
                sessions.user_id.isin(100, 101)
            ).collect()
        }
        # exactly one session row per planted user: the chains never split
        assert sessions.filter(sessions.user_id.isin(100, 101)).count() == 2
        assert by_user[100]["n_events"] == 7
        assert by_user[101]["n_events"] == 6

        hourly = QUERIES["events_hourly"].fn(spark, dst_events_sf)
        fb: dict[str, int] = {}
        for r in hourly.collect():  # grouped by (hour, event_type)
            h = str(r["hour"])
            if h.startswith("2024-11-03"):
                fb[h] = fb.get(h, 0) + r["n_events"]
        assert fb == {
            "2024-11-03 04:00:00": 1,
            "2024-11-03 05:00:00": 3,
            "2024-11-03 06:00:00": 3,
            "2024-11-03 07:00:00": 1,
        }, fb
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
