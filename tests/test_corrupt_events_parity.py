"""Corrupt-events oracle parity (round-9; completes the per-table
degenerate gates beside test_clustering.py's vectors and
test_corrupt_documents_parity.py's text).

The trigger: one out-of-range double in the money column crashed every
cents query outright - Spark's ANSI `cast(value AS DECIMAL(18,2))`
throws NUMERIC_VALUE_OUT_OF_RANGE on 1e308 (and on NaN), and DuckDB's
plain CAST throws the same class - a single corrupt row poisoning
whole-table aggregates at 100 TB. The fix (this round): every raw
money-column cast is `try_cast` on the Spark side and a NaN-guarded
`TRY_CAST` in the oracles (DuckDB's TRY_CAST itself throws on NaN), so
corrupt observations are SKIPPED, the repo's established convention.

This file pins the whole class: every events-only oracle-bearing
registry query runs on an events table containing NULL ts, NULL
user_id, NULL event_type, NULL/NaN/+inf/-inf/1e308 values, negative
values, and NULL/malformed JSON props - through the strict
rows+schema+value-hash compare the driver gate applies.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from tests.oracle_harness import oracle_queries_reading_only, run_parity_gate

pytestmark = pytest.mark.axis

SF = "/root/testdata/sf0.001"
T = dt.datetime


@pytest.fixture(scope="module")
def corrupt_events_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/events.parquet")
    rows = src.slice(0, 120).to_pylist()
    nxt = max(r["event_id"] for r in rows) + 1

    def e(i, ts, uid, etype, value, props='{"k": 1}'):
        return dict(event_id=i, ts=ts, user_id=uid, event_type=etype,
                    value=value, props=props)

    base = T(2024, 1, 20, 12, 0, 0)
    rows += [
        # corrupt money values on otherwise-normal rows
        e(nxt, base, 3, "purchase", float("nan")),
        e(nxt + 1, base.replace(hour=13), 3, "purchase", float("inf")),
        e(nxt + 2, base.replace(hour=14), 3, "purchase", float("-inf")),
        e(nxt + 3, base.replace(hour=15), 3, "purchase", 1e308),
        e(nxt + 4, base.replace(hour=16), 3, "purchase", -42.5),
        e(nxt + 5, base.replace(hour=17), 3, "purchase", None),
        # corrupt keys / times
        e(nxt + 6, None, 4, "click", 10.0),
        e(nxt + 7, base, None, "click", 11.0),
        e(nxt + 8, base, 5, None, 12.0),
        # corrupt props
        e(nxt + 9, base.replace(hour=18), 6, "view", 13.0, props=None),
        e(nxt + 10, base.replace(hour=19), 6, "view", 14.0,
          props="{not json"),
        e(nxt + 11, base.replace(hour=20), 6, "view", 15.0, props=""),
        # valid JSON whose k is not a long (round-9 review: plain
        # CAST(... AS BIGINT) threw in DuckDB; typed variant_get
        # coerced 2.9->2 and true->1 where the json path nulls)
        e(nxt + 12, base.replace(hour=21), 6, "view", 1.0,
          props='{"k": "7"}'),
        e(nxt + 13, base.replace(hour=21, minute=5), 6, "view", 1.0,
          props='{"k": "abc"}'),
        e(nxt + 14, base.replace(hour=21, minute=10), 6, "view", 1.0,
          props='{"k": 2.9}'),
        e(nxt + 15, base.replace(hour=21, minute=15), 6, "view", 1.0,
          props='{"k": true}'),
        e(nxt + 16, base.replace(hour=21, minute=20), 6, "view", 1.0,
          props='{"k": null}'),
        e(nxt + 17, base.replace(hour=21, minute=25), 6, "view", 1.0,
          props='{"k": 99999999999999999999999}'),
        e(nxt + 18, base.replace(hour=21, minute=30), 6, "view", 1.0,
          props="{}"),
    ]
    # NULL event_id: an order TIE-BREAK key with no value - the fold/
    # window exclusion must treat it exactly like a NULL ts on both
    # sides (round-9 review: user_value_ewma's oracle only filtered ts)
    rows.append(
        dict(event_id=None, ts=base.replace(hour=22), user_id=7,
             event_type="view", value=3.25, props='{"k": 1}')
    )
    # round-10 promotion probes - the two shapes the round-9 fixture
    # happened to miss:
    # (a) a (user_id, ts) TIE where one row's event_id is NULL: Spark
    #     sorts the NULL tie-break key FIRST, DuckDB LAST, so any
    #     sequential window (running sum, lag, SCD2 change points)
    #     that does not exclude NULL event_id diverges at the tie
    tie = base.replace(hour=23)
    rows += [
        e(nxt + 20, tie, 8, "purchase", 5.0),
        dict(event_id=None, ts=tie, user_id=8, event_type="click",
             value=7.0, props='{"k": 1}'),
        e(nxt + 21, tie, 8, "error", 2.0),
        e(nxt + 22, base.replace(hour=23, minute=30), 8, "purchase", 1.0),
    ]
    # (b) a NULL-ts row for a user who ALSO has real-ts events: the
    #     engines place the unplaceable row at opposite ENDS of the
    #     (ts, event_id) order, so a cumulative balance/peak that does
    #     not exclude NULL ts diverges (the round-9 NULL-ts row's user
    #     had no other events - green by luck, not by design)
    rows += [
        e(nxt + 23, base.replace(hour=9), 4, "purchase", 100.0),
        e(nxt + 24, base.replace(hour=10), 4, "error", 60.0),
        e(nxt + 25, base.replace(hour=11), 4, "purchase", 3.0),
    ]
    sf = tmp_path_factory.mktemp("corrupt_events_sf")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=src.schema),
        str(sf / "events.parquet"),
    )
    return str(sf)


def test_every_events_oracle_agrees_on_corrupt_events(
    spark, corrupt_events_sf
):
    names = oracle_queries_reading_only({"events"})
    assert len(names) >= 35, f"query discovery collapsed: {names}"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{corrupt_events_sf}/events.parquet'"
    )
    try:
        fails = run_parity_gate(spark, con, names, corrupt_events_sf)
        assert not fails, "corrupt-events oracle drift:\n" + "\n".join(
            f"  {n}: {m}" for n, m in fails
        )
    finally:
        con.close()
