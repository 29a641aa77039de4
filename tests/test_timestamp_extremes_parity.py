"""Timestamp-extremes axis (round-12, new): epoch boundaries, pre-1970
instants, the int64-nanoseconds ceiling, far-future years and maximum
sub-second precision in ``events.ts``.

The corpus generator emits a few days of 2024 - every temporal operator
has only ever seen a benign range. The hazards each planted instant
probes:

* **pre-1970 (negative epoch)**: micros-since-epoch goes negative;
  integer division/modulo conventions for date_trunc, hour extraction
  and window bucketing differ between floor- and truncate-toward-zero
  implementations exactly here.
* **epoch 0 and 1969-12-31 23:59:59.999999**: the off-by-one edge of
  the sign flip (one microsecond apart, different days/hours/years).
* **2262-04-11 23:47:16.854775 (int64 NANOS ceiling)**: the driver has
  shipped events.parquet as TIMESTAMP(NANOS) in earlier rounds and the
  loader still supports that encoding via nanosAsLong + truncation
  (sources/tables.py); an instant near the nanos ceiling is the value
  that would overflow if any path multiplied micros back to nanos.
* **9999-12-31 (far future)**: representable in micros (both engines)
  but outside many datetime libraries' fast paths; also the maximum
  year pandas Timestamp REJECTS (pandas nanos ceiling is 2262) - so
  this row pins that the harness's toPandas boundary and the oracle's
  .df() boundary fail or survive IDENTICALLY rather than one engine
  silently clamping.
* **.999999 precision chains**: session-gap arithmetic at exactly the
  30-minute boundary ± 1 microsecond, straddling midnight.

Findings (first run): see assertions + notes inline; the parity gate
itself is the record - every events-reading oracle query must
rows+schema+value-hash match on this corpus.
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
def extreme_ts_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/events.parquet")
    rows = src.slice(0, 120).to_pylist()
    nxt = max(r["event_id"] for r in rows) + 1

    def e(i, ts, uid, etype, value, props='{"k": 1}'):
        return dict(event_id=i, ts=ts, user_id=uid, event_type=etype,
                    value=value, props=props)

    extremes = [
        # pre-1970 negative-epoch chain (user 300): 25-min gaps across
        # the midnight/sign boundary - one session, hours -1h and 0h
        e(nxt + 0, T(1969, 12, 31, 23, 10, 0), 300, "click", 1.0),
        e(nxt + 1, T(1969, 12, 31, 23, 35, 0), 300, "view", 2.0),
        e(nxt + 2, T(1969, 12, 31, 23, 59, 59, 999999), 300, "click", 3.0),
        e(nxt + 3, T(1970, 1, 1, 0, 0, 0), 300, "purchase", 10.0),
        e(nxt + 4, T(1970, 1, 1, 0, 20, 0), 300, "view", 4.0),
        # deep past
        e(nxt + 5, T(1900, 6, 15, 12, 30, 45, 123456), 301, "signup", 0.0),
        # int64-nanos ceiling neighborhood - both INSIDE the pandas
        # nanos range (ceiling 2262-04-11T23:47:16.854775807): the
        # comparison harness renders results through pandas, so the
        # beyond-ceiling case is pinned separately as a canary below
        e(nxt + 6, T(2262, 4, 11, 23, 47, 16, 0), 302, "view", 5.0),
        e(nxt + 7, T(2262, 4, 11, 23, 47, 16, 854775), 302, "click", 6.0),
        # micro-precision session-gap edges (user 303): consecutive gaps
        # of exactly 30:00.000000 (merges, round-9 boundary pin) and
        # 30:00.000001 (splits)
        e(nxt + 8, T(2024, 2, 1, 10, 0, 0, 0), 303, "click", 1.0),
        e(nxt + 9, T(2024, 2, 1, 10, 30, 0, 0), 303, "view", 2.0),
        e(nxt + 10, T(2024, 2, 1, 11, 0, 0, 1), 303, "purchase", 9.0),
    ]
    sf = tmp_path_factory.mktemp("extreme_ts_sf")
    pq.write_table(
        pa.Table.from_pylist(rows + extremes, schema=src.schema),
        str(sf / "events.parquet"),
    )
    return str(sf)


def test_events_oracles_agree_on_extreme_timestamps(spark, extreme_ts_sf):
    names = oracle_queries_reading_only({"events"})
    assert len(names) >= 25, f"query discovery collapsed: {names}"
    # gapfill is EXPECTED to refuse this corpus (densification budget -
    # asserted separately below); everything else must parity-match
    names = [n for n in names if n != "events_hourly_gapfill"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{extreme_ts_sf}/events.parquet'"
    )
    try:
        fails = run_parity_gate(spark, con, names, extreme_ts_sf)
    finally:
        con.close()
    assert not fails, "timestamp-extreme divergence:\n" + "\n".join(
        f"  {n}: {m}" for n, m in fails
    )


def test_gapfill_refuses_corrupt_span_loudly(spark, extreme_ts_sf):
    """FINDING (round-12 timestamp axis): one stray far-future or
    deep-past timestamp inflates the gap-fill spine silently - this
    corpus' 1900..2262 span would densify ~3.18M hourly buckets x 5
    series (~15.9M rows from a 131-row table; measured 10.4M on the
    2024..2262 variant). resample_gapfill now budget-checks the
    observed span before densifying and must fail LOUDLY here, naming
    the bounds."""
    import pytest as _pytest

    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    with _pytest.raises(ValueError, match="max_spine_buckets"):
        QUERIES["events_hourly_gapfill"].fn(spark, extreme_ts_sf)


def test_pandas_nanos_ceiling_is_a_loud_harness_boundary(spark, tmp_path):
    """CANARY: an instant one microsecond PAST the pandas nanos ceiling
    (2262-04-11T23:47:16.854776) computes fine in BOTH engines but
    cannot cross the toPandas comparison boundary - raw-timestamp-
    emitting queries raise OutOfBoundsDatetime there instead of
    silently clamping. The driver's value-hash shares this boundary,
    so the failure mode is loud, not wrong."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/events.parquet")
    rows = src.slice(0, 20).to_pylist()
    rows.append(
        dict(event_id=10**6, ts=T(2262, 4, 11, 23, 47, 16, 854776),
             user_id=9, event_type="view", value=1.0, props="{}")
    )
    d = tmp_path
    pq.write_table(pa.Table.from_pylist(rows, schema=src.schema),
                   str(d / "events.parquet"))

    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    df = QUERIES["event_burst_compaction"].fn(spark, str(d))
    assert df.count() == 21  # the ENGINE handles the instant fine
    # Arrow path: "Casting ... would result in out of bounds timestamp";
    # non-Arrow pandas path: "Out of bounds nanosecond timestamp"
    with pytest.raises(Exception, match="[Oo]ut of bounds"):
        df.toPandas()


def test_negative_epoch_bucketing_and_sessions(spark, extreme_ts_sf):
    """Semantic pins for the sign boundary: hour buckets truncate
    toward -infinity (23:59:59.999999 belongs to 1969-12-31 23:00, not
    1970-01-01 00:00), and the 25-min chain across the boundary is ONE
    session while the 30:00.000001 gap splits."""
    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    hourly = QUERIES["events_hourly"].fn(spark, extreme_ts_sf)
    pre = {}
    for r in hourly.collect():
        h = str(r["hour"])
        if h.startswith(("1969", "1970-01-01 00")):
            pre[h] = pre.get(h, 0) + r["n_events"]
    assert pre == {
        "1969-12-31 23:00:00": 3,
        "1970-01-01 00:00:00": 2,
    }, pre

    sessions = QUERIES["events_sessions"].fn(spark, extreme_ts_sf)
    n300 = sessions.filter(sessions.user_id == 300).count()
    assert n300 == 1  # never split at the epoch sign flip
    n303 = sessions.filter(sessions.user_id == 303).count()
    assert n303 == 2  # exactly-gap merges, gap+1us splits
