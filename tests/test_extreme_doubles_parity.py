"""Extreme-double axis (round-12, new): ±Inf, ±DBL_MAX, subnormals,
negative zero in ``events.value``.

Rounds 8-9 covered NaN and out-of-range money; the remaining
floating-point degenerates were never planted. The hazards each value
class probes:

* ``±inf``: survives every arithmetic guard built for NaN
  (``isnan(inf)`` is false) yet overflows any cast to a bounded type -
  Spark's ``floor(inf)`` cast to LONG saturates to LONG_MAX while
  DuckDB keeps the DOUBLE ``inf``, so any binning/bucketing query that
  floors raw doubles diverges loudly if infinity ever reaches it.
* ``±1.7976931348623157e308`` (DBL_MAX): finite, so NaN/Inf guards
  pass it, but ``* 100`` in the cents path overflows to infinity and
  DECIMAL(18,2) overflows long before that - both engines must agree
  the row's money is NULL, not crash (the round-9 finding 41 guard,
  now pinned at the far edge).
* ``5e-324`` (min subnormal) / ``1e-310``: exercise
  gradual-underflow handling in sums/averages/stddev - both engines
  compute in IEEE doubles so these must hash-match exactly.
* ``-0.0``: equal to 0.0 but with a different sign bit and a different
  ``repr``; group keys, MIN/MAX and the driver-style value hash must
  not see two zeros (Spark normalizes -0.0 to 0.0 in exchange/agg
  keys; the harness's strict canon would red on a raw '-0.0' vs '0.0'
  rendering split).

Findings (first run): every events-reading oracle query hash-matches
on the planted corpus - infinity is excluded from money by the
existing try_cast guards, from quantile/stat paths by the isnan+cast
conventions, and both engines agree on subnormal arithmetic and
-0.0 normalization in aggregates. Kept as the regression gate for the
float edge of the input domain.
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

DBL_MAX = 1.7976931348623157e308
SUBNORMAL_MIN = 5e-324


@pytest.fixture(scope="module")
def extreme_events_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/events.parquet")
    rows = src.slice(0, 120).to_pylist()
    nxt = max(r["event_id"] for r in rows) + 1

    def e(i, ts, uid, etype, value, props='{"k": 1}'):
        return dict(event_id=i, ts=ts, user_id=uid, event_type=etype,
                    value=value, props=props)

    base = T(2024, 1, 22, 9, 0, 0)
    extremes = [
        ("purchase", float("inf")),
        ("purchase", float("-inf")),
        ("view", DBL_MAX),
        ("view", -DBL_MAX),
        ("click", SUBNORMAL_MIN),
        ("click", 1e-310),
        ("signup", -0.0),
        ("signup", 0.0),
        # finite values whose *100 cents conversion overflows DECIMAL(18,2)
        ("purchase", 1e16),
        ("purchase", -1e16),
    ]
    rows += [
        e(nxt + j, base.replace(minute=5 * j), 200 + (j % 3), etype, v)
        for j, (etype, v) in enumerate(extremes)
    ]
    sf = tmp_path_factory.mktemp("extreme_events_sf")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=src.schema),
        str(sf / "events.parquet"),
    )
    return str(sf)


def test_events_oracles_agree_on_extreme_doubles(spark, extreme_events_sf):
    names = oracle_queries_reading_only({"events"})
    assert len(names) >= 25, f"query discovery collapsed: {names}"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{extreme_events_sf}/events.parquet'"
    )
    try:
        fails = run_parity_gate(spark, con, names, extreme_events_sf)
    finally:
        con.close()
    assert not fails, "extreme-double divergence:\n" + "\n".join(
        f"  {n}: {m}" for n, m in fails
    )


def test_infinity_money_is_null_not_saturated(spark, extreme_events_sf):
    """Semantic pin independent of the oracle: the cents path must emit
    NULL for ±inf, ±DBL_MAX and the 1e16 decimal-overflow rows - never
    a saturated LONG_MAX cents value (Spark's floor/cast saturation is
    the documented hazard this axis exists for)."""
    from pyspark.sql import functions as F

    from pyspark_data_engineering_assignment_spark.sources.tables import load_table

    e = load_table(spark, extreme_events_sf, "events")
    cents = (
        e.filter(F.col("user_id") >= 200)
        .select(
            "value",
            (F.col("value").try_cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .collect()
    )
    by_val = {repr(r["value"]): r["cents"] for r in cents}
    for k in ("inf", "-inf", "1.7976931348623157e+308",
              "-1.7976931348623157e+308", "1e+16", "-1e+16"):
        assert by_val[k] is None, (k, by_val[k])
    assert by_val["5e-324"] == 0
    assert by_val["-0.0"] == 0
    saturated = {9223372036854775807, -9223372036854775808}
    assert not (set(v for v in by_val.values() if v is not None) & saturated)
