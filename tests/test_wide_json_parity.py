"""Wide/deep-JSON props axis (round-12, new): structural pathology in
the semi-structured column - WIDTH (1000 sibling keys), DEPTH (64
nested levels), KEY LENGTH (10k-char key names) and VALUE LENGTH
(100k-char string values).

The corrupt/unicode axes (rounds 9-11) probed malformed and weird
CONTENT; every props object so far had ~1-3 short keys. The hazards
here are parser-structural:

* 1000 siblings with ``k`` LAST: a first-match streaming extractor
  (Jackson get_json_object) must scan past 999 keys; a materializing
  parser (variant, yyjson) must not overflow or reorder - and all
  three must still produce the SAME k.
* 64 nesting levels: recursive-descent parsers have depth limits
  (Jackson's default guard is 1000; DuckDB/yyjson similar) - both
  engines must agree the path extraction works (or fails) identically
  at a depth real telemetry can reach.
* a 10,000-char sibling KEY and a 100,000-char sibling VALUE: token
  buffers, not semantics.

Findings (first run): every events-reading oracle query hash-matches
with these planted - the three parser stacks (Jackson, Spark variant,
DuckDB yyjson) agree on first-match extraction past 999 siblings, on
64-deep nesting (the top-level ``k`` is still found), and on oversized
tokens. Kept as the structural-JSON regression gate.
"""

from __future__ import annotations

import datetime as dt
import json

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
def wide_json_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/events.parquet")
    rows = src.slice(0, 120).to_pylist()
    nxt = max(r["event_id"] for r in rows) + 1

    def e(i, ts, uid, etype, value, props):
        return dict(event_id=i, ts=ts, user_id=uid, event_type=etype,
                    value=value, props=props)

    base = T(2024, 1, 23, 8, 0, 0)
    # width: k is the 1000th key
    wide = {f"pad{j}": j for j in range(999)}
    wide["k"] = 7
    # depth: 64 nested levels under "nest", k at TOP level after it
    deep: dict = {"leaf": 1}
    for _ in range(64):
        deep = {"d": deep}
    # oversized tokens as SIBLINGS of k
    rows += [
        e(nxt + 0, base, 400, "view", 1.0, json.dumps(wide)),
        e(nxt + 1, base.replace(minute=10), 400, "view", 2.0,
          json.dumps({"nest": deep, "k": 8})),
        e(nxt + 2, base.replace(minute=20), 401, "click", 3.0,
          json.dumps({"x" * 10_000: 1, "k": 9})),
        e(nxt + 3, base.replace(minute=30), 401, "click", 4.0,
          json.dumps({"big": "v" * 100_000, "k": 10})),
        # k itself nested (path $.k must NOT find $.nest.k)
        e(nxt + 4, base.replace(minute=40), 402, "view", 5.0,
          json.dumps({"nest": {"k": 99}})),
    ]
    sf = tmp_path_factory.mktemp("wide_json_sf")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=src.schema),
        str(sf / "events.parquet"),
    )
    return str(sf)


def test_events_oracles_agree_on_structural_json(spark, wide_json_sf):
    names = oracle_queries_reading_only({"events"})
    assert len(names) >= 25, f"query discovery collapsed: {names}"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{wide_json_sf}/events.parquet'"
    )
    try:
        fails = run_parity_gate(spark, con, names, wide_json_sf)
    finally:
        con.close()
    assert not fails, "structural-JSON divergence:\n" + "\n".join(
        f"  {n}: {m}" for n, m in fails
    )


def test_extraction_semantics_on_pathological_shapes(spark, wide_json_sf):
    """Direct pins (both-sides-wrong guard): k found past 999 siblings,
    beside 64-deep nesting and oversized tokens; $.k never matches a
    NESTED k."""
    from pyspark.sql import functions as F

    from pyspark_data_engineering_assignment_spark.sources.tables import load_table

    e = load_table(spark, wide_json_sf, "events")
    got = {
        r["event_id"]: r["k"]
        for r in e.filter(F.col("user_id") >= 400)
        .select("event_id", F.get_json_object("props", "$.k").alias("k"))
        .collect()
    }
    ks = sorted(v for v in got.values() if v is not None)
    assert ks == ["10", "7", "8", "9"], got
    assert list(got.values()).count(None) == 1  # the nested-only k row
