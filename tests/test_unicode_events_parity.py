"""Unicode-events oracle parity sweep (round-11; JSON/encoding twin
of test_corrupt_events_parity.py, completing the per-table unicode
gates beside test_unicode_documents_parity.py).

The corrupt-events fixture covers malformed/mis-typed props but stays
ASCII. This corpus probes the seams where two JSON parsers (Spark =
Jackson via get_json_object; DuckDB = yyjson) and two string libraries
could legally disagree:

- \\uXXXX escapes (BMP) and surrogate-PAIR escapes (astral plane) in
  props values - both parsers must decode to identical code points
- literal multi-byte UTF-8 inside props (unescaped CJK/emoji)
- escaped quotes/backslashes/solidus, embedded "\\n" escapes
- DUPLICATE keys in one object (first-wins vs last-wins is parser
  policy, not JSON spec)
- number lexemes: trailing-zero decimals, huge integers beyond int64,
  exponent forms - extracted-as-string must preserve or normalize
  IDENTICALLY
- multi-byte event_type grouping keys (NFC vs NFD must stay distinct
  groups; astral emoji keys must hash/group/sort consistently)

Every events-reading oracle query runs through the strict
rows+schema+value-hash gate; any parser-policy drift reds here
deterministically instead of on real-world JSON.
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
def unicode_events_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/events.parquet")
    rows = src.slice(0, 120).to_pylist()
    nxt = max(r["event_id"] for r in rows) + 1

    def e(i, ts, uid, etype, value, props='{"k": 1}'):
        return dict(event_id=i, ts=ts, user_id=uid, event_type=etype,
                    value=value, props=props)

    base = T(2024, 1, 21, 12, 0, 0)
    cjk = "\u6625\u7720"          # 2 CJK code points
    emoji = "\U0001f680"           # rocket, astral plane
    nfc = "caf\u00e9"
    nfd = "cafe\u0301"
    rows += [
        # BMP \\u escape vs the literal char: both decode to the same
        # string, so n_events-by-type style GROUPs must merge them...
        e(nxt, base, 3, "purchase", 10.0,
          props='{"k": 5, "tag": "\\u6625\\u7720"}'),
        e(nxt + 1, base.replace(hour=13), 3, "purchase", 11.0,
          props='{"k": 6, "tag": "' + cjk + '"}'),
        # astral plane: surrogate-pair escape AND literal emoji
        e(nxt + 2, base.replace(hour=14), 3, "view", 1.0,
          props='{"k": 7, "tag": "\\ud83d\\ude80"}'),
        e(nxt + 3, base.replace(hour=15), 3, "view", 2.0,
          props='{"k": 8, "tag": "' + emoji + '"}'),
        # escaped quote / backslash / solidus / newline escape
        e(nxt + 4, base.replace(hour=16), 4, "view", 3.0,
          props='{"k": 9, "tag": "say \\"hi\\" back"}'),
        e(nxt + 5, base.replace(hour=17), 4, "view", 4.0,
          props='{"k": 10, "tag": "a\\\\b\\/c\\nd"}'),
        # DUPLICATE key: parser policy, not spec
        e(nxt + 6, base.replace(hour=18), 4, "view", 5.0,
          props='{"k": 1, "k": 2}'),
        # number lexemes extracted as strings
        e(nxt + 7, base.replace(hour=19), 5, "view", 6.0,
          props='{"k": 1.50}'),
        e(nxt + 8, base.replace(hour=20), 5, "view", 7.0,
          props='{"k": 1e2}'),
        e(nxt + 9, base.replace(hour=21), 5, "view", 8.0,
          props='{"k": -0}'),
        # unicode KEY in the object (path lookup stays "k"; the
        # sibling key must not confuse either parser)
        e(nxt + 10, base.replace(hour=22), 5, "view", 9.0,
          props='{"' + cjk + '": 1, "k": 3}'),
        # multi-byte event_type GROUP KEYS - NFC and NFD stay distinct
        e(nxt + 11, base.replace(hour=23), 6, nfc, 10.0),
        e(nxt + 12, base.replace(hour=23, minute=10), 6, nfd, 11.0),
        e(nxt + 13, base.replace(hour=23, minute=20), 6, emoji, 12.0),
        e(nxt + 14, base.replace(hour=23, minute=30), 6, cjk, 13.0),
        e(nxt + 15, base.replace(hour=23, minute=40), 6, cjk, 14.0),
        # DEL (0x7F): Spark's string->long cast trims chars <= 0x20 AND
        # 0x7F (UTF8String.trimAll; verified try_cast('123\x7f')=123 on
        # the installed Spark) - the oracle's trim-mirror class is
        # [\x00-\x20\x7f] (round-12 advice fix). Interior DEL must stay
        # NULL in both engines.
        e(nxt + 16, base.replace(hour=23, minute=50), 7, "view", 15.0,
          props='{"k": "123"}'),
        e(nxt + 17, base.replace(hour=23, minute=55), 7, "view", 16.0,
          props='{"k": "\\t 45"}'),
        e(nxt + 18, base.replace(hour=23, minute=59), 7, "view", 17.0,
          props='{"k": "123"}'),
    ]
    sf = tmp_path_factory.mktemp("unicode_events_sf")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=src.schema),
        str(sf / "events.parquet"),
    )
    return str(sf)


def test_every_events_oracle_agrees_on_unicode_corpus(
    spark, unicode_events_sf
):
    names = oracle_queries_reading_only({"events"})
    assert len(names) >= 25, f"query discovery collapsed: {names}"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{unicode_events_sf}/events.parquet'"
    )
    try:
        fails = run_parity_gate(spark, con, names, unicode_events_sf)
        assert not fails, "unicode-events oracle drift:\n" + "\n".join(
            f"  {n}: {m}" for n, m in fails
        )
    finally:
        con.close()
