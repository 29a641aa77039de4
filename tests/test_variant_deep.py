"""Round-14 hazard axis: Spark 4 VariantType deep-dive.

``events_props_variant`` (plans/registry.py) exercises one happy path:
parse -> extract one string -> try_cast. A 100 TB semi-structured
pipeline that adopts variant as its PERSISTED open format leans on much
more, probed and pinned here:

* parquet round-trip: a variant column written to parquet reads back
  with identical extractions (the shredded/unshredded encoding is an
  implementation detail; the values are the contract);
* three-valued null semantics: SQL NULL (source null / unparseable),
  JSON null (``is_variant_null`` true, extraction yields SQL NULL),
  and MISSING KEY (extraction yields SQL NULL, ``is_variant_null``
  false) - collapsing these is the classic semi-structured bug;
* typed extraction coercion: ``variant_get(v, path, 'long')`` on a
  non-integer is a RANGE/cast error (loud), ``try_variant_get`` nulls
  - and 2.9 TRUNCATES to 2 under try (the round-9 finding, pinned at
  the variant layer this time, plus the int64 boundary surviving
  exactly where a double path would lose precision);
* structural identity: variant equality/grouping is NOT defined
  (analysis error, pinned loud) - dedup/groupBy on semi-structured
  data must key on extracted fields or the canonical string, never the
  variant itself;
* duplicate keys: the variant spec rejects them (parse_json throws /
  try_parse_json nulls) while the string path (get_json_object) keeps
  first-match - the registry's coalesce fallback exists precisely for
  this, re-pinned here at the operator level.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.axis


def _vdf(spark, rows):
    """rows: list[(id, json_string_or_None)] -> df with variant col v."""
    df = spark.createDataFrame(rows, "id long, js string")
    return df.select("id", "js", F.try_parse_json("js").alias("v"))


def test_variant_parquet_roundtrip_preserves_extractions(spark, tmp_path):
    rows = [
        (1, json.dumps({"k": 7, "s": "héllo", "d": 2.5, "arr": [1, 2, 3],
                        "big": 9223372036854775807})),
        (2, json.dumps({"k": None})),
        (3, None),
        (4, json.dumps({"nested": {"deep": {"x": True}}})),
    ]
    df = _vdf(spark, rows)

    def facts(frame):
        return {
            r["id"]: (
                r["k"], r["s"], r["d"], r["a1"], r["big"], r["deep_x"],
            )
            for r in frame.select(
                "id",
                F.try_variant_get("v", "$.k", "long").alias("k"),
                F.try_variant_get("v", "$.s", "string").alias("s"),
                F.try_variant_get("v", "$.d", "double").alias("d"),
                F.try_variant_get("v", "$.arr[1]", "long").alias("a1"),
                F.try_variant_get("v", "$.big", "long").alias("big"),
                F.try_variant_get("v", "$.nested.deep.x", "boolean").alias("deep_x"),
            ).collect()
        }

    before = facts(df)
    out = str(tmp_path / "variant_parquet")
    df.write.mode("overwrite").parquet(out)
    after = facts(spark.read.parquet(out))
    assert after == before
    # the int64 boundary survived the round-trip exactly (a
    # double-typed path would have rounded to ...5808)
    assert after[1][4] == 9223372036854775807
    assert after[4][5] is True


def test_variant_three_valued_null_semantics(spark):
    rows = [
        (1, json.dumps({"k": 1})),        # present
        (2, json.dumps({"k": None})),     # JSON null
        (3, json.dumps({"other": 5})),    # missing key
        (4, None),                        # SQL NULL source
        (5, "{not json"),                 # unparseable -> NULL variant
    ]
    got = {
        r["id"]: (r["k"], r["knull"], r["vnull"])
        for r in _vdf(spark, rows).select(
            "id",
            F.try_variant_get("v", "$.k", "long").alias("k"),
            # is_variant_null on the EXTRACTED $.k: true only for JSON null
            F.is_variant_null(F.try_variant_get("v", "$.k", "variant")).alias("knull"),
            F.col("v").isNull().alias("vnull"),
        ).collect()
    }
    assert got[1] == (1, False, False)
    assert got[2] == (None, True, False)   # JSON null: distinguishable
    assert got[3] == (None, False, False)  # missing: NOT a JSON null
    assert got[4] == (None, False, True)   # source NULL -> NULL variant
    assert got[5] == (None, False, True)   # malformed -> NULL variant


def test_typed_extraction_loud_vs_try_and_truncation(spark):
    rows = [(1, json.dumps({"k": 2.9})), (2, json.dumps({"k": "abc"}))]
    df = _vdf(spark, rows)
    # try_: non-numeric nulls, fractional TRUNCATES (2.9 -> 2) - the
    # same silent coercion the registry avoids by extracting as string
    got = {
        r["id"]: r["k"]
        for r in df.select(
            "id", F.try_variant_get("v", "$.k", "long").alias("k")
        ).collect()
    }
    assert got == {1: 2, 2: None}
    # non-try typed extraction is LOUD on an uncastable value
    with pytest.raises(Exception, match="(?i)variant|cast|invalid"):
        df.select(F.variant_get("v", "$.k", "long")).collect()


def test_variant_has_no_structural_identity(spark):
    """groupBy/distinct/equality on a raw variant column must fail at
    ANALYSIS time (loud), not hash arbitrary binary encodings (two
    encodings of the same JSON could differ) - pin whichever engines'
    contract Spark ships, and with it the rule: key on extractions."""
    df = _vdf(spark, [(1, '{"k":1}'), (2, '{"k":1}')])
    with pytest.raises(Exception, match="(?i)variant|comparable|grouping|data type"):
        df.groupBy("v").count().collect()
    with pytest.raises(Exception, match="(?i)variant|comparable|distinct|data type"):
        df.select("v").distinct().collect()
    # the sanctioned key: a canonical extraction (or to_json(v))
    n = (
        df.select(F.try_variant_get("v", "$.k", "long").alias("k"))
        .distinct()
        .count()
    )
    assert n == 1


def test_duplicate_keys_variant_rejects_string_path_first_match(spark):
    dup = '{"k": 1, "k": 2}'
    df = spark.createDataFrame([(1, dup)], "id long, js string")
    got = df.select(
        F.try_parse_json("js").alias("v"),
        F.get_json_object("js", "$.k").alias("s"),
    ).collect()[0]
    # variant spec: duplicate object keys are invalid -> NULL variant
    assert got["v"] is None
    # string extractor: first match wins
    assert got["s"] == "1"
    # plain parse_json is LOUD on the same input
    with pytest.raises(Exception, match="(?i)variant|duplicate|malformed"):
        df.select(F.parse_json("js")).collect()


def test_schema_of_variant_merges_heterogeneous_rows(spark):
    rows = [
        (1, json.dumps({"k": 1})),
        (2, json.dumps({"k": "s"})),
        (3, json.dumps({"k": 1.5, "extra": True})),
    ]
    df = _vdf(spark, rows)
    merged = df.select(
        F.schema_of_variant_agg("v").alias("s")
    ).collect()[0]["s"]
    # conflicting k types widen to VARIANT; extra appears (merged view)
    assert "OBJECT<" in merged and "extra" in merged
    per_row = {
        r["id"]: r["s"]
        for r in df.select("id", F.schema_of_variant("v").alias("s")).collect()
    }
    assert per_row[1] == "OBJECT<k: BIGINT>"
    assert per_row[2] == "OBJECT<k: STRING>"
