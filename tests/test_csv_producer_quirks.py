"""Round-13 axis: CSV producer quirks - the byte-level junk real
producers emit (Excel exports, Windows toolchains, corrupted exponents)
- pinned through the repo's readers so a Spark upgrade changing any of
these semantics is noticed.

First run found no engine divergence (rare for an axis; recorded in
COVERAGE.md): BOM and CRLF are stripped/handled identically, NUL bytes
ride through as data, and the one silent hazard (numeric-literal
overflow -> inf) is SHARED by both engines and then caught by the
round-13 money guard.
"""

from __future__ import annotations

import codecs

import duckdb
import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from pyspark_data_engineering_assignment_spark.sources.readers import (

    read_csv,
    read_csv_audited,
)

pytestmark = pytest.mark.axis

SCHEMA = StructType(
    [StructField("id", IntegerType(), True), StructField("v", DoubleType(), True)]
)


def test_utf8_bom_on_header_is_transparent(spark, tmp_path):
    """Excel/Windows producers prefix UTF-8 CSVs with a BOM. The parser
    strips it - the first header column must still resolve (a naive
    reader sees '\\ufeffid' and breaks name-based matching)."""
    p = tmp_path / "bom.csv"
    p.write_bytes(codecs.BOM_UTF8 + b"id,v\n1,1.5\n2,2.5\n")
    got = {r["id"]: r["v"] for r in read_csv(spark, str(p), SCHEMA).collect()}
    assert got == {1: 1.5, 2: 2.5}
    audited = read_csv_audited(spark, str(p), SCHEMA).collect()
    assert all(r["_corrupt_record"] is None for r in audited)


def test_crlf_line_endings_are_transparent(spark, tmp_path):
    p = tmp_path / "crlf.csv"
    p.write_bytes(b"id,v\r\n1,1.5\r\n2,2.5\r\n")
    got = {r["id"]: r["v"] for r in read_csv(spark, str(p), SCHEMA).collect()}
    assert got == {1: 1.5, 2: 2.5}


def test_duplicate_header_is_positional_documented(spark, tmp_path):
    """The static reader keeps Spark's default enforceSchema=true:
    header NAMES are ignored and binding is positional, so a duplicate
    header column is silently tolerated. Pinned as the documented
    static-scan contract - the STREAMING reader sets
    enforceSchema=false (round-11 schema-drift axis) and is the layer
    that fails loudly on producer header damage."""
    p = tmp_path / "dup.csv"
    p.write_text("id,id\n1,2\n")
    rows = read_csv(spark, str(p), SCHEMA).collect()
    assert [(r["id"], r["v"]) for r in rows] == [(1, 2.0)]


def test_nul_byte_rides_through_as_data(spark, tmp_path):
    """A NUL byte inside a field is DATA to the parser (no truncation,
    no corrupt record) - it only disappears at a typed-cast boundary,
    where the round-12 cast-trim mirror class [\\x00-\\x20\\x7f]
    handles it identically in both engines."""
    p = tmp_path / "nul.csv"
    p.write_bytes(b"id,v\n1,1.5\nx\x00y,2.5\n")
    s = StructType(
        [StructField("id", StringType(), True), StructField("v", DoubleType(), True)]
    )
    rows = {r["id"]: r["v"] for r in read_csv_audited(spark, str(p), s).collect()}
    assert rows == {"1": 1.5, "x\x00y": 2.5}


def test_numeric_literal_overflow_is_silent_inf_in_both_engines(
    spark, tmp_path
):
    """The one silent hazard this axis found: a numeric literal beyond
    double range (e.g. a corrupted exponent writing 3M digits, here 400)
    parses to +Infinity with NO corrupt record - it 'parses', so the
    quarantine channel cannot catch it. BOTH engines agree (DuckDB's
    strict CAST also returns inf), so oracle parity is safe; the pin
    exists because the behavior is surprising and a Spark/DuckDB
    upgrade tightening either side must be noticed."""
    big = "9" * 400
    p = tmp_path / "big.csv"
    p.write_text(f"id,v\n1,1.5\n2,{big}\n")
    rows = {
        r["id"]: (r["v"], r["_corrupt_record"])
        for r in read_csv_audited(spark, str(p), SCHEMA).collect()
    }
    assert rows[2][0] == float("inf") and rows[2][1] is None
    assert duckdb.sql(f"SELECT CAST('{big}' AS DOUBLE)").fetchone()[0] == float(
        "inf"
    )


def test_inf_amount_is_refused_by_the_money_guard(spark):
    """...and the reason silent-inf cannot reach state: an inf amount
    is finite-overflow to the money seam (isnan(inf) is false,
    abs(inf) >= 10^16), so guards.money_dec refuses the row loudly
    instead of try_cast silently nulling it - closing the
    CSV-overflow -> money path end to end."""
    from pyspark_data_engineering_assignment_spark.operators.aggregates import (
        customer_merchant_batch_aggregate,
    )
    from pyspark_data_engineering_assignment_spark.schemas import (
        TRANSACTION_SCHEMA,
    )

    tx = spark.createDataFrame(
        [(0, "C1", "3", "M", "28007", "M1", "28007", "es_a", float("inf"), 0)],
        TRANSACTION_SCHEMA,
    )
    with pytest.raises(Exception, match="money overflow: amount"):
        customer_merchant_batch_aggregate(tx).collect()
