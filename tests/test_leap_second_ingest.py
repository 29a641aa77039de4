"""Round-13 hazard axis: leap-second ``:60`` timestamp strings in CSV
ingest.

Real UTC feeds emit ``23:59:60`` during a positive leap second (they
exist: 2016-12-31, 2015-06-30, ...). Neither engine's proleptic
time model admits second 60 - Spark's java.time parse rejects it,
DuckDB's CAST raises 'timestamp field value out of range' - so the
engine-level contract is the corrupt-row policy, pinned here:

* ``read_csv_audited``: the leap-second row lands WHOLE in
  ``_corrupt_record`` (quarantine channel), its typed ts NULL; the
  rows around it parse normally. Never a crash, never a silent
  half-parsed row.
* plain ``read_csv`` (PERMISSIVE, no corrupt col): the field nulls
  silently - the documented reason quarantine-grade feeds must use
  the audited reader.
* streaming: the same file through ``read_csv_stream(corrupt_col=...)``
  quarantines identically (batch==stream reader parity).
* oracle agreement: DuckDB TRY_CAST('... 23:59:60') is NULL, so a
  null-routed pipeline computes identical aggregates in both engines.

A smeared feed (Google/AWS-style, which never emits :60) needs none of
this; a feed that does emit :60 loses exactly the leap-second row into
the quarantine channel, where a downstream smoother can rewrite it to
``:59.999999`` and re-submit - a policy call the engine must not make
silently.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

from pyspark_data_engineering_assignment_spark.sources.readers import (

    read_csv,
    read_csv_audited,
    read_csv_stream,
)

pytestmark = pytest.mark.axis

SCHEMA = StructType(
    [
        StructField("id", IntegerType(), True),
        StructField("ts", TimestampType(), True),
        StructField("v", DoubleType(), True),
    ]
)

CSV = (
    "id,ts,v\n"
    "1,2016-12-31 23:59:59,1.0\n"
    "2,2016-12-31 23:59:60,2.0\n"  # positive leap second
    "3,2016-12-31 23:59:60.500000,2.5\n"  # fractional variant
    "4,2017-01-01 00:00:00,3.0\n"
)


@pytest.fixture
def csv_path(tmp_path):
    p = tmp_path / "leap.csv"
    p.write_text(CSV)
    return str(p)


def test_audited_reader_quarantines_leap_second_rows(spark, csv_path):
    rows = {r["id"]: r for r in read_csv_audited(spark, csv_path, SCHEMA).collect()}
    assert rows[1]["_corrupt_record"] is None
    assert rows[4]["_corrupt_record"] is None
    for leap_id, raw in ((2, "2,2016-12-31 23:59:60,2.0"),
                         (3, "3,2016-12-31 23:59:60.500000,2.5")):
        assert rows[leap_id]["ts"] is None
        # the WHOLE raw line is captured - a smoother can rewrite+resubmit
        assert rows[leap_id]["_corrupt_record"] == raw
    # surrounding rows parse exactly
    assert rows[1]["ts"].second == 59 and rows[4]["ts"].second == 0


def test_plain_reader_nulls_silently_documented(spark, csv_path):
    got = read_csv(spark, csv_path, SCHEMA).orderBy("id").collect()
    assert [r["ts"] is None for r in got] == [False, True, True, False]
    assert [r["v"] for r in got] == [1.0, 2.0, 2.5, 3.0]  # other fields keep parsing


def test_streaming_reader_quarantines_identically(spark, tmp_path, csv_path):
    indir = tmp_path / "incoming"
    indir.mkdir()
    os.link(csv_path, indir / "chunk0.csv")
    stream = read_csv_stream(
        spark,
        str(indir),
        SCHEMA,
        max_files_per_trigger=None,
        corrupt_col="_corrupt_record",
    )
    out = str(tmp_path / "out")
    (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {r["id"]: r for r in spark.read.parquet(out).collect()}
    assert got[2]["ts"] is None
    assert got[2]["_corrupt_record"] == "2,2016-12-31 23:59:60,2.0"
    assert got[1]["_corrupt_record"] is None and got[1]["ts"] is not None


def test_column_pruning_resurrects_corrupt_rows_lazily(spark, csv_path):
    """The sharp edge the reader docstring names: corruption is only
    detected for columns the parser parses, and Catalyst prunes
    unreferenced columns INTO the parser - so a lazy clean-stream
    aggregate that never touches ``ts`` re-admits the leap-second rows
    (their corrupting column is never parsed). Pinned so a Spark
    upgrade changing this behavior is noticed; the sanctioned recipe
    (persist first) is the next test.

    (Referencing ONLY the corrupt column is refused outright with
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN - also
    pinned; the dangerous shape is corrupt + SOME columns but not the
    malformed one, which Spark happily runs.)"""
    audited = read_csv_audited(spark, csv_path, SCHEMA)
    lazy_clean = (
        audited.filter(F.col("_corrupt_record").isNull())
        .agg(F.count("v").alias("n"))  # references v, never ts
        .collect()[0]
    )
    assert lazy_clean["n"] == 4  # all rows "clean": ts was pruned, never parsed
    with pytest.raises(Exception, match="QUERY_ONLY_CORRUPT_RECORD_COLUMN"):
        audited.filter(F.col("_corrupt_record").isNull()).agg(
            F.count("*")
        ).collect()


def test_engines_agree_after_null_routing(spark, csv_path):
    """The clean-stream aggregate (count + sum over rows whose ts
    parsed) is identical in Spark and DuckDB once both route the
    leap-second row to NULL - the oracle-parity framing for any
    registry query over a string-typed timestamp feed. Uses the
    sanctioned persist-first split (see reader docstring / pipeline
    quarantine block) so pruning cannot resurrect corrupt rows."""
    parsed = read_csv_audited(spark, csv_path, SCHEMA).persist()
    try:
        clean = (
            parsed.filter(F.col("_corrupt_record").isNull())
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("v").try_cast("decimal(18,2)"))
                .cast("decimal(18,2)")
                .alias("sv"),
            )
            .collect()[0]
        )
    finally:
        parsed.unpersist()
    ora = duckdb.sql(
        f"""
        SELECT count(*) AS n, CAST(sum(CAST(v AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sv
        FROM (
          SELECT TRY_CAST(ts AS TIMESTAMP) AS tts, v
          FROM read_csv('{csv_path}', columns={{'id':'INT','ts':'VARCHAR','v':'DOUBLE'}}, header=true)
        ) WHERE tts IS NOT NULL
        """
    ).fetchone()
    assert (clean["n"], clean["sv"]) == ora
    # and DuckDB's strict CAST refuses :60 loudly, same as Spark ANSI
    with pytest.raises(Exception, match="out of range"):
        duckdb.sql("SELECT CAST('2016-12-31 23:59:60' AS TIMESTAMP)").fetchall()
