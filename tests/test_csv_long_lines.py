"""Round-14 hazard axis: very long CSV lines vs ``maxCharsPerColumn``.

A 100 TB text ingest WILL contain a multi-megabyte field (an unescaped
document body, a base64 payload, a log line glued by a broken
producer). Probed behaviors, all pinned here:

* Spark 4's default ``maxCharsPerColumn`` is UNLIMITED (-1): a 5 MB
  field round-trips byte-exactly through the engine's audited reader -
  no silent truncation anywhere (univocity's historical 4096-char
  default is gone).
* An EXPLICIT cap is NOT a quarantine: breaching it throws
  ``TextParsingException`` and kills the whole query even under
  PERMISSIVE + columnNameOfCorruptRecord - the cap is a parser-buffer
  bound (pre-schema), not row damage, so it never lands in the corrupt
  column. Anyone using the cap as a malformed-row filter loses the
  batch, not the row.
* The round-13 column-pruning RESURRECTION edge extends to the cap:
  when the long column is PRUNED out of the projection, the breach is
  not even detected - ``sum(id)`` succeeds over a file whose blob
  column violates the cap. Cap enforcement is per-PARSED-column, so a
  capped reader gives NO ingest-wide guarantee; the persist-first
  recipe (parse all columns, then split) is the sanctioned one.
* Oracle-engine quirk: DuckDB's ``read_csv`` has a 2 MiB default
  ``max_line_size`` and REFUSES the same file Spark reads fine -
  cross-engine CSV parity on long-line corpora requires raising it
  explicitly. Pinned so an oracle harness author doesn't misread the
  refusal as an engine divergence.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pyspark_data_engineering_assignment_spark.sources.readers import (

    read_csv_audited,
)

pytestmark = pytest.mark.axis

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("blob", StringType(), True),
    ]
)

BIG = "ab" * (2_560_000)  # 5,120,000 chars > DuckDB's 2 MiB line default


@pytest.fixture
def long_csv(tmp_path):
    p = str(tmp_path / "long.csv")
    with open(p, "w") as f:
        f.write("id,blob\n")
        f.write(f"1,{BIG}\n")
        f.write("2,small\n")
    return p


def test_default_reader_roundtrips_multimegabyte_field(spark, long_csv):
    df = read_csv_audited(spark, long_csv, SCHEMA)
    got = {
        r["id"]: (r["n"], r["head"], r["tail"], r["bad"])
        for r in df.select(
            "id",
            F.length("blob").alias("n"),
            F.substring("blob", 1, 4).alias("head"),
            F.substring("blob", -4, 4).alias("tail"),
            F.col("_corrupt_record").isNotNull().alias("bad"),
        ).collect()
    }
    # byte-exact: full length, both ends intact, nothing quarantined
    assert got[1] == (len(BIG), "abab", "abab", False)
    assert got[2] == (5, "smal", "mall", False)


def test_explicit_cap_breach_kills_query_even_permissive(spark, long_csv):
    """The cap is not quarantinable row damage: PERMISSIVE + corrupt
    column does NOT capture it - the query dies. Pinned so nobody
    'hardens' the reader by adding a cap and thereby converts one bad
    row into a lost batch."""
    capped = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("maxCharsPerColumn", "1000")
        .schema(
            StructType(
                [*SCHEMA.fields, StructField("_corrupt_record", StringType(), True)]
            )
        )
        .csv(long_csv)
    )
    with pytest.raises(Exception, match="(?i)FAILED_READ_FILE|TextParsing|exceeds"):
        capped.select("id", "blob", "_corrupt_record").collect()


def test_cap_breach_undetected_when_column_pruned(spark, long_csv):
    """Resurrection sharp edge, cap edition: prune the blob column and
    the SAME capped reader happily aggregates - the breach is enforced
    only for parsed columns, so a cap provides no file-level guarantee.
    The persist-first recipe detects it deterministically."""
    capped = (
        spark.read.option("header", "true")
        .option("maxCharsPerColumn", "1000")
        .schema(SCHEMA)
        .csv(long_csv)
    )
    # pruned projection: breach invisible, aggregate "succeeds"
    assert capped.select(F.sum("id")).collect()[0][0] == 3
    # sanctioned recipe: materialize EVERY column first -> loud
    with pytest.raises(Exception, match="(?i)FAILED_READ_FILE|TextParsing|exceeds"):
        capped.persist().count()
    capped.unpersist()


def test_duckdb_oracle_needs_max_line_size_raised(long_csv):
    """The oracle engine refuses the file Spark reads: DuckDB's CSV
    reader bounds the LINE at 2 MiB by default. Raising max_line_size
    restores parity (same length, same ends) - the harness convention
    for any long-line corpus."""
    import duckdb

    con = duckdb.connect()
    with pytest.raises(Exception, match="(?i)line|maximum|size"):
        con.execute(
            f"SELECT count(*) FROM read_csv('{long_csv}', header=true, "
            "columns={'id': 'BIGINT', 'blob': 'VARCHAR'})"
        ).fetchone()
    got = con.execute(
        f"SELECT id, length(blob), substr(blob, 1, 4), substr(blob, -4) "
        f"FROM read_csv('{long_csv}', header=true, max_line_size=16000000, "
        "columns={'id': 'BIGINT', 'blob': 'VARCHAR'}) ORDER BY id"
    ).fetchall()
    assert got == [(1, len(BIG), "abab", "abab"), (2, 5, "smal", "mall")]
