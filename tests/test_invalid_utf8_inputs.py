"""Invalid-UTF8 / binary-junk-in-text axis (round-12 verdict task #5).

Undecodable byte sequences - lone continuation bytes (``\\x80``),
overlong encodings (``\\xc0\\xaf``), truncated multibyte (``\\xe2\\x82``),
stray UTF-16 BOM bytes (``\\xff\\xfe``) - fed through both text inputs.

Findings (first run, recorded COVERAGE-style):

* **Parquet**: Spark SANITIZES - every invalid byte decodes to U+FFFD
  (one replacement char per bad byte: the overlong pair becomes TWO)
  and all text operators run normally on the sanitized value. DuckDB
  REJECTS the scan outright (``Invalid string encoding found in
  Parquet file``), so cross-engine oracle parity is impossible by
  construction on such a corpus - the divergence class is pinned as a
  canary below instead of papered over. The driver's generator only
  emits valid UTF-8, so the oracle gate itself is unaffected.
* **CSV**: Spark replaces invalid bytes with U+FFFD and keeps the ROW
  (encoding damage is value-level, NOT structural - the quarantine
  channel, which captures schema-failing rows, correctly stays out of
  it); DuckDB's reader hard-errors by default and DROPS the whole row
  under ``ignore_errors=true`` - a row-level vs value-level repair
  divergence, also canary-pinned.
* **Streaming e2e**: an invalid-UTF8 chunk is not a poison pill - the
  stream drains, damaged names enter state as replacement-char keys
  with their amounts intact, structurally-broken rows in the same
  chunk still quarantine whole, and totals stay exact.

NUL (``\\x00``) is VALID UTF-8 and passes through both engines
unchanged; it is covered by the round-11 unicode axis, not here.
"""

from __future__ import annotations

import os
import time as _time

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.config import EngineConfig
from pyspark_data_engineering_assignment_spark.patterns.detect import FixedClock
from pyspark_data_engineering_assignment_spark.sources.readers import read_importance
from pyspark_data_engineering_assignment_spark.state.store import (
    CUSTOMER_MERCHANT_SUMMARY,
    MERCHANT_SUMMARY,
    ParquetStateStore,
)
from pyspark_data_engineering_assignment_spark.streaming.pipeline import (
    DetectionPipeline,
)

from tests.test_streaming_e2e import COLUMNS, ROWS, _write_inputs

pytestmark = pytest.mark.axis

CLOCK = FixedClock("2024-01-01 00:00:00")
FFFD = "�"

# the four undecodable shapes, as they appear inside a text field
BAD_BYTES = {
    "lone_continuation": b"\x80",
    "overlong_slash": b"\xc0\xaf",
    "truncated_multibyte": b"\xe2\x82",
    "utf16_bom": b"\xff\xfe",
}
# One U+FFFD per MALFORMED UNIT (Java's CharsetDecoder REPLACE policy):
# a byte that can't START a sequence gets its own FFFD (so \xc0\xaf and
# \xff\xfe each yield TWO), while a valid prefix cut short (\xe2\x82
# before a non-continuation byte) is consumed together as ONE.
EXPECT_FFFD = {
    "lone_continuation": 1,
    "overlong_slash": 2,
    "truncated_multibyte": 1,
    "utf16_bom": 2,
}


def _invalid_utf8_string_array(raw_values: list[bytes]) -> pa.StringArray:
    """Build a parquet-writable STRING column whose bytes are NOT valid
    UTF-8: pyarrow validates on cast but not on from_buffers."""
    offsets, data = [0], b""
    for v in raw_values:
        data += v
        offsets.append(len(data))
    return pa.StringArray.from_buffers(
        len(raw_values),
        pa.py_buffer(b"".join(int.to_bytes(o, 4, "little") for o in offsets)),
        pa.py_buffer(data),
    )


@pytest.fixture(scope="module")
def badutf_docs_dir(tmp_path_factory):
    """documents.parquet where doc 1..4 carry each undecodable shape,
    docs 5 and 6 are IDENTICALLY damaged (dedup pair), doc 0 is clean."""
    texts = [
        b"clean ascii document text",
        b"lone " + BAD_BYTES["lone_continuation"] + b" continuation",
        b"overlong " + BAD_BYTES["overlong_slash"] + b" slash",
        b"truncated " + BAD_BYTES["truncated_multibyte"] + b" tail",
        b"bom " + BAD_BYTES["utf16_bom"] + b" bytes",
        b"same damage " + BAD_BYTES["lone_continuation"] + b" twin",
        b"same damage " + BAD_BYTES["lone_continuation"] + b" twin",
    ]
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": _invalid_utf8_string_array(texts),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array([f"src{i % 2}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("badutf_docs")
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_spark_parquet_sanitizes_to_replacement_chars(spark, badutf_docs_dir):
    rows = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(
            f"{badutf_docs_dir}/documents.parquet"
        ).collect()
    }
    assert rows[0] == "clean ascii document text"
    for i, (shape, nf) in enumerate(EXPECT_FFFD.items(), start=1):
        assert rows[i].count(FFFD) == nf, (shape, rows[i])
        assert BAD_BYTES[shape].decode("utf-8", "replace") in rows[i]


def test_duckdb_rejects_invalid_utf8_parquet_canary(badutf_docs_dir):
    """CANARY: DuckDB refuses the scan - if a DuckDB upgrade starts
    sanitizing instead, cross-engine parity on damaged corpora becomes
    POSSIBLE and the divergence class documented above must be
    re-adjudicated (this test failing is that signal)."""
    con = duckdb.connect()
    try:
        with pytest.raises(duckdb.Error, match="[Ii]nvalid"):
            con.execute(
                f"SELECT length(text) FROM '{badutf_docs_dir}/documents.parquet'"
            ).fetchall()
    finally:
        con.close()


def test_duckdb_csv_drops_rows_spark_replaces_values_canary(spark, tmp_path):
    """CANARY for the CSV repair divergence: DuckDB hard-errors by
    default and row-drops under ignore_errors; Spark value-replaces and
    keeps every row."""
    raw = (
        b"customer,amount\n"
        b"C\x80BAD,10.5\n"
        b"Cok,40.0\n"
    )
    p = tmp_path / "bad.csv"
    p.write_bytes(raw)
    con = duckdb.connect()
    try:
        with pytest.raises(duckdb.Error, match="[Ii]nvalid"):
            con.execute(f"SELECT * FROM read_csv_auto('{p}')").fetchall()
        kept = con.execute(
            f"SELECT customer FROM read_csv_auto('{p}', ignore_errors=true)"
        ).fetchall()
        assert kept == [("Cok",)]  # whole damaged row GONE
    finally:
        con.close()
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    sch = StructType(
        [
            StructField("customer", StringType()),
            StructField("amount", DoubleType()),
        ]
    )
    got = {
        (r["customer"], r["amount"])
        for r in spark.read.schema(sch)
        .option("header", "true")
        .csv(str(p))
        .collect()
    }
    assert got == {(f"C{FFFD}BAD", 10.5), ("Cok", 40.0)}  # row KEPT


def test_text_operators_treat_replacement_char_as_regular(
    spark, badutf_docs_dir
):
    """The Spark-side contract on sanitized text: operators run without
    error and U+FFFD behaves as an ordinary (non-space, non-word)
    character - identically-damaged docs fingerprint identically (the
    dedup pair groups), differently-damaged docs do not collide."""
    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    dedup = QUERIES["dedup_exact"].fn(spark, badutf_docs_dir).collect()
    # exact dedup must find exactly the planted identical pair (docs 5+6)
    multi = [r for r in dedup if r["n_docs"] > 1]
    assert len(multi) == 1 and multi[0]["n_docs"] == 2, dedup
    assert multi[0]["keeper_id"] == 5
    assert len(dedup) == 6  # 7 docs, one merged pair

    for qname in ("doc_quality_features", "doc_bpe_token_stats", "doc_language_id"):
        out = QUERIES[qname].fn(spark, badutf_docs_dir)
        assert out.count() == 7, qname  # one row per doc, no crash


def test_streaming_invalid_utf8_chunk_is_not_poison(spark, tmp_path):
    """E2E: a chunk mixing encoding-damaged rows (flow through with
    U+FFFD names, amounts intact) and one structurally-broken row
    (quarantined whole) drains cleanly with exact totals."""
    input_dir, imp_path, chunks = _write_inputs(tmp_path)
    bad_path = os.path.join(input_dir, "chunk_badutf.csv")
    with open(bad_path, "wb") as f:
        f.write((",".join(COLUMNS) + "\n").encode())
        # merchant name carries a lone continuation byte
        f.write(b"4,C7,3,M,28007,M\x80X,28007,es_a,7.0,0\n")
        # customer name carries a truncated multibyte
        f.write(b"4,C\xe2\x82Q,2,F,28007,M9,28007,es_a,9.5,0\n")
        f.write(b"4,CSHORT\n")  # structural: wrong arity -> quarantine
    mt = _time.time() + 10
    os.utime(bad_path, (mt, mt))

    qdir = str(tmp_path / "quarantine")
    store = ParquetStateStore(spark, str(tmp_path / "state"))
    pipe = DetectionPipeline(
        spark,
        store,
        read_importance(spark, imp_path),
        str(tmp_path / "detections"),
        config=EngineConfig(quarantine_dir=qdir),
        clock=CLOCK,
    )
    pipe.run_stream(input_dir, str(tmp_path / "ckpt")).awaitTermination()

    from collections import Counter

    want = dict(Counter(r[5] for r in ROWS))
    want[f"M{FFFD}X"] = 1
    want["M9"] = want.get("M9", 0) + 1
    got = {
        r["merchant_id"]: r["total_transactions"]
        for r in store.read_state(MERCHANT_SUMMARY).collect()
    }
    assert got == want

    cm = {
        (r["customer_id"], r["merchant_id"]): str(r["total_amount_sum"])
        for r in store.read_state(CUSTOMER_MERCHANT_SUMMARY).collect()
    }
    assert cm[("C7", f"M{FFFD}X")] == "7.00"
    # \xe2\x82 + "Q": the valid 2-byte prefix is consumed as ONE
    # malformed unit -> a single U+FFFD (resync at "Q")
    assert cm[(f"C{FFFD}Q", "M9")] == "9.50"

    import glob

    qlines = []
    for d in glob.glob(os.path.join(qdir, "batch_id=*")):
        qlines.extend(
            r["_corrupt_record"] for r in spark.read.parquet(d).collect()
        )
    assert qlines == ["4,CSHORT"]
