"""Round-14 hazard axis: zstd parquet codec round-trip.

Why this axis: the engine's durability story (state snapshots, fact
scans, the round-13 page-CRC work) was built and pinned entirely on the
default snappy codec. A 100 TB deployment will flip
``spark.sql.parquet.compression.codec=zstd`` for the ~30% storage win -
and every round so far has found that "obviously codec-neutral" layers
aren't (round 13: valid-stream bit-rot was only caught because snappy's
framing happened NOT to mask it). Pinned here:

* value-exact round-trip: a fact table written zstd reads back
  IDENTICAL (same rows, same aggregate), in Spark AND in DuckDB (the
  oracle engine must be able to read what the engine writes, or every
  oracle-parity gate silently goes blind on a zstd deployment);
* state-store neutrality: ``ParquetStateStore`` merge/read under a
  session-level zstd codec produces byte-identical totals, and a
  MIXED-codec table (snappy snapshots + zstd snapshots, the migration
  reality) reads correctly - codec is per-file metadata, not a table
  property;
* corruption stays LOUD under zstd: a flipped byte inside a zstd page
  raises on read with page-CRC verification on (the round-13 contract
  must survive the codec swap - zstd's own frame format detects most
  corruption, but the pin is on the STORE's read path, whatever layer
  fires first).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pyspark_data_engineering_assignment_spark.state.store import (

    ParquetStateStore,
    StateTableSpec,
)

pytestmark = pytest.mark.axis

SF = "/root/testdata/sf0.001"

AGG_SCHEMA = StructType(
    [
        StructField("merchant_id", StringType(), False),
        StructField("total_transactions", LongType(), True),
    ]
)
SPEC = StateTableSpec(
    "zstd_axis",
    ("merchant_id",),
    ("total_transactions",),
    StructType(
        [
            StructField("merchant_id", StringType(), False),
            StructField("total_transactions", LongType(), True),
            StructField("last_updated", TimestampType(), True),
        ]
    ),
)


@pytest.fixture
def zstd_codec(spark):
    """Session-level zstd, restored afterwards (other tests assume the
    default)."""
    key = "spark.sql.parquet.compression.codec"
    old = spark.conf.get(key, "snappy")
    spark.conf.set(key, "zstd")
    yield
    spark.conf.set(key, old)


def _codecs_of(path_glob: str) -> set[str]:
    import pyarrow.parquet as pq

    codecs = set()
    for p in glob.glob(path_glob):
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            codecs.add(md.row_group(rg).column(0).compression.lower())
    return codecs


def test_fact_roundtrip_zstd_spark_and_duckdb(spark, tmp_path, zstd_codec):
    src = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = str(tmp_path / "lineitem_zstd")
    src.write.mode("overwrite").parquet(out)
    assert _codecs_of(f"{out}/*.parquet") == {"zstd"}  # really zstd

    back = spark.read.parquet(out)
    # full-content equality, both directions
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0

    # the oracle engine reads the engine's zstd output identically
    import duckdb

    con = duckdb.connect()
    want = src.selectExpr(
        "count(*) c",
        "sum(cast(try_cast(l_quantity as decimal(18,2)) * 100 as bigint)) q",
    ).collect()[0]
    got = con.execute(
        "SELECT count(*), SUM(CAST(TRY_CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) "
        f"FROM read_parquet('{out}/*.parquet')"
    ).fetchone()
    assert (got[0], got[1]) == (want["c"], want["q"])


def test_state_store_totals_identical_under_zstd_and_mixed_codecs(
    spark, tmp_path
):
    """Two stores fed the same batches - one default codec throughout,
    one that flips snappy -> zstd between batches (the migration path:
    old snapshots stay snappy, new versions land zstd) - read back
    identical totals; the mixed store really holds both codecs."""
    key = "spark.sql.parquet.compression.codec"
    old = spark.conf.get(key, "snappy")
    batches = [
        [("M0", 5), ("M1", 7)],
        [("M0", 11), ("M2", 1)],
    ]
    try:
        spark.conf.set(key, "snappy")
        plain = ParquetStateStore(spark, str(tmp_path / "plain"), n_buckets=2)
        mixed = ParquetStateStore(spark, str(tmp_path / "mixed"), n_buckets=2)
        for bid, rows in enumerate(batches):
            df = spark.createDataFrame(rows, AGG_SCHEMA)
            plain.merge_batch(SPEC, df, batch_id=bid, now="2024-01-01 00:00:00")
            if bid == 1:
                spark.conf.set(key, "zstd")  # migrate codec mid-history
            mixed.merge_batch(SPEC, df, batch_id=bid, now="2024-01-01 00:00:00")
    finally:
        spark.conf.set(key, old)

    def totals(store):
        return {
            r["merchant_id"]: r["total_transactions"]
            for r in store.read_state(SPEC).collect()
        }

    assert totals(plain) == totals(mixed) == {"M0": 16, "M1": 7, "M2": 1}
    # the mixed store genuinely contains both codecs (merge rewrites
    # touched buckets under the live codec, untouched keep snappy)
    assert "zstd" in _codecs_of(str(tmp_path / "mixed/zstd_axis/v=*/_bucket=*/*.parquet"))


def test_zstd_page_corruption_fails_loudly(spark, tmp_path, zstd_codec):
    """Round-13 contract under the new codec: flip one byte inside the
    data region of a zstd state file, delete the Hadoop .crc sidecars
    (they mask parquet-level probes on file://), and the store read
    RAISES - never returns wrong totals silently."""
    store = ParquetStateStore(spark, str(tmp_path), n_buckets=1)
    store.merge_batch(
        SPEC,
        spark.createDataFrame([(f"M{i}", i) for i in range(500)], AGG_SCHEMA),
        batch_id=0,
        now="2024-01-01 00:00:00",
    )
    [f] = glob.glob(str(tmp_path / "zstd_axis/v=*/_bucket=*/*.parquet"))
    assert _codecs_of(f) == {"zstd"}
    for crc in glob.glob(os.path.join(os.path.dirname(f), ".*.crc")):
        os.remove(crc)
    size = os.path.getsize(f)
    with open(f, "r+b") as fh:  # middle of the file = inside page data
        fh.seek(size // 2)
        b = fh.read(1)
        fh.seek(size // 2)
        fh.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(Exception):
        store.read_state(SPEC).collect()
