"""IO helper tests: explicit-schema JSONL round-trip, partitioned writer
layout (hive partitions, bounded file sizes, partition pruning)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from pyspark_data_engineering_assignment_spark.sources.readers import read_jsonl
from pyspark_data_engineering_assignment_spark.sources.writers import (
    write_partitioned_parquet,
)

JSONL_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def test_read_jsonl_explicit_schema(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 1, "text": "hello", "lang": "en"}\n'
        '{"id": 2, "text": "hola", "lang": "es", "extra": "ignored"}\n'
        '{"id": 3, "lang": "fr"}\n'   # missing field -> null, not failure
    )
    rows = {r["id"]: (r["text"], r["lang"]) for r in read_jsonl(spark, str(p), JSONL_SCHEMA).collect()}
    assert rows == {1: ("hello", "en"), 2: ("hola", "es"), 3: (None, "fr")}


def test_write_partitioned_layout_and_pruning(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("bucket4"),
    )
    out = str(tmp_path / "out")
    write_partitioned_parquet(
        df, out, partition_cols=["bucket4"], max_records_per_file=100
    )
    # hive layout with one dir per partition value
    pdirs = sorted(os.path.basename(d) for d in glob.glob(os.path.join(out, "bucket4=*")))
    assert pdirs == ["bucket4=0", "bucket4=1", "bucket4=2", "bucket4=3"]
    # bounded file sizes: 250 rows per partition / 100 -> >= 3 files each
    for d in glob.glob(os.path.join(out, "bucket4=*")):
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) >= 3
        for f in files:
            n = spark.read.parquet(f).count()
            assert n <= 100

    # partition pruning reaches the scan
    back = spark.read.parquet(out).filter(F.col("bucket4") == "2")
    assert back.count() == 250
    import contextlib, io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain()
    assert "PartitionFilters" in buf.getvalue()


def test_loader_normalizes_all_timestamp_encodings(spark, tmp_path):
    """The driver has regenerated testdata with different parquet
    timestamp encodings across rounds (NANOS in r1-4, naive MICROS in
    r5). load_table must normalize every known timestamp column to
    TIMESTAMP (LTZ, UTC session) under all three encodings."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.types import TimestampType

    from pyspark_data_engineering_assignment_spark.sources.tables import load_table

    ts = dt.datetime(2024, 1, 1, 12, 30, 45, 123456)
    for label, patype in [
        ("nanos_naive", pa.timestamp("ns")),
        ("micros_naive", pa.timestamp("us")),
        ("micros_utc", pa.timestamp("us", tz="UTC")),
    ]:
        d = tmp_path / f"enc_{label}"
        d.mkdir()
        pq.write_table(
            pa.table({"event_id": [1], "ts": pa.array([ts], type=patype)}),
            str(d / "events.parquet"),
        )
        df = load_table(spark, str(d), "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType), label
        got = df.collect()[0].ts
        assert got == ts, (label, got, ts)


def test_orc_roundtrip_pruning_and_pushdown(spark, tmp_path):
    """ORC write/read roundtrip: values survive bit-exactly, partition
    pruning hits the directory layout, and predicate pushdown reaches
    the ORC scan."""
    from pyspark_data_engineering_assignment_spark.sources.readers import read_orc
    from pyspark_data_engineering_assignment_spark.sources.writers import (
        write_partitioned_orc,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "orders_orc")
    write_partitioned_orc(
        src, path, partition_cols=["o_orderstatus"],
        bloom_filter_cols=["o_custkey"],
    )

    back = read_orc(spark, path)
    assert back.count() == src.count()
    # roundtrip is value-exact (partition column becomes a directory key)
    a = {r["o_orderkey"]: r["o_totalprice"] for r in src.collect()}
    b = {r["o_orderkey"]: r["o_totalprice"] for r in back.collect()}
    assert a == b

    # partition pruning: only the matching o_orderstatus directory scans
    pruned = back.filter(F.col("o_orderstatus") == "F")
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    # predicate pushdown reaches the ORC scan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("o_totalprice") > 100000.0).explain(mode="formatted")
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in buf.getvalue()

    # column pruning through the reader's projection
    two = read_orc(spark, path, columns=["o_orderkey", "o_totalprice"])
    assert two.columns == ["o_orderkey", "o_totalprice"]


def test_read_csv_audited_quarantines_malformed_rows(spark, tmp_path):
    """Malformed rows (untypable values) land whole in the corrupt
    column; clean rows parse with it null - nothing is dropped, nothing
    kills the job, and the caller splits quarantine from clean."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from pyspark_data_engineering_assignment_spark.sources.readers import (
        read_csv_audited,
    )

    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,amount\n"
        "1,alice,10\n"
        "2,bob,not_a_number\n"   # untypable -> quarantined
        "3,carol,30\n"
    )
    schema = StructType(
        [
            StructField("id", LongType(), True),
            StructField("name", StringType(), True),
            StructField("amount", LongType(), True),
        ]
    )
    df = read_csv_audited(spark, str(p), schema).cache()
    try:
        clean = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert sorted(
            (r["id"], r["amount"]) for r in clean.collect()
        ) == [(1, 10), (3, 30)]
        [q] = bad.collect()
        assert q["_corrupt_record"] == "2,bob,not_a_number"
    finally:
        df.unpersist()
