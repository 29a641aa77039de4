"""Stream-stream interval join: streaming output equals the batch join
on the same files, and the time bound actually excludes out-of-window
matches."""

from __future__ import annotations

import os
import uuid

import pandas as pd

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pyspark_data_engineering_assignment_spark.streaming.joins import (
    interval_join_streams,
)

CLICK_SCHEMA = StructType(
    [
        StructField("user", StringType()),
        StructField("click_ts", TimestampType()),
        StructField("click_id", LongType()),
    ]
)
BUY_SCHEMA = StructType(
    [
        StructField("user", StringType()),
        StructField("buy_ts", TimestampType()),
        StructField("amount", DoubleType()),
    ]
)

CLICKS = [
    ("u1", "2024-01-01 10:00:00", 1),
    ("u1", "2024-01-01 12:00:00", 2),
    ("u2", "2024-01-01 10:00:00", 3),
]
BUYS = [
    ("u1", "2024-01-01 10:30:00", 5.0),   # within 1h of click 1
    ("u1", "2024-01-01 11:30:00", 7.0),   # >1h after click 1, before click 2
    ("u2", "2024-01-01 10:00:00", 9.0),   # exactly at click ts: excluded (>)
    ("u2", "2024-01-01 11:00:00", 11.0),  # exactly +1h: included (<=)
]
# expected (click_id, amount) attribution pairs
EXPECTED = {(1, 5.0), (3, 11.0)}


def _write(dirpath, pdf):
    os.makedirs(dirpath, exist_ok=True)
    p = os.path.join(dirpath, "part0.csv")
    pdf.to_csv(p, index=False)


def test_interval_join_stream_equals_batch(spark, tmp_path):
    cdir, bdir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    _write(cdir, pd.DataFrame(CLICKS, columns=["user", "click_ts", "click_id"]))
    _write(bdir, pd.DataFrame(BUYS, columns=["user", "buy_ts", "amount"]))

    def run(streaming: bool):
        if streaming:
            clicks = (
                spark.readStream.format("csv").option("header", "true")
                .schema(CLICK_SCHEMA).load(cdir)
            )
            buys = (
                spark.readStream.format("csv").option("header", "true")
                .schema(BUY_SCHEMA).load(bdir)
            )
        else:
            clicks = spark.read.csv(cdir, header=True, schema=CLICK_SCHEMA)
            buys = spark.read.csv(bdir, header=True, schema=BUY_SCHEMA)
        joined = interval_join_streams(
            buys, clicks, ["user"], "buy_ts", "click_ts", max_lag="1 hour"
        ).select("click_id", "amount")
        if not streaming:
            return {(r["click_id"], r["amount"]) for r in joined.collect()}
        sink = f"ssj_{uuid.uuid4().hex[:8]}"
        q = (
            joined.writeStream.format("memory").queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{sink}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r["click_id"], r["amount"]) for r in spark.table(sink).collect()}

    assert run(streaming=False) == EXPECTED
    assert run(streaming=True) == EXPECTED


DIM = [("u1", "gold"), ("u3", "bronze")]


def test_stream_static_enrichment_equals_batch(spark, tmp_path):
    from pyspark_data_engineering_assignment_spark.streaming.joins import (
        enrich_stream_static,
    )

    bdir = str(tmp_path / "buys_ss")
    _write(bdir, pd.DataFrame(BUYS, columns=["user", "buy_ts", "amount"]))
    dim = spark.createDataFrame(DIM, ["user", "tier"])
    expected = {
        ("u1", 5.0, "gold"),
        ("u1", 7.0, "gold"),
        ("u2", 9.0, None),   # left join keeps unmatched stream rows
        ("u2", 11.0, None),
    }

    def run(streaming: bool):
        if streaming:
            buys = (
                spark.readStream.format("csv").option("header", "true")
                .schema(BUY_SCHEMA).load(bdir)
            )
        else:
            buys = spark.read.csv(bdir, header=True, schema=BUY_SCHEMA)
        joined = enrich_stream_static(buys, dim, on=["user"]).select(
            "user", "amount", "tier"
        )
        if not streaming:
            return {(r["user"], r["amount"], r["tier"]) for r in joined.collect()}
        sink = f"sss_{uuid.uuid4().hex[:8]}"
        q = (
            joined.writeStream.format("memory").queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{sink}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["user"], r["amount"], r["tier"]) for r in spark.table(sink).collect()
        }

    assert run(streaming=False) == expected
    assert run(streaming=True) == expected


# leftOuter: buys with no click within the hour must ALSO emit, null-padded,
# once the watermark passes their match window. The flush rows exist solely
# to advance the watermark past every real row's window (a drained stream
# cannot otherwise prove its last rows unmatched).
FLUSH_CLICK = ("zz", "2024-01-02 12:00:00", 999)
FLUSH_BUY = ("zz", "2024-01-02 12:00:00", 999.0)
# buy at 11:30 matches nothing (>1h after click 1, before click 2)
EXPECTED_OUTER = {(1, 5.0), (3, 11.0), (None, 7.0), (None, 9.0)}


def test_interval_left_outer_join_emits_unmatched_after_watermark(
    spark, tmp_path
):
    cdir, bdir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    _write(
        cdir,
        pd.DataFrame(
            [*CLICKS, FLUSH_CLICK], columns=["user", "click_ts", "click_id"]
        ),
    )
    _write(
        bdir,
        pd.DataFrame([*BUYS, FLUSH_BUY], columns=["user", "buy_ts", "amount"]),
    )

    def run(streaming: bool):
        if streaming:
            clicks = (
                spark.readStream.format("csv").option("header", "true")
                .schema(CLICK_SCHEMA).load(cdir)
            )
            buys = (
                spark.readStream.format("csv").option("header", "true")
                .schema(BUY_SCHEMA).load(bdir)
            )
        else:
            clicks = spark.read.csv(cdir, header=True, schema=CLICK_SCHEMA)
            buys = spark.read.csv(bdir, header=True, schema=BUY_SCHEMA)
        joined = interval_join_streams(
            buys,
            clicks,
            ["user"],
            "buy_ts",
            "click_ts",
            max_lag="1 hour",
            watermark_delay="10 minutes",
            how="leftOuter",
        ).select("click_id", "amount")
        if not streaming:
            rows = joined.collect()
        else:
            sink = f"ssoj_{uuid.uuid4().hex[:8]}"
            q = (
                joined.writeStream.format("memory").queryName(sink)
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / f"ckpt_{sink}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            rows = spark.table(sink).collect()
        return {
            (r["click_id"], r["amount"])
            for r in rows
            if r["amount"] != 999.0  # the flush row is harness, not data
        }

    assert run(streaming=False) == EXPECTED_OUTER
    assert run(streaming=True) == EXPECTED_OUTER


def test_interval_right_outer_batch_semantics(spark, tmp_path):
    """rightOuter: clicks with no purchase within the hour emit
    null-padded (batch mode pins the semantics; the streaming path
    shares the watermark mechanics with leftOuter)."""
    cdir, bdir = str(tmp_path / "c2"), str(tmp_path / "b2")
    _write(cdir, pd.DataFrame(CLICKS, columns=["user", "click_ts", "click_id"]))
    _write(bdir, pd.DataFrame(BUYS, columns=["user", "buy_ts", "amount"]))
    clicks = spark.read.csv(cdir, header=True, schema=CLICK_SCHEMA)
    buys = spark.read.csv(bdir, header=True, schema=BUY_SCHEMA)
    joined = interval_join_streams(
        buys, clicks, ["user"], "buy_ts", "click_ts",
        max_lag="1 hour", how="rightOuter",
    ).select("click_id", "amount")
    got = {(r["click_id"], r["amount"]) for r in joined.collect()}
    # click 1 attributed (5.0); click 3 attributed (11.0); click 2 unmatched
    assert got == {(1, 5.0), (3, 11.0), (2, None)}
