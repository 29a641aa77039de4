"""Round-13 axis: producer clock skew vs event-time watermarks.

The watermark is global: ``max(event time seen) - delay`` over every
input row. Late data hurts only itself; FUTURE data poisons everyone
else - one producer whose clock is a year ahead advances the watermark
past all genuine traffic and every subsequent legitimate event is
dropped as "late" with zero errors. Pinned here: the blackhole (one
skewed row silences the stream), the guard
(``split_future_event_time`` before ``withWatermark``), and the guarded
stream surviving the same poisoned feed.
"""

from __future__ import annotations

import datetime as dt
import os
import uuid

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pyspark_data_engineering_assignment_spark.streaming.windows import (

    split_future_event_time,
    windowed_event_aggregate,
)

import pytest  # noqa: E402

pytestmark = pytest.mark.axis

EVENT_SCHEMA = StructType(
    [
        StructField("ts", TimestampType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def _feed(src: str, files: list[list[tuple[str, str]]]) -> None:
    os.makedirs(src)
    for i, rows in enumerate(files):
        pdf = pd.DataFrame(
            {
                "ts": [r[0] for r in rows],
                "event_type": ["x"] * len(rows),
                "value": [r[1] for r in rows],
            }
        )
        p = os.path.join(src, f"part{i}.csv")
        pdf.to_csv(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))


# batch 0 carries one year-ahead row; batches 1 and 2 are entirely
# legitimate traffic arriving minutes later. Spark evicts window state
# one batch AFTER the watermark passes it (the documented eviction lag,
# see test_streaming_windows), so batch 1 still lands in live state -
# the blackhole swallows everything from batch 2 on.
POISONED = [
    [("2024-01-01 10:00:00", "1.0"), ("2099-01-01 00:00:00", "2.0")],
    [("2024-01-01 10:05:00", "4.0"), ("2024-01-01 10:10:00", "8.0")],
    [("2024-01-01 10:20:00", "16.0"), ("2024-01-01 10:25:00", "32.0")],
]


def _drain(agg, tmp_path, mode: str):
    sink = f"skew_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{sink}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    return sink, dropped


def test_one_future_row_blackholes_legitimate_traffic(spark, tmp_path):
    """The pinned hazard, unguarded: after batch 0 the watermark is
    ~2098-12-31 23:30 (driven by the skewed row). Batch 1 still lands
    in live window state (the one-batch eviction lag), but the window
    is then emitted+evicted, and from batch 2 on every
    perfectly-current event lands in a long-closed window and is
    DROPPED - the stream silently loses all genuine traffic.

    Round 14: the guard is now DEFAULT-ON in the constructor, so this
    hazard pin must opt out explicitly - which doubles as the pin that
    ``future_tolerance=None`` really disables it."""
    src = str(tmp_path / "in")
    _feed(src, POISONED)
    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    agg = windowed_event_aggregate(
        stream, "1 hour", watermark_delay="30 minutes", future_tolerance=None
    )
    sink, dropped = _drain(agg, tmp_path, "append")
    # the drop counter sees POST-partial-aggregation rows: batch 2's two
    # events collapse into one (window, event_type) partial row before
    # the stateful operator, so >= 1 is the loud-metric pin; the real
    # assertion is the output below (the events are GONE)
    assert dropped >= 1
    got = {(r["hour"], r["n_events"], r["total_value_cents"]) for r in spark.table(sink).collect()}
    # the 10:00 window was emitted during batch 1 (eviction lag) with
    # only 3 of the 5 legitimate events; batch 2's rows vanished
    assert ("2024-01-01 10:00:00", 3, 1300) in got
    assert not any(n == 5 for (_, n, _) in got)


def test_split_future_event_time_boundaries(spark):
    now = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (dt.datetime(2024, 1, 1, 11, 0), "past", 1.0),
        (dt.datetime(2024, 1, 1, 12, 5), "small_skew", 1.0),  # inside 10 min
        (dt.datetime(2024, 1, 1, 12, 30), "future", 1.0),
        (dt.datetime(2025, 1, 1), "far_future", 1.0),
        (None, "null_ts", 1.0),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    clean, skewed = split_future_event_time(
        df, tolerance="10 minutes", now_col=F.lit(now)
    )
    assert {r["event_type"] for r in clean.collect()} == {
        "past",
        "small_skew",
        "null_ts",  # NULL routes clean: cannot advance a watermark
    }
    assert {r["event_type"] for r in skewed.collect()} == {
        "future",
        "far_future",
    }


def test_guarded_stream_survives_future_producer(spark, tmp_path):
    """Same poisoned feed, guard applied BEFORE the watermark: the
    skewed row never reaches the watermark computation, nothing is
    dropped, and every legitimate event is counted."""
    src = str(tmp_path / "in")
    _feed(src, POISONED)
    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    clean, _ = split_future_event_time(stream, tolerance="10 minutes")
    agg = windowed_event_aggregate(clean, "1 hour", watermark_delay="30 minutes")
    sink, dropped = _drain(agg, tmp_path, "complete")
    assert dropped == 0
    got = {
        (r["hour"], r["n_events"], r["total_value_cents"])
        for r in spark.table(sink).collect()
    }
    assert got == {("2024-01-01 10:00:00", 5, 6100)}  # all five events


# ---------------------------------------------------------------------------
# Round 14 (verdict task #2): the guard is wired INTO the event-time
# constructors, default ON - a library user assembling a stream through
# the public API gets finding-73 protection without knowing it exists.
# ---------------------------------------------------------------------------


def _stream(spark, src):
    return (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )


def test_default_guard_e2e_windowed_aggregate(spark, tmp_path):
    """Poisoned feed straight through the PUBLIC constructor with all
    defaults: zero legitimate drops, all five events counted, and the
    quarantined-row count is published as an observed metric on every
    micro-batch (the drop is loud, not silent)."""
    src = str(tmp_path / "in")
    _feed(src, POISONED)
    agg = windowed_event_aggregate(
        _stream(spark, src), "1 hour", watermark_delay="30 minutes"
    )
    sink = f"skew_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{sink}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 0
    got = {
        (r["hour"], r["n_events"], r["total_value_cents"])
        for r in spark.table(sink).collect()
    }
    assert got == {("2024-01-01 10:00:00", 5, 6100)}  # all five events
    quarantined = sum(
        p["observedMetrics"]["future_skew_quarantine"]["rows_quarantined"]
        for p in q.recentProgress
        if "future_skew_quarantine" in p.get("observedMetrics", {})
    )
    assert quarantined == 1  # exactly the poison row, visibly counted


def test_default_guard_e2e_session_windows(spark, tmp_path):
    from pyspark_data_engineering_assignment_spark.streaming.windows import (
        session_windowed_events,
    )

    src = str(tmp_path / "in")
    # reuse POISONED but the sessionizer groups by user_id - feed has
    # event_type only, so rename via a per-file frame with user column
    _feed(src, POISONED)
    sess = session_windowed_events(
        _stream(spark, src).withColumnRenamed("event_type", "user_id"),
        gap_duration="30 minutes",
        watermark_delay="30 minutes",
    )
    sink = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sess.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{sink}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(sink).collect()
    # all 5 legitimate events present across sessions; poison row gone
    assert sum(r["n_events"] for r in rows) == 5


def test_dedup_stream_blackholed_without_guard(spark, tmp_path):
    """Round-14 probe pin: dropDuplicatesWithinWatermark is ALSO
    blackholed by one future row - batch 2's events (d, e at 10:20 /
    10:25) silently vanish as late. This is why the guard defaults ON
    for dedup too (the skewed row is a smaller loss than the stream)."""
    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        dedup_stream_by_key,
    )

    poisoned = [
        [("2024-01-01 10:00:00", "1.0"), ("2099-01-01 00:00:00", "2.0")],
        [("2024-01-01 10:05:00", "4.0"), ("2024-01-01 10:10:00", "8.0")],
        [("2024-01-01 10:20:00", "16.0"), ("2024-01-01 10:25:00", "32.0")],
    ]
    for guard, expect_values in [
        (None, {"1.0", "2.0", "4.0", "8.0"}),  # d, e GONE
        ("10 minutes", {"1.0", "4.0", "8.0", "16.0", "32.0"}),  # poison gone
    ]:
        src = str(tmp_path / f"in_{'guarded' if guard else 'raw'}")
        _feed(src, poisoned)
        # value is the dedup key here: every row unique -> all should pass
        dd = dedup_stream_by_key(
            _stream(spark, src),
            ["value"],
            watermark_delay="30 minutes",
            future_tolerance=guard,
        )
        sink = f"dd_{uuid.uuid4().hex[:8]}"
        q = (
            dd.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{sink}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {str(r["value"]) for r in spark.table(sink).collect()}
        assert got == expect_values, (guard, got)


def test_expiring_counts_crashloops_without_guard(spark, tmp_path):
    """Round-14 probe pin: the unguarded EventTimeTimeout operator does
    not blackhole - it CRASHES: every legitimate key's
    setTimeoutTimestamp(newest + ttl) lands below the poisoned
    watermark and raises INVALID_TIMEOUT_TIMESTAMP; since the poisoned
    file survives restart, the query would crash-loop forever. With the
    default guard the same feed drains cleanly."""
    import pytest

    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        expiring_counts,
    )

    src = str(tmp_path / "in")
    _feed(src, POISONED)

    def drain(guard):
        ec = expiring_counts(
            _stream(spark, src),
            "event_type",
            "ts",
            ttl_minutes=60,
            watermark_delay="30 minutes",
            future_tolerance=guard,
        )
        sink = f"ec_{uuid.uuid4().hex[:8]}"
        q = (
            ec.writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{sink}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(sink).collect()

    with pytest.raises(Exception, match="INVALID_TIMEOUT_TIMESTAMP|TIMEOUT"):
        drain(None)
    rows = drain("10 minutes")
    # all 5 legitimate events counted under key 'x'; poison row absent
    assert max(r["n_events"] for r in rows) == 5
