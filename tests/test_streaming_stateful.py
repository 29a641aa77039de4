"""Tests for Spark-native stateful streaming operators
(``streaming/stateful.py``): applyInPandasWithState running counters and
watermark-bounded streaming dedup."""

from __future__ import annotations

import os
import uuid

import pytest

import pandas as pd

from pyspark_data_engineering_assignment_spark.schemas import TRANSACTION_SCHEMA
from pyspark_data_engineering_assignment_spark.streaming.stateful import (
    dedup_stream_by_key,
    running_pair_counters,
)
from pyspark_data_engineering_assignment_spark.tools.feeder import feed_chunks

COLUMNS = [f.name for f in TRANSACTION_SCHEMA.fields]


def _tx(step, customer, merchant, amount):
    return (step, customer, "2", "F", "28007", merchant, "28007", "es_a", amount, 0)


def test_running_pair_counters_cumulative_state(spark, tmp_path):
    """State persists across micro-batches: (C1,M1) crosses the emit
    threshold in batch 1 only when batch 0's counts carried over."""
    rows = [
        # batch 0 (chunk of 4)
        _tx(0, "C1", "M1", "10.00"),
        _tx(0, "C1", "M1", "20.50"),
        _tx(0, "C2", "M1", "5.00"),
        _tx(0, "C2", "M2", "5.00"),
        # batch 1
        _tx(1, "C1", "M1", "0.25"),
        _tx(1, "C2", "M1", "1.00"),
        _tx(1, "C9", "M9", "1.00"),
        _tx(1, "C9", "M9", "1.00"),
    ]
    src_csv = tmp_path / "tx.csv"
    pd.DataFrame(rows, columns=COLUMNS).to_csv(src_csv, index=False)
    input_dir = str(tmp_path / "incoming")
    feed_chunks(str(src_csv), input_dir, chunk_rows=4)

    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema(TRANSACTION_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(input_dir)
    )
    out = running_pair_counters(stream, emit_min_count=3)

    sink = f"pairs_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(tuple(r) for r in spark.table(sink).collect())
    # batch 0: no pair reaches 3. batch 1: (C1,M1) -> 3 txns, 30.75 total.
    # (C2,M1) has 2, (C9,M9) has 2 -> silent.
    assert got == [("C1", "M1", 3, 3075)]


def test_dedup_stream_drops_redelivery(spark, tmp_path):
    """Re-delivered event_ids within the watermark are dropped; distinct
    ids all survive."""
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    f1 = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": ["2024-01-01 10:00:00", "2024-01-01 10:05:00", "2024-01-01 10:10:00"],
            "value": [1.0, 2.0, 3.0],
        }
    )
    f2 = pd.DataFrame(
        {
            "event_id": [2, 4],  # 2 is a redelivery
            "ts": ["2024-01-01 10:06:00", "2024-01-01 10:20:00"],
            "value": [2.0, 4.0],
        }
    )
    for i, pdf in enumerate([f1, f2]):
        p = os.path.join(src, f"part{i}.csv")
        pdf.to_csv(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    out = dedup_stream_by_key(stream, ["event_id"], watermark_delay="1 hour")

    sink = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    ids = sorted(r["event_id"] for r in spark.table(sink).collect())
    assert ids == [1, 2, 3, 4]


@pytest.mark.slow
def test_running_ewma_stream_equals_batch_fold(spark, tmp_path):
    """Time-ordered feed in 3 chunks: the streaming EWMA's final value
    per key must be BIT-identical to the batch ewma_by_key fold over
    the same rows (same IEEE op sequence, carried across batches)."""
    import numpy as np

    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        ewma_by_key,
    )
    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        running_ewma,
    )

    rng = np.random.default_rng(7)
    n = 90
    rows = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": range(n),  # already time-ordered
            "user_id": rng.integers(0, 7, n),
            "value": np.round(rng.exponential(20.0, n), 2),
        }
    )
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    import time as _time

    now = _time.time()
    for i in range(3):  # ts-ordered chunks -> in-order batches
        p = os.path.join(src, f"chunk{i}.csv")
        rows.iloc[i * 30 : (i + 1) * 30].to_csv(p, index=False)
        # The file source orders same-batch candidates by modification
        # time; bulk-written files can share an mtime and arrive out of
        # ts order (the repo's feeder staggers mtimes for exactly this
        # reason). Stagger explicitly so batch order == ts order.
        os.utime(p, (now + i, now + i))

    schema = "event_id long, ts long, user_id long, value double"
    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    out = running_ewma(stream, "user_id", ["ts", "event_id"], "value")
    sink = f"ewma_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # memory sink in update mode appends each batch's emissions; the
    # final state per key is the row with that key's max n_events
    emitted = spark.table(sink).toPandas()
    final = (
        emitted.sort_values("n_events").groupby("key").last().reset_index()
    )
    stream_vals = {
        r["key"]: (r["n_events"], r["ewma_value"]) for _, r in final.iterrows()
    }

    batch_df = spark.createDataFrame(rows[["user_id", "ts", "event_id", "value"]], schema="user_id long, ts long, event_id long, value double")
    batch_vals = {
        str(r["user_id"]): (r["n_events"], r["ewma_value"])
        for r in ewma_by_key(
            batch_df, ["user_id"], ["ts", "event_id"], "value"
        ).collect()
    }
    assert stream_vals == batch_vals  # bit-exact, including the doubles


def test_running_ewma_skips_nulls_like_batch(spark, tmp_path):
    """NULL observations arrive in the stateful UDF as NaN; folding one
    would poison the key's EWMA state FOREVER (every later s_i inherits
    the NaN) while the batch twin filters nulls - silent batch/stream
    divergence. Both sides must skip them and agree bit-exactly."""
    import numpy as np

    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        ewma_by_key,
    )
    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        running_ewma,
    )

    rng = np.random.default_rng(11)
    n = 60
    vals = np.round(rng.exponential(20.0, n), 2)
    vals[rng.random(n) < 0.25] = np.nan  # ~25% missing observations
    # ~15% missing ORDER keys too: round 9's contract excludes rows
    # with a NULL order key from the fold on BOTH twins (the batch
    # side's engines disagree on NULL ordering; the stream's pandas
    # sort would place them last) - the csv empty cell arrives as a
    # true SQL NULL on both paths
    # pandas nullable Int64, NOT float-with-NaN: a float ts column
    # csv-serializes as "3.0", which Spark's long schema cannot parse,
    # silently nulling EVERY ts and making the probe vacuous
    ts = pd.array(range(n), dtype="Int64")
    ts[rng.random(n) < 0.15] = pd.NA
    rows = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": ts,
            "user_id": rng.integers(0, 5, n),
            "value": vals,
        }
    )
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    import time as _time

    now = _time.time()
    for i in range(2):
        p = os.path.join(src, f"chunk{i}.csv")
        rows.iloc[i * 30 : (i + 1) * 30].to_csv(p, index=False)
        os.utime(p, (now + i, now + i))

    schema = "event_id long, ts long, user_id long, value double"
    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    out = running_ewma(stream, "user_id", ["ts", "event_id"], "value")
    sink = f"ewma_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(sink).toPandas()
    final = (
        emitted.sort_values("n_events").groupby("key").last().reset_index()
    )
    stream_vals = {
        r["key"]: (r["n_events"], r["ewma_value"]) for _, r in final.iterrows()
    }
    assert all(
        v == v for _, v in stream_vals.values()
    ), "NaN leaked into streaming EWMA state"

    # batch side reads the SAME csv files: a NaN written by pandas
    # arrives as a true SQL NULL through csv ingestion on both paths
    # (createDataFrame from pandas would instead carry float NaN,
    # which isNotNull does not filter - a different hazard class)
    batch_df = (
        spark.read.format("csv").option("header", "true").schema(schema).load(src)
    )
    batch_vals = {
        str(r["user_id"]): (r["n_events"], r["ewma_value"])
        for r in ewma_by_key(
            batch_df, ["user_id"], ["ts", "event_id"], "value"
        ).collect()
    }
    assert stream_vals == batch_vals


def test_running_ewma_key_spanning_multiple_arrow_chunks(spark, tmp_path):
    """One hot key whose single-batch rows span MANY Arrow record
    batches (maxRecordsPerBatch lowered to 16 for 120 rows), written in
    REVERSE ts order: the state function receives the key's rows as
    multiple pandas chunks in arbitrary order, so folding chunk-locally
    sorted frames would produce a different (wrong) IEEE sequence. The
    fold must concat all chunks then sort once - pinned by bit-equality
    with the batch fold."""
    import numpy as np

    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        ewma_by_key,
    )
    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        running_ewma,
    )

    rng = np.random.default_rng(11)
    n = 120
    rows = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": range(n),
            "user_id": 1,  # single hot key
            "value": np.round(rng.exponential(20.0, n), 2),
        }
    ).iloc[::-1]  # reverse file order: chunk-local sorting would misfold
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    rows.to_csv(os.path.join(src, "all.csv"), index=False)

    schema = "event_id long, ts long, user_id long, value double"
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        stream = (
            spark.readStream.format("csv")
            .option("header", "true")
            .schema(schema)
            .load(src)
        )
        out = running_ewma(stream, "user_id", ["ts", "event_id"], "value")
        sink = f"ewma_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emitted = spark.table(sink).toPandas()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    final = emitted.sort_values("n_events").groupby("key").last().reset_index()
    stream_vals = {
        r["key"]: (r["n_events"], r["ewma_value"]) for _, r in final.iterrows()
    }
    batch_df = spark.createDataFrame(
        rows[["user_id", "ts", "event_id", "value"]],
        schema="user_id long, ts long, event_id long, value double",
    )
    batch_vals = {
        str(r["user_id"]): (r["n_events"], r["ewma_value"])
        for r in ewma_by_key(
            batch_df, ["user_id"], ["ts", "event_id"], "value"
        ).collect()
    }
    assert stream_vals == batch_vals  # bit-exact across chunk boundaries


def test_running_ewma_state_survives_restart(spark, tmp_path):
    """Kill-and-restart: drain two chunks, stop, land a third chunk,
    start a NEW query on the SAME checkpoint - the rebuilt state must
    continue the fold (not restart it), so the final per-key value is
    bit-identical to the batch fold over all three chunks."""
    import time as _time

    import numpy as np

    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        ewma_by_key,
    )
    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        running_ewma,
    )

    rng = np.random.default_rng(23)
    n = 90
    rows = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": range(n),
            "user_id": rng.integers(0, 5, n),
            "value": np.round(rng.exponential(20.0, n), 2),
        }
    )
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    now = _time.time()

    def land(i):
        p = os.path.join(src, f"chunk{i}.csv")
        rows.iloc[i * 30 : (i + 1) * 30].to_csv(p, index=False)
        os.utime(p, (now + i, now + i))

    schema = "event_id long, ts long, user_id long, value double"
    out_dirs = []

    def run_once():
        # memory sink cannot recover from a checkpoint; a foreachBatch
        # parquet append is the restartable sink shape (same as the
        # engine's own pipeline)
        stream = (
            spark.readStream.format("csv")
            .option("header", "true")
            .schema(schema)
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )
        out = running_ewma(stream, "user_id", ["ts", "event_id"], "value")
        out_dir = str(tmp_path / f"out_{len(out_dirs)}")
        out_dirs.append(out_dir)
        q = (
            out.writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return out_dir

    land(0)
    land(1)
    run_once()            # first incarnation: chunks 0-1, then stops
    land(2)
    out_dir = run_once()  # restart from checkpoint: only chunk 2 is new

    emitted = spark.read.parquet(out_dir).toPandas()  # 2nd incarnation only
    final = emitted.sort_values("n_events").groupby("key").last().reset_index()
    stream_vals = {
        r["key"]: (r["n_events"], r["ewma_value"]) for _, r in final.iterrows()
    }
    batch_df = spark.createDataFrame(
        rows[["user_id", "ts", "event_id", "value"]],
        schema="user_id long, ts long, event_id long, value double",
    )
    batch_vals = {
        str(r["user_id"]): (r["n_events"], r["ewma_value"])
        for r in ewma_by_key(
            batch_df, ["user_id"], ["ts", "event_id"], "value"
        ).collect()
    }
    # every key active in chunk 2 must show the FULL-history fold
    for k, v in stream_vals.items():
        assert v == batch_vals[k]
    assert stream_vals  # at least one key re-emitted after restart


def test_running_spend_anomalies_stream_equals_batch_window(spark, tmp_path):
    """Ordered feed in 3 chunks: the streaming anomaly detector's
    flagged (key, event_id) set must EXACTLY equal the batch
    moving-window query's flagged set - integer cents arithmetic on
    both sides, so equality is set equality, not tolerance."""
    import time as _time

    import numpy as np
    from pyspark.sql import Window

    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        running_spend_anomalies,
    )

    rng = np.random.default_rng(31)
    n = 240
    base = rng.integers(900, 1100, n)
    spikes = rng.random(n) < 0.08
    cents = np.where(spikes, base * 20, base)  # planted 20x spikes
    rows = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": range(n),
            "user_id": rng.integers(0, 6, n),
            "cents": cents.astype("int64"),
        }
    )
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    now = _time.time()
    for i in range(3):
        p = os.path.join(src, f"chunk{i}.csv")
        rows.iloc[i * 80 : (i + 1) * 80].to_csv(p, index=False)
        os.utime(p, (now + i, now + i))

    schema = "event_id long, ts long, user_id long, cents long"
    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    out = running_spend_anomalies(
        stream, "user_id", ["ts", "event_id"], "cents"
    )
    sink = f"anom_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_flagged = {
        (r["key"], r["order_id"]) for r in spark.table(sink).collect()
    }

    # batch twin: same integer z-test over a trailing ROWS window
    from pyspark.sql import functions as Fn

    bdf = spark.createDataFrame(rows, schema=schema)
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    w = bdf.select(
        "event_id",
        "user_id",
        "cents",
        Fn.count("*").over(win).alias("n_prev"),
        Fn.sum("cents").over(win).alias("sum_prev"),
        Fn.sum(Fn.col("cents") * Fn.col("cents")).over(win).alias("sumsq_prev"),
    )
    dev = Fn.col("cents") * Fn.col("n_prev") - Fn.col("sum_prev")
    var_n2 = (
        Fn.col("n_prev") * Fn.col("sumsq_prev")
        - Fn.col("sum_prev") * Fn.col("sum_prev")
    )
    batch_flagged = {
        (str(r["user_id"]), r["event_id"])
        for r in w.filter(
            (Fn.col("n_prev") >= 5) & (dev * dev > 9 * var_n2)
        ).collect()
    }
    assert stream_flagged == batch_flagged
    assert batch_flagged  # spikes guarantee a non-vacuous comparison


@pytest.mark.slow
def test_event_time_ttl_expires_idle_keys(spark, tmp_path):
    """expiring_counts: a key idle for ttl past the watermark emits its
    final count with expired=1 and its state is REMOVED (re-appearing
    later restarts from zero) - eviction driven by event time, so the
    drain is deterministic."""
    import os
    import time as _time
    import uuid

    import pandas as pd

    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        expiring_counts,
    )

    rows_by_file = [
        # t=0: key a twice, key b once
        [("a", "2024-01-01 10:00:00"), ("a", "2024-01-01 10:01:00"),
         ("b", "2024-01-01 10:00:00")],
        # +30min: b active again; a idle
        [("b", "2024-01-01 10:30:00")],
        # +3h flush: advances the watermark past everyone's ttl
        [("c", "2024-01-01 13:00:00")],
        # next trigger: timeouts FIRE for a and b here (a key with data
        # in the same trigger would take the data path instead - Spark's
        # timeout contract - so this batch carries only filler key d)
        [("d", "2024-01-01 13:05:00")],
        # a RE-APPEARS after expiry: must restart from zero
        [("a", "2024-01-01 13:10:00")],
    ]
    src = str(tmp_path / "ttl_in")
    os.makedirs(src)
    now = _time.time()
    for i, rows in enumerate(rows_by_file):
        p = os.path.join(src, f"c{i}.csv")
        pd.DataFrame(rows, columns=["k", "ts"]).to_csv(p, index=False)
        os.utime(p, (now + i, now + i))

    stream = (
        spark.readStream.format("csv").option("header", "true")
        .schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", "1").load(src)
    )
    sink = f"ttl_{uuid.uuid4().hex[:8]}"
    q = (
        expiring_counts(stream, "k", "ts", ttl_minutes=60,
                        watermark_delay="10 minutes")
        .writeStream.format("memory").queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ttl_ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()

    import pyspark.sql.functions as F
    emitted = [
        (r["key"], r["n_events"], r["expired"])
        for r in spark.table(sink)
        .withColumn("_i", F.monotonically_increasing_id())
        .orderBy("_i")
        .collect()
    ]
    # a and b must each expire exactly once, with their final pre-idle counts
    assert emitted.count(("a", 2, 1)) == 1, emitted
    assert emitted.count(("b", 2, 1)) == 1, emitted
    # a's post-expiry re-appearance restarted from zero
    assert ("a", 1, 0) in emitted[-2:] or ("a", 1, 0) in emitted, emitted
    assert ("a", 3, 0) not in emitted, emitted  # state really was removed


def _feed_csv_files(tmp_path, name, frames):
    """Write pandas frames as one CSV file per micro-batch with monotone
    mtimes (pandas NaN/None fields serialize as empty -> true SQL NULL
    through csv ingestion, the hazard shape a real feed delivers)."""
    import time as _time

    src = str(tmp_path / name)
    os.makedirs(src)
    now = _time.time()
    for i, frame in enumerate(frames):
        p = os.path.join(src, f"c{i}.csv")
        frame.to_csv(p, index=False)
        os.utime(p, (now + i, now + i))
    return src


def _drain(spark, tmp_path, out, prefix):
    sink = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"{prefix}_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink


def test_cdc_apply_stream_skips_unplaceable_changes(spark, tmp_path):
    """A change record with NULL ts or NULL seq has no position in the
    (ts, seq) total order - it is corrupt, not a change. Before the
    skip, pandas' NULL->NaN made int(row.ts_micros) raise ValueError and
    the poisoned file crash-looped the stream on every restart. Now the
    stream survives, corrupt rows decide nothing, a key touched ONLY by
    corrupt rows never materializes, and a NULL op survives as NULL (not
    the string 'None')."""
    from pyspark.sql import functions as F

    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        cdc_apply_stream,
    )

    # nullable Int64 so ints with missing neighbors serialize as "100",
    # not "100.0" (which the long schema would PERMISSIVE-null entirely)
    b0 = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 3],
            "ts_micros": pd.array([100, None, 50, None], dtype="Int64"),
            "event_id": [10, 11, 20, 30],
            "op": ["insert", "upsert", "insert", "insert"],
            "cents": [500, 900, 700, 800],
        }
    )
    b1 = pd.DataFrame(
        {
            "user_id": [1, 2, 4],
            "ts_micros": [200, 60, 10],
            "event_id": pd.array([12, None, 40], dtype="Int64"),
            "op": [None, "upsert", "upsert"],  # NULL op must stay NULL
            "cents": [1100, 999, 400],
        }
    )
    src = _feed_csv_files(tmp_path, "cdc_corrupt_in", [b0, b1])
    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema(
            "user_id long, ts_micros long, event_id long, op string, cents long"
        )
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    sink = _drain(
        spark,
        tmp_path,
        cdc_apply_stream(stream, "user_id", "ts_micros", "event_id", "op", "cents"),
        "cdcnull",
    )
    emitted = spark.table(sink).withColumn("_i", F.monotonically_increasing_id())
    final = {
        r["key"]: (r["last_op"], r["last_ts_micros"], r["last_cents"])
        for r in emitted.orderBy("_i").collect()
    }
    # key 3 was touched ONLY by a corrupt row: it must not exist at all
    assert set(final) == {"1", "2", "4"}
    # key 1: (200, 12) wins over (100, 10); its NULL op is preserved
    assert final["1"] == (None, 200, 1100)
    # key 2: (60, ...) would compete, but its seq is NULL -> corrupt, so
    # batch-0's (50, 20) remains the winner
    assert final["2"] == ("insert", 50, 700)
    assert final["4"] == ("upsert", 10, 400)


def test_running_spend_anomalies_skips_corrupt_rows(spark, tmp_path):
    """Corrupt observations (NULL cents, or NULL in an ordering field)
    must neither crash the recurrence (int(NaN) did, permanently - the
    file is still there on restart) nor occupy trailing-window slots.
    The flagged set equals the batch twin's with the same isNotNull
    filter - the exact contract user_spend_anomalies now ships."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as Fn

    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        running_spend_anomalies,
    )

    rng = np.random.default_rng(7)
    n = 180
    base = rng.integers(900, 1100, n)
    spikes = rng.random(n) < 0.1
    cents = pd.array(np.where(spikes, base * 20, base), dtype="Int64")
    cents[rng.random(n) < 0.15] = None  # corrupt: missing value
    ts = pd.array(range(n), dtype="Int64")
    ts[rng.random(n) < 0.05] = None  # corrupt: unplaceable
    rows = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": ts,
            "user_id": rng.integers(0, 4, n),
            "cents": cents,
        }
    )
    src = _feed_csv_files(
        tmp_path, "anom_corrupt_in", [rows.iloc[:90], rows.iloc[90:]]
    )
    schema = "event_id long, ts long, user_id long, cents long"
    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    sink = _drain(
        spark,
        tmp_path,
        running_spend_anomalies(stream, "user_id", ["ts", "event_id"], "cents"),
        "anomnull",
    )
    stream_flagged = {
        (r["key"], r["order_id"]) for r in spark.table(sink).collect()
    }

    bdf = (
        spark.read.format("csv").option("header", "true").schema(schema).load(src)
    ).filter(
        Fn.col("cents").isNotNull()
        & Fn.col("ts").isNotNull()
        & Fn.col("event_id").isNotNull()
    )
    win = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-10, -1)
    )
    w = bdf.select(
        "event_id",
        "user_id",
        "cents",
        Fn.count("*").over(win).alias("n_prev"),
        Fn.sum("cents").over(win).alias("sum_prev"),
        Fn.sum(Fn.col("cents") * Fn.col("cents")).over(win).alias("sumsq_prev"),
    )
    dev = Fn.col("cents") * Fn.col("n_prev") - Fn.col("sum_prev")
    var_n2 = (
        Fn.col("n_prev") * Fn.col("sumsq_prev")
        - Fn.col("sum_prev") * Fn.col("sum_prev")
    )
    batch_flagged = {
        (str(r["user_id"]), r["event_id"])
        for r in w.filter(
            (Fn.col("n_prev") >= 5) & (dev * dev > 9 * var_n2)
        ).collect()
    }
    assert stream_flagged == batch_flagged
    assert batch_flagged  # planted spikes keep the comparison non-vacuous


def test_first_seen_skips_null_order_rows(spark, tmp_path):
    """A row with no order value cannot be a key's 'first' (SQL min()
    skips NULL): a key whose first batch carries ONLY null-order rows
    has not orderably appeared - no state, no emission - and its real
    first arrival in a later batch emits normally. idxmin over all-NaN
    crashed here before."""
    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        first_seen_by_key,
    )

    b0 = pd.DataFrame(
        {
            "fp": ["x", "y", "y"],
            # x: all-null; y: min of real = 3 (Int64 keeps "3", not "3.0")
            "doc_id": pd.array([None, None, 3], dtype="Int64"),
            "source": ["s0", "s1", "s2"],
        }
    )
    b1 = pd.DataFrame(
        {
            "fp": ["x", "y"],
            "doc_id": [7, 1],  # x's real first; y already kept (3 stands)
            "source": ["s3", "s4"],
        }
    )
    src = _feed_csv_files(tmp_path, "fs_corrupt_in", [b0, b1])
    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema("fp string, doc_id long, source string")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    sink = _drain(
        spark,
        tmp_path,
        first_seen_by_key(stream, "fp", "doc_id", ["source"]),
        "fsnull",
    )
    kept = {r["key"]: (r["doc_id"], r["source"]) for r in spark.table(sink).collect()}
    assert kept == {"x": (7, "s3"), "y": (3, "s2")}


def test_expiring_counts_ignores_null_event_times(spark, tmp_path):
    """Rows with no event time have no position in event time: they are
    not counted and cannot set (or corrupt) the key's timeout. An
    all-NaT batch previously computed a garbage min-int64 timeout
    timestamp. State and previously-set timeouts stand untouched."""
    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        expiring_counts,
    )

    frames = [
        pd.DataFrame({"k": ["a", "a"], "ts": ["2024-01-01 10:00:00", None]}),
        pd.DataFrame({"k": ["a"], "ts": [None]}),  # all-corrupt batch
        pd.DataFrame({"k": ["a"], "ts": ["2024-01-01 10:20:00"]}),
    ]
    src = _feed_csv_files(tmp_path, "ttl_corrupt_in", frames)
    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    sink = _drain(
        spark,
        tmp_path,
        expiring_counts(stream, "k", "ts", ttl_minutes=60,
                        watermark_delay="10 minutes"),
        "ttlnull",
    )
    from pyspark.sql import functions as F

    emitted = [
        (r["key"], r["n_events"], r["expired"])
        for r in spark.table(sink)
        .withColumn("_i", F.monotonically_increasing_id())
        .orderBy("_i")
        .collect()
    ]
    # batch 0: one real row counted (not two); batch 1: nothing emitted;
    # batch 2: count advances to 2
    assert emitted == [("a", 1, 0), ("a", 2, 0)], emitted


def test_running_ewma_property_chunking_invariant(spark):
    """Property (hypothesis): for ANY time-ordered rows (NULL
    observations mixed in) and ANY contiguous chunking of the feed -
    empty chunks included - the streaming EWMA's final per-key state is
    BIT-identical to the batch ewma_by_key fold over the same rows.
    Randomizes the thing the fixed contract test pins once: the
    micro-batch boundaries."""
    import tempfile
    import time as _time

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        ewma_by_key,
    )
    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        running_ewma,
    )

    vals = st.none() | st.integers(min_value=0, max_value=400)

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(st.sampled_from([0, 1]), vals), min_size=1, max_size=10
        ),
        cutdraw=st.lists(st.integers(min_value=0, max_value=10), max_size=3),
    )
    def prop(rows, cutdraw):
        # exactly-representable doubles: integer quarters survive the
        # csv round trip bit-exactly
        data = pd.DataFrame(
            {
                "event_id": range(len(rows)),
                "ts": range(len(rows)),
                "user_id": [u for u, _ in rows],
                "value": [None if v is None else v * 0.25 for _, v in rows],
            }
        )
        cuts = sorted({min(c, len(rows)) for c in cutdraw})
        bounds = [0] + cuts + [len(rows)]
        tmp = tempfile.mkdtemp(prefix="ewma_prop_")
        src = os.path.join(tmp, "incoming")
        os.makedirs(src)
        now = _time.time()
        for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
            p = os.path.join(src, f"chunk{i}.csv")
            data.iloc[lo:hi].to_csv(p, index=False)  # may be header-only
            os.utime(p, (now + i, now + i))
        schema = "event_id long, ts long, user_id long, value double"
        stream = (
            spark.readStream.format("csv")
            .option("header", "true")
            .schema(schema)
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )
        sink = f"ewma_prop_{uuid.uuid4().hex[:8]}"
        q = (
            running_ewma(stream, "user_id", ["ts", "event_id"], "value")
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emitted = spark.table(sink).toPandas()
        if len(emitted):
            final = (
                emitted.sort_values("n_events").groupby("key").last().reset_index()
            )
            got = {
                r["key"]: (r["n_events"], r["ewma_value"])
                for _, r in final.iterrows()
            }
        else:
            got = {}
        batch_df = spark.createDataFrame(
            data[["user_id", "ts", "event_id", "value"]],
            schema="user_id long, ts long, event_id long, value double",
        )
        expect = {
            str(r["user_id"]): (r["n_events"], r["ewma_value"])
            for r in ewma_by_key(
                batch_df, ["user_id"], ["ts", "event_id"], "value"
            ).collect()
        }
        assert got == expect, (rows, bounds, got, expect)

    prop()
