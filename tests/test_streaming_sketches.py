"""Streaming count-min sketch: because CMS is a LINEAR sketch (counters
add), the batch operator ``cms_sketch`` runs UNCHANGED on a streaming
DataFrame - Spark's built-in streaming aggregation state IS the sketch
(depth x width counters, sketch-sized regardless of stream length), and
the final counters are BIT-IDENTICAL to the batch sketch over the same
rows: integer addition is exact and order-free, so chunking cannot
change any counter.
"""

from __future__ import annotations

import os
import time
import uuid

import pandas as pd
import pytest

pytestmark = pytest.mark.slow

DEPTH, WIDTH = 4, 1024
SF = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    from pyspark_data_engineering_assignment_spark.operators.sketches import (
        cms_sketch,
    )
    from pyspark_data_engineering_assignment_spark.sources.tables import (
        load_table,
    )

    events = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id"]
    ).sort_values("event_id")
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    now = time.time()
    n = len(events)
    step = (n + 4) // 5
    for i in range(5):
        p = os.path.join(src, f"chunk{i}.csv")
        events.iloc[i * step : (i + 1) * step].to_csv(p, index=False)
        os.utime(p, (now + i, now + i))

    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    sink = f"cms_{uuid.uuid4().hex[:8]}"
    q = (
        cms_sketch(stream, "user_id", depth=DEPTH, width=WIDTH)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r["j"], r["bucket"]): r["cnt"] for r in spark.table(sink).collect()
    }
    batch = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_sketch(
            load_table(spark, SF, "events"), "user_id", depth=DEPTH, width=WIDTH
        ).collect()
    }
    assert streamed == batch  # exact counter-for-counter equality
    assert len(streamed) <= DEPTH * WIDTH  # state stays sketch-sized


@pytest.mark.slow
def test_streaming_hll_equals_batch_estimate(spark, tmp_path):
    """HLL++ is register-MAX - order-free like CMS addition - so the
    streaming approx_count_distinct over any chunking equals the batch
    estimate EXACTLY (same registers, same estimator)."""
    from pyspark.sql import functions as F

    from pyspark_data_engineering_assignment_spark.sources.tables import (
        load_table,
    )

    events = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id"]
    ).sort_values("event_id")
    src = str(tmp_path / "hll_in")
    os.makedirs(src)
    now = time.time()
    n = len(events)
    step = (n + 3) // 4
    for i in range(4):
        p = os.path.join(src, f"c{i}.csv")
        events.iloc[i * step : (i + 1) * step].to_csv(p, index=False)
        os.utime(p, (now + i, now + i))

    stream = (
        spark.readStream.format("csv").option("header", "true")
        .schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1").load(src)
    )
    sink = f"hll_{uuid.uuid4().hex[:8]}"
    q = (
        stream.groupBy()
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("est"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "hll_ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    streamed = spark.table(sink).collect()[0]["est"]
    batch = (
        load_table(spark, SF, "events")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("est"))
        .collect()[0]["est"]
    )
    assert streamed == batch  # exact estimator equality, not approximate
