"""Observed metrics: audit aggregates riding the SAME scan as the work
(zero extra passes), batch and streaming."""

from __future__ import annotations

import os
import time
import uuid

import pandas as pd
import pytest

from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.sources.tables import load_table
from pyspark_data_engineering_assignment_spark.tools.observe import (
    observe_stream,
    observed,
)

SF = "/root/testdata/sf0.001"


def test_batch_observation_matches_direct_aggregates(spark):
    e = load_table(spark, SF, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    instrumented, obs = observed(
        e,
        "ingest_audit",
        n_rows=F.count(F.lit(1)),
        n_null_users=F.count_if(F.col("user_id").isNull()),
        cents_sum=F.sum(cents),
    )
    # the *work* is a filter+agg; the audit metrics ride its scan
    work = instrumented.filter(F.col("event_type") == "purchase").count()
    got = obs.get
    direct = e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("user_id").isNull()).alias("n_null_users"),
        F.sum(cents).alias("cents_sum"),
    ).collect()[0]
    assert got["n_rows"] == direct["n_rows"]
    assert got["n_null_users"] == direct["n_null_users"]
    assert got["cents_sum"] == direct["cents_sum"]
    assert work == e.filter(F.col("event_type") == "purchase").count()


@pytest.mark.slow
def test_streaming_observed_metrics_cover_every_fed_row(spark, tmp_path):
    events = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "value"]
    ).sort_values("event_id")
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    now = time.time()
    n = len(events)
    step = (n + 3) // 4
    for i in range(4):
        p = os.path.join(src, f"chunk{i}.csv")
        events.iloc[i * step : (i + 1) * step].to_csv(p, index=False)
        os.utime(p, (now + i, now + i))

    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema("event_id long, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    instrumented = observe_stream(
        stream, "batch_audit", n_rows=F.count(F.lit(1)), cents_sum=F.sum(cents)
    )
    sink = f"obs_{uuid.uuid4().hex[:8]}"
    q = (
        instrumented.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    progresses = [p for p in q.recentProgress if p["observedMetrics"]]
    audits = [p["observedMetrics"]["batch_audit"] for p in progresses]
    assert audits, "no observed metrics surfaced in progress"
    # every fed row is accounted for, batch by batch, cents-exact
    assert sum(a["n_rows"] for a in audits) == n
    expected_cents = int(
        (events["value"].round(2) * 100).round().astype("int64").sum()
    )
    assert sum(a["cents_sum"] for a in audits) == expected_cents
