"""Streaming twin of the batch curation funnel: id-ordered document
ingest -> first-occurrence keeper per content fingerprint (stateful) ->
quality gate. The surviving (lang, source) composition must EQUAL the
batch corpus_curation_funnel query over the same corpus."""

from __future__ import annotations

import os
import uuid

import pandas as pd
import pytest

from pyspark_data_engineering_assignment_spark.plans import QUERIES

pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_streaming_curation_equals_batch_funnel(spark, tmp_path):
    import time as _time

    from pyspark.sql import functions as F

    from pyspark_data_engineering_assignment_spark.functions.text import (
        md5_fingerprint,
        tokens,
    )
    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        first_seen_by_key,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    now = _time.time()
    for i in range(5):  # id-ordered chunks -> in-order batches
        p = os.path.join(src, f"chunk{i}.csv")
        docs.iloc[i * 100 : (i + 1) * 100].to_csv(p, index=False)
        os.utime(p, (now + i, now + i))

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    stream = (
        spark.readStream.format("csv")
        .option("header", "true")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    enriched = stream.withColumn(
        "fp", md5_fingerprint(F.col("text"))
    ).withColumn("n_toks", F.size(tokens(F.col("text"))))
    kept = first_seen_by_key(
        enriched, "fp", "doc_id", ["lang", "source", "n_chars", "n_toks"]
    )
    sink = f"curate_{uuid.uuid4().hex[:8]}"
    q = (
        kept.filter((F.col("n_chars") >= 100) & (F.col("n_toks") >= 20))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # each key emits at most once ever, so update-mode appends are final
    streamed = (
        spark.table(sink)
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"))
        .collect()
    )
    stream_counts = {(r["lang"], r["source"]): r["n_docs"] for r in streamed}
    batch_counts = {
        (r["lang"], r["source"]): r["n_docs"]
        for r in QUERIES["corpus_curation_funnel"].fn(spark, SF).collect()
    }
    assert stream_counts == batch_counts


@pytest.mark.slow
def test_streaming_cdc_apply_equals_batch_window(spark, tmp_path):
    """Streaming CDC state == the batch last-writer-wins query over the
    same feed (tombstoned deletes excluded), fed out of id order so the
    (ts, seq) competition actually decides winners."""
    import time as _time
    import uuid

    from pyspark.sql import functions as F

    from pyspark_data_engineering_assignment_spark.streaming.stateful import (
        cdc_apply_stream,
    )

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.sort_values("event_id", ascending=False)  # worst-case order
    ev["ts_micros"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["op"] = ev["event_type"].map(
        lambda t: "insert" if t == "signup" else ("delete" if t == "error" else "upsert")
    )
    ev["cents"] = (ev["value"].round(2) * 100).round().astype("int64")
    feed = ev[["user_id", "ts_micros", "event_id", "op", "cents"]]

    src = str(tmp_path / "cdc_in")
    os.makedirs(src)
    now = _time.time()
    step = (len(feed) + 4) // 5
    for i in range(5):
        p = os.path.join(src, f"c{i}.csv")
        feed.iloc[i * step : (i + 1) * step].to_csv(p, index=False)
        os.utime(p, (now + i, now + i))

    stream = (
        spark.readStream.format("csv").option("header", "true")
        .schema(
            "user_id long, ts_micros long, event_id long, op string, cents long"
        )
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    sink = f"cdc_{uuid.uuid4().hex[:8]}"
    q = (
        cdc_apply_stream(stream, "user_id", "ts_micros", "event_id", "op", "cents")
        .writeStream.format("memory").queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cdc_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode re-emits touched keys: the LAST emission per key is final
    emitted = spark.table(sink).withColumn("_i", F.monotonically_increasing_id())
    final = {
        r["key"]: (r["last_op"], r["last_ts_micros"], r["last_cents"])
        for r in emitted.orderBy("_i").collect()
    }
    streamed = {
        int(k): (op, ts, cents)
        for k, (op, ts, cents) in final.items()
        if op != "delete"  # tombstones excluded, like the batch filter
    }

    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    batch = {
        r["user_id"]: (
            r["last_op"],
            int(r["last_ts"].timestamp() * 1_000_000),
            r["last_cents"],
        )
        for r in QUERIES["user_cdc_state"].fn(spark, SF).collect()
    }
    assert streamed == batch
