"""Batch==stream contract #11: a stream of query vectors probing the
static persisted IVF index returns EXACTLY the batch probe's results.

The serving shape: the index is built once (persist_ivf_index), queries
arrive as micro-batches; each batch runs the same probe_ivf operator,
so streamed-union == batch-all-at-once must hold row-for-row (modulo
batch boundaries, which don't affect per-query top-k - every query is
self-contained)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_streamed_probe_equals_batch_probe(spark, tmp_path):
    from pyspark_data_engineering_assignment_spark.operators.similarity import (
        load_ivf_index,
        persist_ivf_index,
        probe_ivf,
    )
    from pyspark_data_engineering_assignment_spark.streaming.retrieval import (
        probe_ivf_stream,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    index_path = str(tmp_path / "index")
    persist_ivf_index(emb, index_path, n_cells=8)

    queries = emb.filter(F.col("vec_id") < 10)
    # feed the 10 queries as 3 parquet chunks -> 3 micro-batches
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    qpd = queries.toPandas().sort_values("vec_id")
    for i, lo in enumerate(range(0, 10, 4)):
        qpd.iloc[lo : lo + 4].to_parquet(os.path.join(src, f"chunk{i}.parquet"))

    stream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = str(tmp_path / "results")
    probe_ivf_stream(
        stream, index_path, out, str(tmp_path / "ckpt"), k=5, n_probe=4
    ).awaitTermination()

    centroids, assigned = load_ivf_index(spark, index_path)
    batch = probe_ivf(centroids, assigned, queries, k=5, n_probe=4)
    streamed = spark.read.parquet(out).select(
        "query_id", "neighbor_id", "cos", "rank"
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # replay idempotence: re-running a batch overwrites, not appends
    df0 = pd.read_parquet(os.path.join(src, "chunk0.parquet"))
    replay = spark.createDataFrame(df0, schema=queries.schema)
    probe_ivf(centroids, assigned, replay, k=5, n_probe=4).write.mode(
        "overwrite"
    ).parquet(f"{out}/batch_id=0")
    streamed2 = spark.read.parquet(out).select(
        "query_id", "neighbor_id", "cos", "rank"
    )
    assert sorted(map(tuple, streamed2.collect())) == sorted(
        map(tuple, batch.collect())
    )


@pytest.mark.slow
def test_streamed_det_probe_equals_batch_and_registry(spark, tmp_path):
    """Batch==stream contract #12: the DETERMINISTIC index probe. The
    streamed union must equal the batch probe row-for-row AND - because
    the fixed-point index is a pure function of the corpus - equal the
    registered ann_ivf_probe_topk query's output exactly (same
    persisted-index params), tying the streaming path to the
    value-hash-oracled one."""
    from pyspark_data_engineering_assignment_spark.operators.clustering import (
        load_ivf_det_index,
        persist_ivf_det_index,
        probe_ivf_det,
    )
    from pyspark_data_engineering_assignment_spark.plans import QUERIES
    from pyspark_data_engineering_assignment_spark.streaming.retrieval import (
        probe_ivf_det_stream,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    index_path = str(tmp_path / "det_index")
    persist_ivf_det_index(emb, index_path, n_cells=8, iters=3)

    queries = emb.filter(F.col("vec_id") < 10)
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    qpd = queries.toPandas().sort_values("vec_id")
    for i, lo in enumerate(range(0, 10, 4)):
        qpd.iloc[lo : lo + 4].to_parquet(os.path.join(src, f"chunk{i}.parquet"))

    stream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = str(tmp_path / "results")
    probe_ivf_det_stream(
        stream, index_path, out, str(tmp_path / "ckpt"), k=5, n_probe=2
    ).awaitTermination()

    cells, corpus = load_ivf_det_index(spark, index_path)
    batch = probe_ivf_det(cells, corpus, queries, k=5, n_probe=2)
    streamed = spark.read.parquet(out).select(
        "query_id", "neighbor_id", "cos", "rank"
    )
    got = sorted(map(tuple, streamed.collect()))
    assert got == sorted(map(tuple, batch.collect()))
    registry = QUERIES["ann_ivf_probe_topk"].fn(spark, SF)
    assert got == sorted(map(tuple, registry.collect()))
