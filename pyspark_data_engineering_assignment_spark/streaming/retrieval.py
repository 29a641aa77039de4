"""Streaming retrieval: a stream of query vectors probing a STATIC
persisted IVF index - the served-ANN shape (reference has no ANN at
all; this extends the build-once/probe-many split in
operators/similarity.py to the arrival pattern real retrieval has:
requests stream in, the index changes only when a scheduled rebuild
republishes it).

Why ``foreachBatch``: the probe ranks candidates with a row_number
window over query_id - a non-time window Structured Streaming cannot
run on an unbounded stream (correctly: global per-key ranks never
finalize). Per micro-batch the query set IS bounded, so each batch
reuses the EXACT batch operator - the batch==stream equality contract
holds by construction and is pinned in
tests/test_streaming_retrieval.py.

Output is idempotent the same way the detection sink is: one directory
per batch_id, overwritten on replay, so a retried batch produces
byte-identical results instead of appended duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark_data_engineering_assignment_spark.operators.similarity import (
    load_ivf_index,
    probe_ivf,
)


def probe_ivf_stream(
    query_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """Start an availableNow stream that probes the persisted index for
    every micro-batch of queries, writing per-batch parquet under
    ``out_path/batch_id=N`` (overwrite => replay-idempotent). Returns
    the StreamingQuery; results are read back with
    ``spark.read.parquet(out_path)``."""
    spark = query_stream.sparkSession
    centroids, assigned = load_ivf_index(spark, index_path)

    def do_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        probe_ivf(
            centroids,
            assigned,
            batch_df,
            k=k,
            n_probe=n_probe,
            id_col=id_col,
            vec_col=vec_col,
            exclude_self=exclude_self,
        ).write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    return (
        query_stream.writeStream.foreachBatch(do_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def probe_ivf_det_stream(
    query_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """``probe_ivf_stream``'s twin over the DETERMINISTIC persisted
    index (clustering.persist_ivf_det_index): same foreachBatch shape,
    same per-batch_id overwrite idempotence - but because the
    fixed-point index makes every probe a pure function of the input,
    the streamed output is not merely batch==stream equal, it is
    value-hash reproducible cross-engine (the registered
    ann_ivf_probe_topk query's oracle covers the identical path)."""
    from pyspark_data_engineering_assignment_spark.operators.clustering import (
        load_ivf_det_index,
        probe_ivf_det,
    )

    spark = query_stream.sparkSession
    cells, corpus = load_ivf_det_index(spark, index_path)

    def do_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        probe_ivf_det(
            cells,
            corpus,
            batch_df,
            k=k,
            n_probe=n_probe,
            id_col=id_col,
            vec_col=vec_col,
        ).write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    return (
        query_stream.writeStream.foreachBatch(do_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
