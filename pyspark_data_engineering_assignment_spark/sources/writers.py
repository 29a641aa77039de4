"""Batch output writers with scale-sane file layout.

The failure modes these prevent at 100 TB:
  * thousands of tiny files per partition (every downstream scan pays a
    per-file open cost + the object store pays a listing cost);
  * one giant file per partition (kills read parallelism);
  * unpartitioned output that forces full scans on partition-selective
    queries downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet with bounded file sizes.

    ``maxRecordsPerFile`` splits oversized task outputs; pairing it with
    a repartition on the partition columns (one task per hive partition,
    AQE-coalesced) avoids the small-files explosion of every input task
    writing into every output partition.
    """
    writer = df
    if partition_cols:
        writer = df.repartition(*partition_cols)
    (
        writer.write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*(partition_cols or []))
        .parquet(path)
    )


def write_partitioned_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
    bloom_filter_cols: list[str] | None = None,
) -> None:
    """Partitioned ORC with the same layout discipline as the parquet
    writer, plus optional ORC bloom filters on point-lookup columns
    (``orc.bloom.filter.columns``) - row groups that can't contain the
    looked-up key are skipped at scan time."""
    writer = df
    if partition_cols:
        writer = df.repartition(*partition_cols)
    w = writer.write.mode(mode).option(
        "maxRecordsPerFile", str(max_records_per_file)
    )
    if bloom_filter_cols:
        w = w.option("orc.bloom.filter.columns", ",".join(bloom_filter_cols))
    w.partitionBy(*(partition_cols or [])).orc(path)
