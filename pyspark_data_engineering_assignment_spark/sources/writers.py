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


def write_audit_publish(
    df,
    path: str,
    rules: list | None = None,
    partition_cols: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
):
    """Write-audit-publish: the lakehouse gating pattern (Iceberg WAP /
    staging-branch publish) without table-format machinery. The frame
    is written to a SIBLING staging directory, the declarative quality
    rules (tools/expectations.py) run against the staged files - i.e.
    against exactly the bytes readers would see, catching write-path
    corruption a pre-write check cannot - and only a fully-passing
    audit atomically renames the staging directory into place.
    A failing audit leaves NO published path (readers keep whatever was
    there before; here: nothing), and the staging dir remains for
    inspection. Returns the audit report rows.

    Scale: the audit is one extra read of the staged output (column-
    pruned to the rule columns), not of the input; the publish is one
    filesystem rename - atomic on any real object-store-with-rename or
    HDFS path layout where staging and final share a parent.
    """
    import os

    from pyspark.sql import SparkSession

    from pyspark_data_engineering_assignment_spark.tools.expectations import (
        quality_report,
    )

    if os.path.exists(path):
        raise ValueError(f"publish target already exists: {path}")
    staging = path.rstrip("/") + "._staging"
    write_partitioned_parquet(
        df,
        staging,
        partition_cols=partition_cols,
        max_records_per_file=max_records_per_file,
    )
    spark = df.sparkSession if hasattr(df, "sparkSession") else SparkSession.active()
    staged = spark.read.parquet(staging)
    report = quality_report(staged, rules or []).collect() if rules else []
    if all(r["passed"] == 1 for r in report):
        os.rename(staging, path)
    return report
