"""Dynamic partition pruning: a partition-selective dimension join must
prune fact partitions AT RUNTIME - the flagship Catalyst optimization
for star-schema scans over hive-partitioned layouts.

The driver testdata is unpartitioned parquet (DPP has nothing to prune
there), so this test writes the events table through the engine's own
partitioned writer first - which is exactly the layout contract the
writer exists to establish: partition the fact table by its hot filter
column and selective joins stop scanning the other partitions.

Static pruning (literal filter on the partition column) is asserted
alongside as the baseline: partition values must not even reach the
file listing.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.sources.tables import load_table
from pyspark_data_engineering_assignment_spark.sources.writers import (
    write_partitioned_parquet,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_partitioned(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dpp") / "events_by_type")
    write_partitioned_parquet(
        load_table(spark, SF, "events"),
        path,
        partition_cols=["event_type"],
        max_records_per_file=100_000,
    )
    return path


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_static_partition_pruning(spark, events_partitioned):
    df = spark.read.parquet(events_partitioned).filter(
        F.col("event_type") == "purchase"
    )
    p = _plan(df)
    # the literal partition predicate becomes a PartitionFilters entry on
    # the scan, not a post-scan Filter over all partitions
    assert "PartitionFilters" in p and "event_type" in p, p
    assert df.count() == (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )


def test_dynamic_partition_pruning_from_dim_join(spark, events_partitioned):
    facts = spark.read.parquet(events_partitioned)
    # partition-selective dim known only at runtime (through a join)
    dim = spark.createDataFrame(
        [("purchase", 1), ("error", 2)], "event_type string, type_class int"
    ).filter(F.col("type_class") == 1)
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
    )
    # DPP only fires when it estimates the pruned side large enough;
    # force the decision path deterministic for the pin
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false"
    )
    try:
        joined = facts.join(F.broadcast(dim), on="event_type")
        p = _plan(joined)
        assert "dynamicpruning" in p.lower(), p
        got = joined.count()
        expected = (
            load_table(spark, SF, "events")
            .filter(F.col("event_type") == "purchase")
            .count()
        )
        assert got == expected
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )
