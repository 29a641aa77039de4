"""Custom Python data source (Spark 4 DataSource API): determinism,
partition planning, filter pushdown, and no-row-at-a-time reads."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.sources.simsource import (
    EVENT_TYPES,
    SimEventsDataSource,
    SimEventsReader,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    # dynamic conf: required whenever a Python source implements
    # pushFilters (Spark refuses to init the reader without it)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SimEventsDataSource)


def _read(spark, **opts):
    r = spark.read.format("sim_events")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_row_count_and_partition_planning(spark):
    df = _read(spark, rows=5000, partitions=7)
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 7
    # ids are exactly 0..rows-1: ranges tile with no gap or overlap
    agg = df.agg(
        F.min("event_id"), F.max("event_id"), F.countDistinct("event_id")
    ).collect()[0]
    assert tuple(agg) == (0, 4999, 5000)


def test_deterministic_across_partitionings(spark):
    a = _read(spark, rows=3000, partitions=3).orderBy("event_id").collect()
    b = _read(spark, rows=3000, partitions=11).orderBy("event_id").collect()
    assert a == b


def test_filter_pushdown_equals_post_scan_filter(spark):
    full = _read(spark, rows=4000, partitions=4)
    for t in ["click", "purchase"]:
        pushed = full.filter(F.col("event_type") == t)
        expected = {
            r["event_id"]
            for r in full.collect()
            if r["event_type"] == t
        }
        got = {r["event_id"] for r in pushed.collect()}
        assert got == expected and got  # pushdown changes nothing, non-empty


def test_pushdown_handshake_keeps_unsupported_filters():
    from pyspark.sql.datasource import EqualTo, GreaterThan

    r = SimEventsReader({"rows": "100"})
    eq = EqualTo(("event_type",), "click")
    gt = GreaterThan(("value",), 5.0)
    remaining = list(r.pushFilters([eq, gt]))
    assert r.pushed_type == "click"  # equality absorbed by the source
    assert remaining == [gt]  # range predicate handed back to Spark


def test_reader_emits_arrow_batches_not_rows():
    import pyarrow as pa

    r = SimEventsReader({"rows": "100", "partitions": "2"})
    parts = r.partitions()
    assert len(parts) == 2
    out = list(r.read(parts[0]))
    assert all(isinstance(b, pa.RecordBatch) for b in out)
    assert sum(b.num_rows for b in out) == 50
    assert set(EVENT_TYPES) >= set(out[0].column(2).to_pylist())
