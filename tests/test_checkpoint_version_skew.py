"""Round-13 verdict task #5: version skew across restarts.

The reference demands a FRESH checkpoint dir per run (reference
``README.md:193``); this engine resumes instead, which creates the skew
surface: a restart may bring (a) a Spark checkpoint written by a
different engine build, (b) a state-table schema newer than the on-disk
snapshots. Contract pinned here: every skew either upgrades correctly
or fails loudly BEFORE touching state - never a silent reprocess or a
silently wrong read.

* offset-log FORMAT skew: a checkpoint whose offset log declares an
  unknown version (the shape a future Spark writes) refuses to restart
  with an UnsupportedOperationException naming the version - it must
  never fall back to reprocessing the backlog from scratch (that would
  double-count every committed batch).
* ADDITIVE state-schema skew (new sum column, restart without running
  migrate_schema): reads coalesce the missing counter to its typed-0
  migration default (round-13 verdict task #6, fixed in
  ``read_state``), so the lazy upgrade converges EXACTLY to an
  explicit migrate_schema - totals, untouched keys, everything; the
  previously pinned NULL-vs-0 divergence is gone.
* NARROWING state-schema skew (column type changed): read_state raises
  a parquet type mismatch - never casts silently.
"""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd
import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pyspark_data_engineering_assignment_spark.config import EngineConfig
from pyspark_data_engineering_assignment_spark.patterns.detect import FixedClock
from pyspark_data_engineering_assignment_spark.sources.readers import read_importance
from pyspark_data_engineering_assignment_spark.state.store import (
    MERCHANT_SUMMARY,
    ParquetStateStore,
    StateTableSpec,
)
from pyspark_data_engineering_assignment_spark.streaming.pipeline import (
    DetectionPipeline,
)
from pyspark_data_engineering_assignment_spark.tools.feeder import feed_chunks

from tests.test_streaming_e2e import COLUMNS, IMPORTANCE_ROWS, ROWS

pytestmark = pytest.mark.axis

CLOCK = FixedClock("2024-01-01 00:00:00")
NOW = "2024-01-01 00:00:00"

MERCHANT_AGG_SCHEMA = StructType(
    [
        StructField("merchant_id", StringType(), False),
        StructField("total_transactions", LongType(), True),
    ]
)


def test_offset_log_version_skew_refuses_restart(spark, tmp_path):
    src = tmp_path / "transactions.csv"
    pd.DataFrame(ROWS, columns=COLUMNS).to_csv(src, index=False)
    imp = tmp_path / "importance.csv"
    pd.DataFrame(
        IMPORTANCE_ROWS,
        columns=["Source", "Target", "Weight", "typeTrans", "fraud"],
    ).to_csv(imp, index=False)
    input_dir = str(tmp_path / "incoming")
    feed_chunks(str(src), input_dir, chunk_rows=4)
    ckpt = str(tmp_path / "checkpoint")

    store = ParquetStateStore(spark, str(tmp_path / "state"))
    pipe = DetectionPipeline(
        spark,
        store,
        read_importance(spark, str(imp)),
        str(tmp_path / "detections"),
        config=EngineConfig(),
        clock=CLOCK,
    )
    pipe.run_stream(input_dir, ckpt).awaitTermination()
    committed = store.last_batch_id(MERCHANT_SUMMARY)
    assert committed >= 0
    state_before = {
        r["merchant_id"]: r["total_transactions"]
        for r in store.read_state(MERCHANT_SUMMARY).collect()
    }

    # skew the offset log: declare a version this engine doesn't know
    # (what a checkpoint written by a future build looks like)
    offsets = sorted(glob.glob(os.path.join(ckpt, "offsets", "*")))
    assert offsets
    for path in offsets:
        lines = open(path).read().splitlines()
        assert lines[0] == "v1", lines[0]
        lines[0] = "v99"
        open(path, "w").write("\n".join(lines) + "\n")

    pipe2 = DetectionPipeline(
        spark,
        store,
        read_importance(spark, str(imp)),
        str(tmp_path / "detections"),
        config=EngineConfig(),
        clock=CLOCK,
    )
    with pytest.raises(Exception, match="(?i)v99|log version|unsupported"):
        pipe2.run_stream(input_dir, ckpt).awaitTermination()
    # the refused restart never touched state (no reprocess double count)
    assert store.last_batch_id(MERCHANT_SUMMARY) == committed
    assert {
        r["merchant_id"]: r["total_transactions"]
        for r in store.read_state(MERCHANT_SUMMARY).collect()
    } == state_before


def _evolved_spec() -> StateTableSpec:
    return StateTableSpec(
        MERCHANT_SUMMARY.name,
        MERCHANT_SUMMARY.key_cols,
        ("total_transactions", "rt_count"),
        StructType(
            [
                StructField("merchant_id", StringType(), False),
                StructField("total_transactions", LongType(), True),
                StructField("rt_count", LongType(), True),
                StructField("last_updated", TimestampType(), True),
            ]
        ),
    )


def test_additive_schema_skew_lazily_converges_to_migration(spark, tmp_path):
    evolved = _evolved_spec()
    evolved_agg = StructType(
        MERCHANT_AGG_SCHEMA.fields + [StructField("rt_count", LongType(), True)]
    )

    def old_merges(store):
        for bid in range(2):
            store.merge_batch(
                MERCHANT_SUMMARY,
                spark.createDataFrame(
                    [("M0", 1), ("M1", 1)], MERCHANT_AGG_SCHEMA
                ),
                batch_id=bid,
                now=NOW,
            )

    # path A: explicit migration, then an evolved merge touching only M0
    a = ParquetStateStore(spark, str(tmp_path / "a"), n_buckets=2)
    old_merges(a)
    a.migrate_schema(MERCHANT_SUMMARY, evolved)
    a.merge_batch(
        evolved,
        spark.createDataFrame([("M0", 1, 5)], evolved_agg),
        batch_id=2,
        now=NOW,
    )

    # path B: restart straight onto the evolved spec, NO migration -
    # the previous build's snapshots are read as-is
    b = ParquetStateStore(spark, str(tmp_path / "b"), n_buckets=2)
    old_merges(b)
    b.merge_batch(
        evolved,
        spark.createDataFrame([("M0", 1, 5)], evolved_agg),
        batch_id=2,
        now=NOW,
    )

    rows_a = {
        r["merchant_id"]: (r["total_transactions"], r["rt_count"])
        for r in a.read_state(evolved).collect()
    }
    rows_b = {
        r["merchant_id"]: (r["total_transactions"], r["rt_count"])
        for r in b.read_state(evolved).collect()
    }
    # touched keys converge exactly; the counters never corrupt
    assert rows_a["M0"] == rows_b["M0"] == (3, 5)
    # Round-13 verdict task #6: the lazy path now converges COMPLETELY -
    # read_state coalesces sum_cols to their typed-0 migration default,
    # so an untouched key's new counter reads 0 under BOTH paths (was
    # the one pinned NULL-vs-0 divergence; no caveat remains).
    assert rows_a["M1"] == rows_b["M1"] == (2, 0)


def test_narrowing_schema_skew_fails_loudly(spark, tmp_path):
    store = ParquetStateStore(spark, str(tmp_path), n_buckets=2)
    store.merge_batch(
        MERCHANT_SUMMARY,
        spark.createDataFrame([("M0", 1)], MERCHANT_AGG_SCHEMA),
        batch_id=0,
        now=NOW,
    )
    narrowed = StateTableSpec(
        MERCHANT_SUMMARY.name,
        MERCHANT_SUMMARY.key_cols,
        MERCHANT_SUMMARY.sum_cols,
        StructType(
            [
                StructField("merchant_id", StringType(), False),
                StructField("total_transactions", IntegerType(), True),  # was long
                StructField("last_updated", TimestampType(), True),
            ]
        ),
    )
    with pytest.raises(Exception, match="(?i)mismatch|type|parquet"):
        store.read_state(narrowed).collect()
