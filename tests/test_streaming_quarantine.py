"""Streaming quarantine channel (round-11).

Row-level damage under a CORRECT header previously PERMISSIVE-nulled
through the stream silently (documented in the round-11 corrupt-input
sweep); header damage fails loudly. With
``EngineConfig(quarantine_dir=...)`` the middle ground exists: a
schema-failing row is captured WHOLE (raw line) under
``quarantine_dir/batch_id=N/``, idempotently per batch, and EXCLUDED
from state and detections. Off by default - the pre-round-11 behavior
is unchanged (pinned by the existing corrupt-input sweep, which runs
without a quarantine dir).
"""

from __future__ import annotations

import glob
import os
import time as _time

from pyspark_data_engineering_assignment_spark.config import EngineConfig
from pyspark_data_engineering_assignment_spark.patterns.detect import FixedClock
from pyspark_data_engineering_assignment_spark.sources.readers import read_importance
from pyspark_data_engineering_assignment_spark.state.store import (
    MERCHANT_SUMMARY,
    ParquetStateStore,
)
from pyspark_data_engineering_assignment_spark.streaming.pipeline import (
    DetectionPipeline,
)

from tests.test_streaming_e2e import COLUMNS, ROWS, _write_inputs
import pytest  # noqa: E402

CLOCK = FixedClock("2024-01-01 00:00:00")

BAD_LINES = [
    "4,C9,3,M,28007,M9,28007,es_a,NOTANUMBER,0",  # untypable amount
    "4,C8,3,M",  # wrong arity
]


def _merchant_state(store):
    return {
        r["merchant_id"]: r["total_transactions"]
        for r in store.read_state(MERCHANT_SUMMARY).collect()
    }


def _quarantined_lines(spark, qdir):
    out = []
    for d in sorted(glob.glob(os.path.join(qdir, "batch_id=*"))):
        out.extend(
            r["_corrupt_record"] for r in spark.read.parquet(d).collect()
        )
    return sorted(out)


def _run(spark, tmp_path, quarantine: bool):
    input_dir, imp_path, chunks = _write_inputs(tmp_path)
    # append a chunk with one clean row and the two damaged lines
    bad_path = os.path.join(input_dir, "chunk_damaged.csv")
    with open(bad_path, "w") as f:
        f.write(",".join(COLUMNS) + "\n")
        f.write("4,C7,3,M,28007,M9,28007,es_a,7.0,0\n")
        for line in BAD_LINES:
            f.write(line + "\n")
    mt = _time.time() + 10
    os.utime(bad_path, (mt, mt))

    qdir = str(tmp_path / "quarantine")
    store = ParquetStateStore(spark, str(tmp_path / "state"))
    pipe = DetectionPipeline(
        spark,
        store,
        read_importance(spark, imp_path),
        str(tmp_path / "detections"),
        config=EngineConfig(quarantine_dir=qdir if quarantine else None),
        clock=CLOCK,
    )
    pipe.run_stream(input_dir, str(tmp_path / "ckpt")).awaitTermination()
    return store, qdir, pipe, input_dir


def test_damaged_rows_quarantined_and_excluded_from_state(spark, tmp_path):
    store, qdir, _, _ = _run(spark, tmp_path, quarantine=True)
    from collections import Counter

    want = dict(Counter(r[5] for r in ROWS))
    want["M9"] = want.get("M9", 0) + 1  # the chunk's one CLEAN row
    assert _merchant_state(store) == want
    assert _quarantined_lines(spark, qdir) == sorted(BAD_LINES)


@pytest.mark.slow
def test_quarantine_replay_is_idempotent(spark, tmp_path):
    store, qdir, pipe, input_dir = _run(spark, tmp_path, quarantine=True)
    before = _quarantined_lines(spark, qdir)
    state_before = _merchant_state(store)
    # second drain from the same checkpoint: nothing new to consume,
    # quarantine files intact, state unchanged
    pipe.run_stream(input_dir, str(tmp_path / "ckpt")).awaitTermination()
    assert _quarantined_lines(spark, qdir) == before
    assert _merchant_state(store) == state_before


@pytest.mark.slow
def test_without_quarantine_dir_rows_null_through(spark, tmp_path):
    """The default path is byte-for-byte the pre-round-11 behavior:
    damaged rows PERMISSIVE-null and still COUNT toward their merchant
    (amount nulls, merchant field survives where parseable)."""
    store, qdir, _, _ = _run(spark, tmp_path, quarantine=False)
    assert not os.path.isdir(qdir)
    state = _merchant_state(store)
    # the untypable-amount row keeps merchant M9 -> M9 counts 2 (clean
    # + nulled); the wrong-arity row has no merchant field -> NULL key,
    # excluded from keyed state by the merge contract
    from collections import Counter

    want = dict(Counter(r[5] for r in ROWS))
    want["M9"] = want.get("M9", 0) + 2
    assert state == want
