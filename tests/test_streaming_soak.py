"""Live-feed soak (round-11): every moving part at once.

The e2e tests drain a pre-staged backlog with availableNow; this test
runs the system the way production runs it - a LIVE feeder publishing
chunks on an interval while the stream consumes on a processing-time
trigger, the pipeline vacuuming its state snapshots every 2 batches,
and an out-of-band reader polling state the whole time:

* the pipeline itself must never error (vacuum inside foreachBatch is
  same-thread and safe by construction);
* every SUCCESSFUL out-of-band read must equal the cumulative state
  after some whole number of chunks (batches consume whole files, the
  pointer swap is atomic, so torn totals are impossible);
* the out-of-band reader MAY transiently fail while vacuum reclaims a
  snapshot it planned to scan - that is the documented
  retention_seconds=0 hazard, tolerated and counted here, never a
  crash of the pipeline;
* final state equals the full feed exactly.
"""

from __future__ import annotations

import os
import threading
from collections import Counter

import pandas as pd

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
from pyspark_data_engineering_assignment_spark.tools.feeder import feed_chunks

from tests.test_streaming_e2e import COLUMNS, IMPORTANCE_ROWS

import pytest  # noqa: E402

pytestmark = pytest.mark.slow

N_CHUNKS = 10
CHUNK_ROWS = 4


def _rows():
    out = []
    for i in range(N_CHUNKS * CHUNK_ROWS):
        out.append(
            (i // CHUNK_ROWS, f"C{i % 7}", "2", "F", "28007",
             f"M{i % 5}", "28007", "es_a", "10.0", 0)
        )
    return out


def test_live_feed_stream_vacuum_reader_soak(spark, tmp_path):
    rows = _rows()
    src = tmp_path / "transactions.csv"
    pd.DataFrame(rows, columns=COLUMNS).to_csv(src, index=False)
    imp = tmp_path / "importance.csv"
    pd.DataFrame(
        IMPORTANCE_ROWS,
        columns=["Source", "Target", "Weight", "typeTrans", "fraud"],
    ).to_csv(imp, index=False)
    input_dir = str(tmp_path / "incoming")
    os.makedirs(input_dir, exist_ok=True)

    store = ParquetStateStore(spark, str(tmp_path / "state"))
    pipe = DetectionPipeline(
        spark,
        store,
        read_importance(spark, str(imp)),
        str(tmp_path / "detections"),
        config=EngineConfig(
            trigger="500 milliseconds",
            max_files_per_trigger=2,
            vacuum_every_n_batches=2,
        ),
        clock=FixedClock("2024-01-01 00:00:00"),
    )
    q = pipe.run_stream(input_dir, str(tmp_path / "ckpt"))

    # the set of totals a consistent reader may observe: cumulative
    # merchant counts after k whole chunks, k = 0..N_CHUNKS
    prefixes = []
    for k in range(N_CHUNKS + 1):
        c = Counter(r[5] for r in rows[: k * CHUNK_ROWS])
        prefixes.append(dict(c))

    observed, read_errors, reader_bug = [], [0], []
    done = threading.Event()

    def reader():
        while not done.is_set():
            try:
                totals = {
                    r["merchant_id"]: r["total_transactions"]
                    for r in store.read_state(MERCHANT_SUMMARY).collect()
                }
            except Exception:  # noqa: BLE001 - the documented
                # retention=0 out-of-band hazard: vacuum reclaimed a
                # snapshot between pointer read and scan. Tolerated.
                read_errors[0] += 1
                continue
            if totals not in prefixes:
                reader_bug.append(totals)
            observed.append(totals)

    t = threading.Thread(target=reader)
    t.start()
    try:
        feed_chunks(str(src), input_dir, chunk_rows=CHUNK_ROWS, interval_s=0.25)
        q.processAllAvailable()
    finally:
        done.set()
        t.join()
        q.stop()

    assert not reader_bug, f"torn/non-prefix reads: {reader_bug[:3]}"
    final = {
        r["merchant_id"]: r["total_transactions"]
        for r in store.read_state(MERCHANT_SUMMARY).collect()
    }
    assert final == prefixes[-1]
    # the reader genuinely sampled mid-stream states, not just the end
    assert len(observed) >= 3
