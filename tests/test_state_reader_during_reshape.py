"""Cross-process READER during rebucket / schema migration (round-12,
the reshape companion to test_state_multiprocess.py).

rebucket() and migrate_schema() document "same pointer dance as a
merge, so concurrent READERS are safe". That claim was never exercised
across processes, and the reader here is deliberately NOT Spark: a
pure-pyarrow process that follows the on-disk protocol (read
_LATEST.json, resolve ``v={v}/_bucket={b}`` paths, read parquet) in a
tight loop - hundreds of snapshots per second, a far denser race probe
than a JVM reader, and a pin that the pointer file + layout IS the
public contract an external tool can consume.

The writer (this process) runs the full reshape gauntlet against one
merchant table: merges -> rebucket 4->8 -> merges -> additive schema
migration (new sum col, DEFAULT 0 backfill) -> merges, vacuuming with
a retention window throughout. Invariants the reader must observe on
EVERY snapshot:

* atomicity: all 4 merchant keys present with EQUAL totals (each batch
  adds +1 to every key; a torn read shows a mix),
* monotonicity: totals never go backwards,
* no dangling paths: every bucket path the pointer references exists
  for the whole read (the retention window's out-of-band-reader
  guarantee, now exercised THROUGH a rebucket and a migration),
* the additive migration is invisible to an old-schema reader (the
  new column appends; existing columns keep names/types).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pyspark_data_engineering_assignment_spark.state.store import (
    MERCHANT_SUMMARY,
    ParquetStateStore,
    StateTableSpec,
)

pytestmark = pytest.mark.slow

NOW = "2024-01-01 00:00:00"
KEYS = ["M0", "M1", "M2", "M3"]

MERCHANT_AGG_SCHEMA = StructType(
    [
        StructField("merchant_id", StringType(), False),
        StructField("total_transactions", LongType(), True),
    ]
)

# Pure-python reader: follows the documented pointer protocol with no
# Spark. Emits one JSON line per snapshot: {"n": keys, "lo": min_total,
# "hi": max_total} or {"err": ...}; stops when the stop-file appears.
_READER = r"""
import json, os, sys, time
import pyarrow.parquet as pq

root, table, stopfile = sys.argv[1], sys.argv[2], sys.argv[3]
tdir = os.path.join(root, table)
stopped = False
while not stopped:
    # stop-check BEFORE the read, acted on AFTER it: the loop always
    # performs one full snapshot read after the writer signals stop, so
    # the final committed state is guaranteed observed even when a host
    # stall makes the reader lag the writer (pre-fix, the last printed
    # snapshot could predate the final merge -> flaky last==N assert)
    stopped = os.path.exists(stopfile)
    try:
        with open(os.path.join(tdir, "_LATEST.json")) as f:
            ptr = json.load(f)
    except FileNotFoundError:
        continue
    except json.JSONDecodeError as ex:
        print(json.dumps({"err": f"torn pointer: {ex}"}), flush=True)
        continue
    totals = {}
    err = None
    for b, v in ptr["versions"].items():
        p = os.path.join(tdir, f"v={v}", f"_bucket={b}")
        try:
            t = pq.read_table(p, columns=["merchant_id", "total_transactions"])
        except FileNotFoundError as ex:
            err = f"dangling path {p}"
            break
        for mid, n in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
            totals[mid] = totals.get(mid, 0) + n
    if err:
        print(json.dumps({"err": err}), flush=True)
    elif totals:
        vals = sorted(totals.values())
        print(json.dumps({"n": len(totals), "lo": vals[0], "hi": vals[-1]}),
              flush=True)
print(json.dumps({"done": True}), flush=True)
"""


@pytest.mark.slow
def test_pyarrow_reader_survives_rebucket_and_migration(spark, tmp_path):
    root = str(tmp_path)
    stopfile = os.path.join(root, "STOP")
    store = ParquetStateStore(spark, root, n_buckets=4)

    def merge(bid: int, spec=MERCHANT_SUMMARY):
        b = spark.createDataFrame(
            [(k, 1) for k in KEYS], MERCHANT_AGG_SCHEMA
        )
        store.merge_batch(spec, b, batch_id=bid, now=NOW)

    merge(0)  # reader needs a pointer to exist
    proc = subprocess.Popen(
        [sys.executable, "-c", _READER, root, MERCHANT_SUMMARY.name, stopfile],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd="/root/repo",
    )
    evolved = StateTableSpec(
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
    evolved_agg = StructType(
        MERCHANT_AGG_SCHEMA.fields + [StructField("rt_count", LongType(), True)]
    )
    try:
        for bid in range(1, 5):
            merge(bid)
            store.vacuum(MERCHANT_SUMMARY, retention_seconds=3600.0)
        store.rebucket(MERCHANT_SUMMARY, 8)
        for bid in range(5, 9):
            merge(bid)
            store.vacuum(MERCHANT_SUMMARY, retention_seconds=3600.0)
        store.migrate_schema(MERCHANT_SUMMARY, evolved)
        for bid in range(9, 12):
            b = spark.createDataFrame(
                [(k, 1, 2) for k in KEYS], evolved_agg
            )
            store.merge_batch(evolved, b, batch_id=bid, now=NOW)
            store.vacuum(evolved, retention_seconds=3600.0)
    finally:
        with open(stopfile, "w") as f:
            f.write("stop")
        out, _ = proc.communicate(timeout=120)

    obs = [json.loads(line) for line in out.splitlines()]
    assert obs and obs[-1].get("done"), out[-500:]
    errs = [o for o in obs if "err" in o]
    assert not errs, errs[:5]
    snaps = [o for o in obs if "n" in o]
    assert len(snaps) > 50, f"reader too slow to probe races: {len(snaps)}"
    last = 0
    for s in snaps:
        assert s["n"] == len(KEYS), s  # never a partial key set
        assert s["lo"] == s["hi"], s  # never a torn (mixed-batch) read
        assert s["lo"] >= last, (s, last)  # never goes backwards
        last = s["lo"]
    assert last == 12  # the reader saw the final committed state

    # old-schema handle still reads the migrated table (additive only)
    old_view = {
        r["merchant_id"]: r["total_transactions"]
        for r in store.read_state(MERCHANT_SUMMARY).collect()
    }
    assert old_view == {k: 12 for k in KEYS}
    new_view = {
        r["merchant_id"]: (r["total_transactions"], r["rt_count"])
        for r in store.read_state(evolved).collect()
    }
    assert new_view == {k: (12, 6) for k in KEYS}
