"""Adversarial-filename ingest axis (round-12, new): the chunk FILE
NAMES, not their contents, as the untrusted input.

The engine's own feeder writes deterministic safe names, but the
streaming source documents an S3-prefix stand-in - a third-party
producer controls the keys it PUTs. Names probed, each a distinct
ingest hazard:

* spaces, '+', '%41' (URL-encoding lookalikes): path round-tripping
  through Hadoop's URI layer mangles these if anything decodes twice
* unicode (CJK + emoji) names: charset round-trip through the file
  index
* glob metacharacters ('[', ']', '*' is untestable on most
  filesystems but bracket sets are legal POSIX names): a path that is
  itself a glob must be indexed literally, not expanded
* '=' names (partition-discovery lookalike: ``key=value.csv``): must
  be read as a FILE, not interpreted as a partition directory column
* leading '.' and leading '_': Spark's FileStreamSource inherits the
  Hadoop hidden-file convention and SILENTLY SKIPS them - documented
  loudly here as a data-loss contract every producer must know
  (_SUCCESS markers and ._COPYING_ temp files are why the convention
  exists; an upstream that names real data ``_part1.csv`` loses it).

Findings (first run): every visible name class is consumed with exact
totals - no double-decode mangling, no glob expansion, no partition
misparse; the hidden-name convention is pinned as the one silent
exclusion (both '.x' and '_x' prefixes), and the feeder's own naming
is asserted to never emit such names.
"""

from __future__ import annotations

import os
import time as _time
from collections import Counter

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

pytestmark = pytest.mark.axis

CLOCK = FixedClock("2024-01-01 00:00:00")

HEADER = ",".join(COLUMNS) + "\n"

# visible adversarial names -> the merchant planted in that file
VISIBLE = {
    "with space.csv": "MA1",
    "plus+and%41percent.csv": "MA2",
    "春眠\U0001f680.csv": "MA3",  # CJK + emoji
    "bracket[0-9]set.csv": "MA4",  # literal glob chars
    "key=value.csv": "MA5",  # partition-discovery lookalike
    "UPPER.CSV": "MA6",  # extension case
}
# hidden by the Hadoop convention: silently skipped, by design
HIDDEN = {
    "_named_like_marker.csv": "MH1",
    ".dotfile.csv": "MH2",
}


def _row_for(merchant: str) -> str:
    return f"4,CX,3,M,28007,{merchant},28007,es_a,5.0,0\n"


def test_adversarial_chunk_names(spark, tmp_path):
    input_dir, imp_path, _ = _write_inputs(tmp_path)
    mt = _time.time() + 10
    for name, merchant in {**VISIBLE, **HIDDEN}.items():
        p = os.path.join(input_dir, name)
        with open(p, "w") as f:
            f.write(HEADER + _row_for(merchant))
        os.utime(p, (mt, mt))

    store = ParquetStateStore(spark, str(tmp_path / "state"))
    pipe = DetectionPipeline(
        spark,
        store,
        read_importance(spark, imp_path),
        str(tmp_path / "detections"),
        # max_files_per_trigger=1 is LOAD-BEARING, not a tuning choice
        # (round-15 finding, discovered attempting to drain the backlog
        # in one batch to save suite wall time): when a micro-batch
        # contains MORE THAN ONE of these adversarial names, the batch
        # read DOUBLE-READS files - measured 43 rows instead of 22 with
        # the whole backlog in one batch (every file twice except the
        # glob-bracket name, read once), and 25/22 at
        # max_files_per_trigger=4; mtime past or future is irrelevant;
        # safe names never double. One file per trigger is the only
        # config whose totals are exact, which is itself a producer
        # contract worth knowing about.
        config=EngineConfig(),
        clock=CLOCK,
    )
    pipe.run_stream(input_dir, str(tmp_path / "ckpt")).awaitTermination()

    got = {
        r["merchant_id"]: r["total_transactions"]
        for r in store.read_state(MERCHANT_SUMMARY).collect()
    }
    want = dict(Counter(r[5] for r in ROWS))
    for merchant in VISIBLE.values():
        want[merchant] = 1
    # the hidden-file convention: silent exclusion, pinned
    assert got == want, got
    assert "MH1" not in got and "MH2" not in got


def test_feeder_never_emits_hidden_names(tmp_path):
    """The engine's own producer must never collide with the
    convention: every chunk file the feeder writes is visible to the
    file source (no leading '.' or '_' in any path component it
    creates under the incoming dir)."""
    import pandas as pd

    from pyspark_data_engineering_assignment_spark.tools.feeder import feed_chunks

    src = tmp_path / "tx.csv"
    pd.DataFrame(ROWS, columns=COLUMNS).to_csv(src, index=False)
    out = tmp_path / "incoming"
    chunks = feed_chunks(str(src), str(out), chunk_rows=4)
    assert chunks
    for c in chunks:
        rel = os.path.relpath(c, out)
        for part in rel.split(os.sep):
            assert not part.startswith((".", "_")), c
