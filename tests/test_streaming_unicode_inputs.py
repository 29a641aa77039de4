"""Round-11 unicode/quoting sweep over the STREAMING CSV path.

The corrupt-streaming sweep probed file shapes; this one probes the
CSV *encoding* seams of the ingest and egress, with the fixture the
reference's own feeder would produce for international data: pandas
``to_csv`` writes RFC-4180 (doubled quotes, quoted embedded newlines),
and until round 11 the Spark side read that with backslash-escape and
``multiLine=false`` - a value containing a quote came back with its
quoting characters embedded in the data, and a quoted newline SHRED
one record into two bogus rows (measured; see readers.py read_csv
doc). Both readers now speak RFC-4180 (escape='"', multiLine on the
bounded-chunk stream), and the detection sink writes it.

Pins here:

* multi-byte (CJK/emoji/accents), comma-, quote- and newline-bearing
  customer/merchant names survive feeder -> file stream -> state
  EXACTLY (state keyed by the precise unicode strings), via the
  explicit multiline opt-in (allow_multiline feeder +
  csv_multi_line config)
* under the DEFAULT fast line-split parse, the feeder REFUSES
  newline-bearing cells at produce time (loud producer-contract
  failure instead of silent record shredding; the multiLine parse
  that would handle them measured 5.8x slower on the flagship drain,
  so it stays opt-in)
* the detection sink round-trips hazard names through its CSV files
  under an RFC-4180 reader (pandas), with the exactly-N bucketing
  contract intact
"""

from __future__ import annotations

import glob
import os
from collections import Counter

import pandas as pd
import pytest

from pyspark_data_engineering_assignment_spark.streaming.sink import (
    write_detections,
)
from pyspark_data_engineering_assignment_spark.tools.feeder import feed_chunks

from tests.test_streaming_corrupt_inputs import _merchant_state
from tests.test_streaming_e2e import COLUMNS, IMPORTANCE_ROWS

pytestmark = pytest.mark.axis

# step, customer, age, gender, zipcodeOri, merchant, zipMerchant, category, amount, fraud
U_ROWS = [
    (0, "C春眠", "2", "F", "28007", "M春", "28007", "es_a", "10.0", 0),
    (0, "C\U0001f680", "3", "M", "28007", "Mérch,ant", "28007", "es_a", "30.0", 0),
    (0, 'C"quoted"', "3", "M", "28007", 'M"q"', "28007", "es_b", "50.0", 0),
    (0, "Cline1\nline2", "2", "F", "28007", "M\U0001f680", "28007", "es_b", "50.0", 0),
    (1, "C春眠", "2", "F", "28007", "M春", "28007", "es_a", "20.0", 0),
    (1, "C\U0001f680", "3", "M", "28007", "Mérch,ant", "28007", "es_a", "30.0", 0),
    (1, 'C"quoted"', "3", "M", "28007", 'M"q"', "28007", "es_b", "50.0", 0),
    (1, "Cline1\nline2", "2", "F", "28007", "M\U0001f680", "28007", "es_b", "50.0", 0),
]


def test_unicode_names_survive_feeder_stream_state(spark, tmp_path):
    src = tmp_path / "transactions.csv"
    pd.DataFrame(U_ROWS, columns=COLUMNS).to_csv(src, index=False)
    imp = tmp_path / "importance.csv"
    pd.DataFrame(
        IMPORTANCE_ROWS,
        columns=["Source", "Target", "Weight", "typeTrans", "fraud"],
    ).to_csv(imp, index=False)
    input_dir = tmp_path / "incoming"
    chunks = feed_chunks(
        str(src), str(input_dir), chunk_rows=4, allow_multiline=True
    )
    assert len(chunks) == 2

    from pyspark_data_engineering_assignment_spark.config import EngineConfig
    from pyspark_data_engineering_assignment_spark.patterns.detect import (
        FixedClock,
    )
    from pyspark_data_engineering_assignment_spark.sources.readers import (
        read_importance,
    )
    from pyspark_data_engineering_assignment_spark.state.store import (
        ParquetStateStore,
    )
    from pyspark_data_engineering_assignment_spark.streaming.pipeline import (
        DetectionPipeline,
    )

    store = ParquetStateStore(spark, str(tmp_path / "state"))
    pipe = DetectionPipeline(
        spark,
        store,
        read_importance(spark, str(imp)),
        str(tmp_path / "detections"),
        config=EngineConfig(csv_multi_line=True),
        clock=FixedClock("2024-01-01 00:00:00"),
    )
    pipe.run_stream(input_dir=str(input_dir), checkpoint_dir=str(tmp_path / "ckpt")).awaitTermination()

    want = dict(Counter(r[5] for r in U_ROWS))
    assert _merchant_state(store) == want
    # keys above include a comma name, a quote name, CJK and an emoji -
    # equality of the dict proves byte-exact key round-trip through
    # feeder csv -> file stream -> state parquet


def test_feeder_refuses_newlines_without_multiline_optin(tmp_path):
    src = tmp_path / "transactions.csv"
    pd.DataFrame(U_ROWS, columns=COLUMNS).to_csv(src, index=False)
    with pytest.raises(ValueError, match="customer.*newline|newline"):
        feed_chunks(str(src), str(tmp_path / "incoming"), chunk_rows=4)
    # quote/comma/multi-byte WITHOUT newlines pass the default contract
    ok_rows = [r for r in U_ROWS if "\n" not in r[1]]
    pd.DataFrame(ok_rows, columns=COLUMNS).to_csv(src, index=False)
    assert feed_chunks(str(src), str(tmp_path / "incoming2"), chunk_rows=4)


def test_detection_sink_rfc4180_roundtrip(spark, tmp_path):
    names = [
        "C春眠",
        "C\U0001f680",
        'C"quoted"',
        "Cwith,comma",
        "Cline1\nline2",
        "Célève",
        "plain",
    ]
    rows = [
        ("2024-01-01 00:00:00", "2024-01-01 00:00:01", "PatId1",
         "UPGRADE", n, "M1")
        for n in names
    ]
    det = spark.createDataFrame(
        rows,
        "YStartTime string, DetectionTime string, PatternId string, "
        "ActionType string, CustomerName string, MerchantId string",
    )
    out = str(tmp_path / "det")
    total = write_detections(det, out, batch_id=0, rows_per_file=3)
    assert total == len(names)

    files = sorted(glob.glob(os.path.join(out, "batch_id=0", "bucket=*", "*.csv")))
    sizes = sorted(
        len(pd.read_csv(f, dtype=str, keep_default_na=False)) for f in files
    )
    assert sizes == [1, 3, 3]  # exactly-N bucketing unaffected by quoting

    got = []
    for f in files:
        got.extend(
            pd.read_csv(f, dtype=str, keep_default_na=False)["CustomerName"]
        )
    assert sorted(got) == sorted(names)
