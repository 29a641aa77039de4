"""Round-15 streaming fixed-cost probe: where does a micro-batch's
~2.4s go? Times each section of DetectionPipeline.process_batch by
running the foreachBatch body DIRECTLY on static batch DataFrames (the
documented test entry point), so the numbers attribute wall time to
merges / state reads / detection sink without trigger scheduling noise.

Usage: python plans/r15/stream_batch_probe.py [chunk_rows] [n_batches]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from pyspark_data_engineering_assignment_spark.config import EngineConfig  # noqa: E402
from pyspark_data_engineering_assignment_spark.operators.aggregates import (  # noqa: E402
    customer_merchant_batch_aggregate,
    gender_pivot_aggregate,
    merchant_batch_aggregate,
)
from pyspark_data_engineering_assignment_spark.patterns.detect import (  # noqa: E402
    FixedClock,
    detect_all,
    enrich_batch,
)
from pyspark_data_engineering_assignment_spark.session import get_spark  # noqa: E402
from pyspark_data_engineering_assignment_spark.sources.readers import read_importance  # noqa: E402
from pyspark_data_engineering_assignment_spark.state.store import (  # noqa: E402
    CUSTOMER_MERCHANT_SUMMARY,
    MERCHANT_GENDER_SUMMARY,
    MERCHANT_SUMMARY,
    ParquetStateStore,
)
from pyspark_data_engineering_assignment_spark.streaming.sink import write_detections  # noqa: E402


def make_feed(n: int) -> pd.DataFrame:
    rng = np.random.default_rng(42)
    return pd.DataFrame(
        {
            "step": np.zeros(n, dtype=int),
            "customer": [f"C{i}" for i in rng.integers(0, 2000, n)],
            "age": rng.integers(1, 7, n).astype(str),
            "gender": rng.choice(["M", "F"], n, p=[0.55, 0.45]),
            "zipcodeOri": "28007",
            "merchant": [f"M{i}" for i in rng.integers(0, 100, n)],
            "zipMerchant": "28007",
            "category": rng.choice(["es_a", "es_b", "es_c"], n),
            "amount": np.round(rng.exponential(35.0, n), 2),
            "fraud": np.zeros(n, dtype=int),
        }
    )


def main() -> None:
    chunk_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark(app_name="stream_probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="stream_probe_")
    imp_pd = pd.DataFrame(
        {
            "Source": [f"C{i}" for i in range(2000)],
            "Target": [f"M{i % 100}" for i in range(2000)],
            "Weight": np.round(
                np.random.default_rng(1).uniform(0.1, 9.9, 2000), 2
            ),
            "typeTrans": [["es_a", "es_b", "es_c"][i % 3] for i in range(2000)],
            "fraud": 0,
        }
    )
    imp_path = os.path.join(tmp, "imp.csv")
    imp_pd.to_csv(imp_path, index=False)
    importance = read_importance(spark, imp_path)
    store = ParquetStateStore(spark, os.path.join(tmp, "state"))
    clock = FixedClock()
    cfg = EngineConfig()

    from pyspark.sql import types as T

    from pyspark_data_engineering_assignment_spark.schemas import (
        TRANSACTION_SCHEMA,
    )

    sections_all = []
    for batch_id in range(n_batches):
        pdf = make_feed(chunk_rows)
        csv_path = os.path.join(tmp, f"b{batch_id}.csv")
        pdf.to_csv(csv_path, index=False)
        batch_df = spark.read.csv(
            csv_path, header=True, schema=TRANSACTION_SCHEMA
        )
        t = {}
        t0 = time.perf_counter()
        if batch_df.isEmpty():
            continue
        t["isEmpty"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        batch_df.persist()
        y_start = clock.now_str()
        merges = [
            (MERCHANT_SUMMARY, merchant_batch_aggregate(batch_df)),
            (
                CUSTOMER_MERCHANT_SUMMARY,
                customer_merchant_batch_aggregate(batch_df),
            ),
            (MERCHANT_GENDER_SUMMARY, gender_pivot_aggregate(batch_df)),
        ]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [
                pool.submit(store.merge_batch, spec, agg, batch_id, now=y_start)
                for spec, agg in merges
            ]
            for f in futs:
                f.result()
        t["merges"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        merchant_state = store.read_state(MERCHANT_SUMMARY)
        cm_state = store.read_state(CUSTOMER_MERCHANT_SUMMARY)
        gender_state = store.read_state(MERCHANT_GENDER_SUMMARY)
        t["read_state_build"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        enriched = enrich_batch(batch_df, importance)
        detections = detect_all(
            merchant_state,
            cm_state,
            gender_state,
            enriched,
            None,
            cfg.thresholds,
            clock,
            y_start,
        )
        n = write_detections(
            detections, os.path.join(tmp, "det"), batch_id, cfg.detection_file_rows
        )
        t["detect_sink"] = time.perf_counter() - t0
        batch_df.unpersist()
        t["total"] = sum(t.values())
        t["n_detections"] = n
        sections_all.append({k: round(v, 3) for k, v in t.items()})
        print(json.dumps({"batch": batch_id, **sections_all[-1]}), flush=True)

    import statistics

    keys = ["isEmpty", "merges", "read_state_build", "detect_sink", "total"]
    med = {
        k: round(statistics.median(s[k] for s in sections_all), 3) for k in keys
    }
    print(json.dumps({"median": med, "chunk_rows": chunk_rows}))


if __name__ == "__main__":
    main()
