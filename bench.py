#!/usr/bin/env python
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Execution is measured with the noop sink so the full plan runs (scan ->
shuffle -> agg/join) without collect() or file-write overhead skewing the
numbers. One warmup action amortizes JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark_data_engineering_assignment_spark.plans import QUERIES
from pyspark_data_engineering_assignment_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="bench")
    # warmup: trigger JVM init + parquet footer reads
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    times: dict[str, float] = {}
    for name, spec in sorted(QUERIES.items()):
        df = spec.fn(spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    lineitem_rows = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "registry_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
        "n_queries": len(times),
        "lineitem_rows": lineitem_rows,
        "rows_per_sec_pricing_summary": (
            round(lineitem_rows / times["pricing_summary"]) if times.get("pricing_summary") else None
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
