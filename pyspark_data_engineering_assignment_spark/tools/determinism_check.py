"""Cross-engine determinism check at arbitrary scale.

Runs registered queries through the SAME strict rows+schema+value-hash
compare the driver's gate uses (tests/oracle_harness.py), against any
sf directory - including `tools/scaleup.py` outputs, whose per-table
parquet is a DIRECTORY of part files (globbed here; the driver's own
single-file dirs work unchanged).

This is how SCALING.md's "hash-exact at sf10" table was produced: the
fixed-point/decimal-domain conventions exist so results are independent
of data volume, partitioning and engine, and this tool is the direct
check. Usage::

    python -m pyspark_data_engineering_assignment_spark.tools.determinism_check \
        --sf-dir /root/repo/.scratch/sf10 --queries pricing_summary,...

Defaults to a 14-query family sample (scan-agg, joins, windows, as-of,
SCD2/CDC, sketches-audit, iterative k-means, tf-idf, LSH audit).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import duckdb

from pyspark_data_engineering_assignment_spark.plans import QUERIES
from pyspark_data_engineering_assignment_spark.session import get_spark
from pyspark_data_engineering_assignment_spark.sources.tables import TABLES

DEFAULT_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "events_hourly",
    "patid2_child",
    "dedup_clusters",
    "flat_sales_export",
    "minhash_lsh_neardup",
    "user_value_ewma",
    "purchase_asof_click",
    "user_status_scd2",
    "user_cdc_state",
    "user_heavy_hitters_cms",
    "embedding_kmeans_cells",
    "doc_tfidf_topterms",
]


def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    from tests.oracle_harness import compare_query

    spark = get_spark(app_name="determinism_check")
    con = connect(args.sf_dir)
    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES
    fails = []
    for name in names:
        spec = QUERIES[name]
        sql = spec.oracle or spec.local_oracle
        if sql is None:
            print(json.dumps({"q": name, "skip": "no oracle"}), flush=True)
            continue
        t0 = time.perf_counter()
        ok, msg = compare_query(spark, con, spec.fn, sql, args.sf_dir)
        print(
            json.dumps(
                {
                    "q": name,
                    "ok": ok,
                    "msg": msg[:120],
                    "s": round(time.perf_counter() - t0, 1),
                }
            ),
            flush=True,
        )
        if not ok:
            fails.append(name)
    print(json.dumps({"sf_dir": args.sf_dir, "checked": len(names), "fails": fails}))
    raise SystemExit(1 if fails else 0)


if __name__ == "__main__":
    main()
