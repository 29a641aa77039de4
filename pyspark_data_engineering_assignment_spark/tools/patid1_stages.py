"""Stage-level instrumentation for the flagship ``patid1_upgrade`` plan
(round-13 verdict task #1: the registry's worst scaling curve, e 0.814
-> 0.877 over two rounds; adjudicate WHICH stage grows).

Method (same as round-13's ``queries_build`` adjudication): build each
cumulative sub-plan of the flagship exactly as the registry composes it
(``plans/registry.py`` patid1_upgrade), warm it with one noop write,
then time a second noop write - the warm time isolates plan cost from
JVM/IO warm-up. Stages are CUMULATIVE (each later stage recomputes
``tx``), so the growth attribution is the DELTA between a stage and its
inputs, not the raw number.

Run:  python -m pyspark_data_engineering_assignment_spark.tools.patid1_stages \
          sf1=/root/repo/.scratch/sf1.0 sf10=/root/repo/.scratch/sf10
Emits one JSON line per sf plus a final summary line with per-stage
sf->sf exponents (log10 time ratio per decade, the EXPONENTS_r* fit).
"""

from __future__ import annotations

import json
import math
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.operators.relational import (
    exact_percentile_threshold,
)


def _tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return lineitem.join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"]
    ).select(
        F.col("o_custkey").alias("customer_id"),
        F.col("l_suppkey").alias("merchant_id"),
        F.col("l_discount").alias("weight"),
        F.col("l_returnflag").alias("category"),
    )


def stages(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The flagship's cumulative sub-plans, composed EXACTLY like the
    registry query (any drift here would adjudicate a different plan)."""
    tx = _tx(spark, sf_dir)
    thresholds = exact_percentile_threshold(
        tx, ["merchant_id", "category"], "weight", 0.05, out_col="p1_weight"
    )
    low_weight = (
        tx.alias("t")
        .join(
            thresholds.alias("thr"),
            on=[
                F.col("t.merchant_id") == F.col("thr.merchant_id"),
                F.col("t.category") == F.col("thr.category"),
            ],
        )
        .filter(F.col("t.weight") < F.col("thr.p1_weight"))
        .select(F.col("t.customer_id"), F.col("t.merchant_id"))
        .distinct()
    )
    active_merchants = (
        tx.groupBy("merchant_id").agg(F.count("*").alias("n")).filter(F.col("n") > 5)
    )
    hot_pairs = (
        tx.groupBy("customer_id", "merchant_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 2)
    )
    full = (
        low_weight.join(active_merchants, on="merchant_id", how="left_semi")
        .join(hot_pairs, on=["customer_id", "merchant_id"], how="left_semi")
        .select("customer_id", "merchant_id")
    )
    return {
        "tx": tx,
        "thresholds": thresholds,
        "low_weight": low_weight,
        "active_merchants": active_merchants,
        "hot_pairs": hot_pairs,
        "full": full,
    }


def warm_time(spark: SparkSession, df: DataFrame) -> float:
    df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    spark.catalog.clearCache()
    return round(elapsed, 3)


def main(argv: list[str]) -> None:
    out_path = None
    if argv and argv[0].startswith("--out="):
        out_path = argv[0].split("=", 1)[1]
        argv = argv[1:]
    sf_dirs = dict(a.split("=", 1) for a in argv)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    per_sf: dict[str, dict[str, float]] = {}
    artifact: dict = {"per_sf": per_sf}
    for label, d in sf_dirs.items():
        times = {}
        for name, df in stages(spark, d).items():
            times[name] = warm_time(spark, df)
        per_sf[label] = times
        print(json.dumps({"sf": label, **times}), flush=True)
    labels = list(sf_dirs)
    if len(labels) >= 2:
        lo, hi = labels[0], labels[-1]
        decades = math.log10(
            float(hi.lstrip("sf")) / float(lo.lstrip("sf"))
        )
        exps = {
            name: round(
                math.log10(max(per_sf[hi][name], 1e-3) / max(per_sf[lo][name], 1e-3))
                / decades,
                3,
            )
            for name in per_sf[lo]
        }
        artifact["exponents"] = {"lo": lo, "hi": hi, **exps}
        print(json.dumps({"exponents": exps, "lo": lo, "hi": hi}), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
