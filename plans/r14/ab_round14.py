"""Round-14 optimization A/Bs: baseline (pre-change plan, inlined below
exactly as committed at r13/r14-head) vs variant (current registry code),
interleaved min-of-3 per scale dir (BENCH_AB_r14.json protocol).

Usage: python plans/r14/ab_round14.py <case> [sf_label=dir ...]
Cases: patid1 | winsor | boiler | boiler_spread | sole
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.plans import QUERIES
from pyspark_data_engineering_assignment_spark.plans.registry import _t, _ts, DEC
from pyspark_data_engineering_assignment_spark.session import get_spark
from pyspark_data_engineering_assignment_spark.tools.query_ab import ab


# --- baselines: the r13/r14-head plans, verbatim ---------------------------

def baseline_patid1(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    tx = lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"]).select(
        F.col("o_custkey").alias("customer_id"),
        F.col("l_suppkey").alias("merchant_id"),
        F.col("l_discount").alias("weight"),
        F.col("l_returnflag").alias("category"),
    )
    w = Window.partitionBy("merchant_id", "category").orderBy("weight")
    thresholds = (
        tx.filter(F.col("weight").isNotNull() & ~F.isnan("weight"))
        .withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") <= 0.05)
        .groupBy("merchant_id", "category")
        .agg(F.max("weight").alias("p1_weight"))
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
    pair_counts = tx.groupBy("customer_id", "merchant_id").agg(
        F.count("*").alias("n")
    )
    hot_pairs = pair_counts.filter(F.col("n") > 2).select(
        "customer_id", "merchant_id"
    )
    active_merchants = (
        pair_counts.groupBy("merchant_id")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") > 5)
        .select("merchant_id")
    )
    return (
        low_weight.join(active_merchants, on="merchant_id", how="left_semi")
        .join(hot_pairs, on=["customer_id", "merchant_id"], how="left_semi")
        .select("customer_id", "merchant_id")
    )


def baseline_winsor(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    cents = (F.col("value").try_cast(DEC) * 100).cast("long")
    c = e.select("event_type", cents.alias("cents")).filter(
        F.col("cents").isNotNull()
    )
    wr = Window.partitionBy("event_type").orderBy("cents")
    ranked = c.withColumn("cd", F.cume_dist().over(wr))
    bounds = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("cd") >= 0.10, F.col("cents"))).alias("lo"),
        F.min(F.when(F.col("cd") >= 0.90, F.col("cents"))).alias("hi"),
    )
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("cents")))
    return (
        c.join(F.broadcast(bounds), on="event_type")
        .groupBy(
            "event_type",
            F.col("lo").cast("long").alias("p10_cents"),
            F.col("hi").cast("long").alias("p90_cents"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(clamped).cast("long").alias("winsorized_sum_cents"),
        )
        .select(
            "event_type", "n", "p10_cents", "p90_cents", "winsorized_sum_cents"
        )
    )


def baseline_boiler(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_data_engineering_assignment_spark.functions.text import (
        tokens,
        word_ngrams_of,
    )

    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id"), tokens(F.col("text")).alias("_t")
    ).select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams_of(F.col("_t"), 8))).alias(
            "shingle"
        ),
    )
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_docs"))
        .filter(F.col("_docs") >= 3)
        .select("shingle")
        .withColumn("_hot", F.lit(1).cast("long"))
    )
    return (
        sh.join(hot, on="shingle", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hot"), F.lit(0)))
            .cast("long")
            .alias("n_boilerplate"),
        )
    )


def variant_boiler_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        boilerplate_shingles,
    )

    d = _ts(spark, sf_dir, "documents")
    return boilerplate_shingles(d, n=8, min_docs=3)


def baseline_sole(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    a = (
        l.select("l_orderkey", "l_suppkey", "l_returnflag")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("_failed")
        )
    )
    f = a.filter(F.col("_failed") == 1).select("l_orderkey", "l_suppkey")
    a = a.select("l_orderkey", "l_suppkey")
    l1 = f.alias("l1")
    other_supplier_present = l1.join(
        a.alias("l2"),
        on=[
            F.col("l1.l_orderkey") == F.col("l2.l_orderkey"),
            F.col("l1.l_suppkey") != F.col("l2.l_suppkey"),
        ],
        how="left_semi",
    )
    sole_failure = other_supplier_present.alias("l1").join(
        f.alias("l3"),
        on=[
            F.col("l1.l_orderkey") == F.col("l3.l_orderkey"),
            F.col("l1.l_suppkey") != F.col("l3.l_suppkey"),
        ],
        how="left_anti",
    )
    return (
        sole_failure.join(
            s, F.col("l_suppkey") == s["s_suppkey"]
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


CASES = {
    "patid1": (baseline_patid1, lambda sp, d: QUERIES["patid1_upgrade"].fn(sp, d)),
    "winsor": (
        baseline_winsor,
        lambda sp, d: QUERIES["value_winsorized_stats"].fn(sp, d),
    ),
    "boiler": (
        baseline_boiler,
        lambda sp, d: QUERIES["doc_boilerplate_shingles"].fn(sp, d),
    ),
    "boiler_spread": (baseline_boiler, variant_boiler_spread),
    "sole": (
        baseline_sole,
        lambda sp, d: QUERIES["sole_failing_suppliers"].fn(sp, d),
    ),
}


def main() -> None:
    case = sys.argv[1]
    sf_dirs = dict(a.split("=", 1) for a in sys.argv[2:]) or {
        "sf0.1": "/root/testdata/sf0.1"
    }
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(app_name=f"ab_{case}")
    spark.sparkContext.setLogLevel("ERROR")
    b, v = CASES[case]
    # parity first: the variant must return the same rows as the baseline
    for label, d in sf_dirs.items():
        bd, vd = b(spark, d), v(spark, d)
        same = (
            bd.exceptAll(vd).isEmpty() and vd.exceptAll(bd).isEmpty()
        )
        print(json.dumps({"case": case, "sf": label, "parity": bool(same)}), flush=True)
        if not same:
            raise SystemExit(f"PARITY FAILURE at {label}")
    result = ab(spark, sf_dirs, b, v, reps=3)
    print(json.dumps({"case": case, **result}), flush=True)


if __name__ == "__main__":
    main()
