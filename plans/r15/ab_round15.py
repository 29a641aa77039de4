"""Round-15 A/B experiments (optimization round 2 of 2).

Each experiment inlines the BASELINE plan verbatim (as committed at the
start of round 15) next to the VARIANT, checks row-level parity
(exceptAll both directions) at every scale dir BEFORE timing, then runs
the interleaved min-of-N protocol from
pyspark_data_engineering_assignment_spark.tools.query_ab.

Usage:
    python plans/r15/ab_round15.py <experiment> [reps] [sf_label=dir ...]
Default dirs: sf0.1=/root/testdata/sf0.1 sf1=.scratch/sf1.0 sf10=.scratch/sf10
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pyspark_data_engineering_assignment_spark.operators.relational import (  # noqa: E402
    exact_percentile_threshold,
)
from pyspark_data_engineering_assignment_spark.tools.query_ab import ab  # noqa: E402

DEFAULT_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(REPO, ".scratch", "sf1.0"),
    "sf10": os.path.join(REPO, ".scratch", "sf10"),
}


# ---------------------------------------------------------------------------
# flagship: patid1_upgrade
# ---------------------------------------------------------------------------

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


def patid1_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim copy of plans/registry.py::patid1_upgrade at r15 start."""
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


def patid1_qualified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1: decide with small rows (guide §8 / §3.2).

    The result is bounded by hot pairs (n > 2), which at sf10 are RARE
    (pair counts are nearly row-unique). So: derive the qualified pair
    set first (hot pair AND active merchant - both from ONE pair
    aggregate), semi-filter the raw tx probe rows down to those pairs
    BEFORE the thresholds join, and take the tiny distinct at the end.
    Removes: the full-width low_weight DISTINCT exchange (5% of tx), the
    low_weight-by-merchant exchange, and the final (c,m) re-exchange.
    Set-equivalence: result = {(c,m): pair hot, merchant active,
    exists tx row with weight < p1(m,cat)} in both forms; NULL-keyed
    rows can never match an equality semi join in either form.
    """
    tx = _tx(spark, sf_dir)
    thresholds = exact_percentile_threshold(
        tx, ["merchant_id", "category"], "weight", 0.05, out_col="p1_weight"
    )
    pair_counts = tx.groupBy("customer_id", "merchant_id").agg(
        F.count("*").alias("n")
    )
    active_merchants = (
        pair_counts.groupBy("merchant_id")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") > 5)
        .select("merchant_id")
    )
    qualified = (
        pair_counts.filter(F.col("n") > 2)
        .select("customer_id", "merchant_id")
        .join(active_merchants, on="merchant_id", how="left_semi")
    )
    cand = tx.join(
        qualified, on=["customer_id", "merchant_id"], how="left_semi"
    )
    return (
        cand.alias("t")
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


def patid1_qualified_pairs_persist_tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2: V1 + persist() of the tx join (re-test of the r7 rejection
    under the restructured assembly). NOTE: caller must clearCache
    between runs (query_ab does)."""
    from pyspark import StorageLevel

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    tx = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("l_suppkey").alias("merchant_id"),
            F.col("l_discount").alias("weight"),
            F.col("l_returnflag").alias("category"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    thresholds = exact_percentile_threshold(
        tx, ["merchant_id", "category"], "weight", 0.05, out_col="p1_weight"
    )
    pair_counts = tx.groupBy("customer_id", "merchant_id").agg(
        F.count("*").alias("n")
    )
    active_merchants = (
        pair_counts.groupBy("merchant_id")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") > 5)
        .select("merchant_id")
    )
    qualified = (
        pair_counts.filter(F.col("n") > 2)
        .select("customer_id", "merchant_id")
        .join(active_merchants, on="merchant_id", how="left_semi")
    )
    cand = tx.join(
        qualified, on=["customer_id", "merchant_id"], how="left_semi"
    )
    return (
        cand.alias("t")
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


# ---------------------------------------------------------------------------
# flat_sales_export: Expand(x3) exact distinct vs two-level pre-aggregation
# ---------------------------------------------------------------------------

def _flat(spark: SparkSession, sf_dir: str):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    rev_e4 = (
        F.col("l_extendedprice").try_cast("decimal(18,2)")
        * (1 - F.col("l_discount").try_cast("decimal(18,2)"))
        * 10000
    ).cast("long")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    sn = n.select(F.col("n_nationkey").alias("s_nk"))
    flat = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r["r_regionkey"])
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(p, F.col("l_partkey") == p["p_partkey"])
    )
    return flat, rev_e4


def flat_sales_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat, rev_e4 = _flat(spark, sf_dir)
    return flat.groupBy(
        F.col("r_name").alias("region"), F.col("p_brand").alias("brand")
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum(rev_e4).cast("long").alias("revenue_e4"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


def flat_sales_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level exact distinct: base stats in one plain aggregate (no
    Expand), each countDistinct as its own (group, key) pre-aggregate
    re-counted per group. count(key) at level 2 skips the NULL-key
    level-1 row, matching countDistinct's NULL exclusion; every branch
    aggregates the SAME flat join so the group sets are identical and
    inner joins are exact."""
    flat, rev_e4 = _flat(spark, sf_dir)
    gb = [F.col("r_name").alias("region"), F.col("p_brand").alias("brand")]
    base = flat.groupBy(*gb).agg(
        F.count("*").alias("n_rows"),
        F.sum(rev_e4).cast("long").alias("revenue_e4"),
    )
    cust = (
        flat.select(F.col("r_name").alias("region"),
                    F.col("p_brand").alias("brand"), "o_custkey")
        .distinct()
        .groupBy("region", "brand")
        .agg(F.count("o_custkey").alias("n_customers"))
    )
    supp = (
        flat.select(F.col("r_name").alias("region"),
                    F.col("p_brand").alias("brand"), "l_suppkey")
        .distinct()
        .groupBy("region", "brand")
        .agg(F.count("l_suppkey").alias("n_suppliers"))
    )
    return (
        base.join(cust, on=["region", "brand"])
        .join(supp, on=["region", "brand"])
        .select(
            "region", "brand", "n_rows", "revenue_e4",
            "n_customers", "n_suppliers",
        )
    )


# ---------------------------------------------------------------------------
# minhash_lsh_neardup: fused shingle hashing (no shingle-array boundary)
# ---------------------------------------------------------------------------

def minhash_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        minhash_lsh_near_duplicates,
    )
    from pyspark_data_engineering_assignment_spark.sources.tables import load_table

    return minhash_lsh_near_duplicates(
        load_table(spark, sf_dir, "documents", spread_cpu=True),
        num_hashes=48,
        bands=12,
        jaccard_threshold=0.7,
        hash_fn="md5",
    )


def minhash_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        minhash_lsh_near_duplicates,
    )
    from pyspark_data_engineering_assignment_spark.sources.tables import load_table

    return minhash_lsh_near_duplicates(
        load_table(spark, sf_dir, "documents", spread_cpu=True),
        num_hashes=48,
        bands=12,
        jaccard_threshold=0.7,
        hash_fn="md5",
        fused_shingles=True,
    )


EXPERIMENTS = {
    "patid1_v1": (patid1_baseline, patid1_qualified_pairs),
    "patid1_v2": (patid1_baseline, patid1_qualified_pairs_persist_tx),
    "patid1_v1_vs_v2": (patid1_qualified_pairs, patid1_qualified_pairs_persist_tx),
    "flat_sales_twolevel": (flat_sales_baseline, flat_sales_twolevel),
    "minhash_fused": (minhash_baseline, minhash_fused),
}


def parity(spark, base_fn, var_fn, label, d) -> dict:
    b = base_fn(spark, d)
    v = var_fn(spark, d)
    extra = v.exceptAll(b).count()
    missing = b.exceptAll(v).count()
    spark.catalog.clearCache()
    ok = extra == 0 and missing == 0
    return {"sf": label, "extra": extra, "missing": missing, "ok": ok}


def main(argv: list[str]) -> None:
    name = argv[0]
    reps = int(argv[1]) if len(argv) > 1 and argv[1].isdigit() else 3
    dirs = (
        dict(a.split("=", 1) for a in argv[2:])
        if len(argv) > 2
        else DEFAULT_DIRS
    )
    dirs = {k: v for k, v in dirs.items() if os.path.isdir(v)}
    base_fn, var_fn = EXPERIMENTS[name]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"experiment": name, "parity": [], "ab": None}
    for label, d in dirs.items():
        p = parity(spark, base_fn, var_fn, label, d)
        out["parity"].append(p)
        print(json.dumps(p), flush=True)
        if not p["ok"]:
            print(json.dumps(out))
            return
    if name in EAGER:
        out["ab"] = ab_eager(spark, dirs, base_fn, var_fn, reps=reps)
    else:
        out["ab"] = ab(spark, dirs, base_fn, var_fn, reps=reps)
    print(json.dumps(out), flush=True)
    with open(
        os.path.join(REPO, "plans", "r15", f"AB_{name}.json"), "w"
    ) as fh:
        json.dump(out, fh, indent=1)
    spark.stop()



# ---------------------------------------------------------------------------
# kmeans_fixedpoint: per-round argmin aggregate vs hoisted-dedup projection
# (baseline = the round-14 operator body, inlined verbatim)
# ---------------------------------------------------------------------------

def kmeans_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from pyspark_data_engineering_assignment_spark.functions.guards import (
        valid_vector,
    )
    from pyspark_data_engineering_assignment_spark.operators.clustering import (
        _fixpoint,
        _sqdist,
    )

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    id_col, vec_col, n_cells, iters = "vec_id", "embedding", 8, 3
    v = df.filter(
        valid_vector(vec_col) & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("vid"), _fixpoint(F.col(vec_col)).alias("v")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    seeds = (
        v.withColumn("_h", F.md5(F.col("vid").cast("string")))
        .orderBy("_h", "vid")
        .limit(n_cells)
        .collect()
    )
    centroids = [list(r["v"]) for r in seeds]
    n_cells = min(n_cells, len(centroids))

    def assign(cents):
        cent_df = spark.createDataFrame(
            [(ci, cents[ci]) for ci in range(len(cents))],
            "cell long, c array<bigint>",
        )
        pairs = v.crossJoin(F.broadcast(cent_df))
        return (
            pairs.select(
                "vid", "v", _sqdist(F.col("v"), F.col("c")).alias("_d"), "cell"
            )
            .groupBy("vid", "v")
            .agg(
                F.min_by(
                    F.col("cell"), F.struct(F.col("_d"), F.col("cell"))
                ).alias("cell")
            )
        )

    for _ in range(iters):
        sums = (
            assign(centroids)
            .select("cell", F.posexplode("v").alias("d", "val"))
            .groupBy("cell", "d")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .select("cell", "d", F.expr("(s - pmod(s, n)) div n").alias("m"))
        )
        rows = (
            sums.groupBy("cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("d", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
            .collect()
        )
        got = {int(r["cell"]): list(r["c"]) for r in rows}
        centroids = [got.get(ci, centroids[ci]) for ci in range(n_cells)]

    final = assign(centroids)
    counts = final.groupBy("cell").agg(F.count("*").alias("n_vectors"))
    cent_df = spark.createDataFrame(
        [(ci, centroids[ci]) for ci in range(n_cells)],
        "cell long, centroid array<bigint>",
    )
    out = cent_df.join(counts, on="cell", how="left").select(
        "cell",
        F.coalesce("n_vectors", F.lit(0)).cast("long").alias("n_vectors"),
        "centroid",
    )
    # NOTE: leaks the persist until clearCache (query_ab clears between runs)
    return out


def kmeans_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_data_engineering_assignment_spark.operators.clustering import (
        kmeans_fixedpoint,
    )

    return kmeans_fixedpoint(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        n_cells=8,
        iters=3,
    )


EXPERIMENTS["kmeans_projassign"] = (kmeans_baseline, kmeans_variant)


def ab_eager(spark, sf_dirs, baseline, variant, reps=3):
    """Interleaved min-of-N for EAGER queries (work happens inside the
    builder fn, e.g. k-means training collects): each rep times
    build + noop materialization together, clearing the cache between
    runs."""
    import time

    def run_once(fn, d):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, d)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return round(dt, 3)

    out = {}
    for label, d in sf_dirs.items():
        run_once(baseline, d)  # untimed JIT warmup
        run_once(variant, d)
        b, v = [], []
        for _ in range(reps):
            b.append(run_once(baseline, d))
            v.append(run_once(variant, d))
        out[label] = {
            "baseline": b, "variant": v,
            "baseline_min": min(b), "variant_min": min(v),
        }
    return out


EAGER = {"kmeans_projassign"}

if __name__ == "__main__":
    main(sys.argv[1:])
