"""Distinct-count sketching with a cross-engine-deterministic KMV.

``approx_count_distinct`` (HyperLogLog) is the stock answer, but its
estimate depends on Spark's private hash and register layout - no
external engine can reproduce it, so correctness testing degrades to
tolerance assertions. This KMV (k-minimum-values) sketch is built the
other way around: every ingredient is available and bit-identical in
both Spark and DuckDB, so even the *estimate* is oracle-checkable
exactly:

  * element hash = first 8 hex chars of md5 -> uniform 32-bit integer
    (md5 is the one hash function both engines share);
  * sketch = the k smallest distinct hashes per group (one hash-agg
    shuffle, carrying at most k values per group);
  * estimator = (k-1) * 2^32 / h_k, the classic KMV/bottom-k estimate
    (Bar-Yossef et al.); floor'd to BIGINT in both engines.

Standard error ~ 1/sqrt(k-2): k=256 gives ~6%. That bound assumes a
collision-free hash; truncating md5 to 32 bits adds a collision floor -
beyond ~2^16 distinct values per group birthday collisions bias the
estimate low, and the sketch cannot distinguish cardinalities at all
above 2^32. Widen the substring to 16 hex chars (64-bit domain) if
groups approach that range. At 100 TB the sketch is mergeable (union
the bottom-k sets, keep the k smallest), and the shuffle carries
O(groups x k), independent of row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 1 << 32


def kmv_hash(col) -> "F.Column":
    """Uniform integer hash in 1..2^32, reproducible in any engine with
    md5: first 8 hex chars parsed as an integer, plus one. The +1 keeps
    the hash strictly positive so the k-th minimum can never be 0 (KMV's
    estimator divides by it)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long") + 1
    )


def kmv_distinct_estimate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Output: group cols + ``distinct_est`` (BIGINT). Groups with fewer
    than k distinct hashes get the EXACT distinct count (their bottom-k
    set is the full set - the standard KMV small-range fix).

    Plan shape: distinct (hash agg) -> per-group window rank on the hash
    (spill-safe per-group sort) -> filter rank <= k -> final agg. No
    stage ever carries more than k rows per group out of the rank
    filter; never an unbounded collect_set.
    """
    hashed = df.select(*group_cols, kmv_hash(F.col(value_col)).alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    topk = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(F.count("*").alias("n_topk"), F.max("h").alias("kth"))
    )
    est = F.when(F.col("n_topk") < k, F.col("n_topk").cast("long")).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)) / F.col("kth")
        ).cast("long")
    )
    return topk.select(*group_cols, est.alias("distinct_est"))
