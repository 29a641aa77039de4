"""Range join: points to containing intervals, without the theta-join trap.

Spark plans a plain ``point >= lo AND point < hi`` join as
BroadcastNestedLoopJoin (fine when one side is tiny) or falls back to a
cartesian - quadratic at scale. The scalable composition here is
interval bucketing:

    1. pick a bucket width; each point lands in bucket
       ``floor(point / width)``,
    2. each interval explodes to every bucket it overlaps
       (``sequence(floor(lo/w), ceil(hi/w) - 1)`` for half-open
       ``[lo, hi)``) - the blow-up factor is bounded by
       ``interval_width / bucket_width + 1``,
    3. hash equi-join on the bucket, then the exact range predicate
       filters boundary buckets.

A (point, interval) match occurs in exactly one bucket (the point's),
so no dedup pass is needed. Cost: one equi-join shuffle sized
O(points + intervals x overlap_factor) - pick the width near the median
interval length to keep the factor ~2. This is the same strategy
Databricks' range-join hint and PostGIS grid indexes use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.functions.guards import not_nan


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner-join each point row to every interval row whose half-open
    ``[lo_col, hi_col)`` contains ``point_col``. Column sets must be
    disjoint apart from the join artifacts."""
    clash = (set(points.columns) & set(intervals.columns)) | (
        {"_bucket"} & (set(points.columns) | set(intervals.columns))
    )
    if clash:
        raise ValueError(f"column clash: {sorted(clash)}")

    p = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    # An empty or inverted interval (hi <= lo) matches no point under the
    # half-open predicate - but F.sequence(start, stop) with start > stop
    # generates a DESCENDING sequence, so one corrupt inverted interval
    # exploded into |lo-hi|/width bucket rows (measured: 10M rows from a
    # single row) before the exact filter could reject them. Drop such
    # intervals first; provably output-neutral. NULL bounds already match
    # nothing (sequence(NULL,..) -> NULL explodes to no rows). NaN
    # bounds do NOT: NaN > lo is TRUE under Spark's NaN-is-greatest
    # comparisons, floor(NaN).cast(long) is 0 (non-ANSI), and v < NaN
    # is true for every v - so a NaN-hi interval passed the guard and
    # MATCHED real points, but only those inside its descending
    # 0-anchored bucket range (measured: [4, NaN) matched v=5 and
    # missed v=50 - wrong twice over). A NaN bound is corrupt: the
    # interval matches nothing. (A NaN POINT is already safe: its
    # v < hi arm is false against every interval.)
    i = intervals.filter(
        # not_nan is type-dispatched (guards.py): non-float bound types
        # cannot hold NaN and skip the isnan arm entirely
        (F.col(hi_col) > F.col(lo_col))
        & not_nan(intervals, lo_col)
        & not_nan(intervals, hi_col)
    ).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                (F.ceil(F.col(hi_col) / bucket_width) - 1).cast("long"),
            )
        ),
    )
    return (
        p.join(i, on="_bucket")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_bucket")
    )
