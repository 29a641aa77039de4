"""Temporal joins Spark lacks as built-ins, composed from DataFrame ops.

As-of join (the time-series workhorse: "for each left row, the latest
right row at or before it, per key"). Spark has no ASOF JOIN; the naive
rewrites are a non-equi theta join (quadratic blow-up per key) or a
per-key subquery (driver loop). The scalable composition used here is
union-tag-window:

    1. tag both sides, union them on aligned schemas,
    2. one shuffle: window partitioned by key, ordered by (time, side)
       with right rows sorting before left rows at equal timestamps
       (so "at or before" includes ties),
    3. ``last(value, ignorenulls=True)`` over the unbounded-preceding
       frame carries each right value forward to the left rows,
    4. keep only left rows.

Cost: ONE hash shuffle + per-key sort - same shape as any windowed
aggregation, no pair blow-up, skew bounded by the hottest key exactly
like a groupBy. This is the standard distributed as-of (what
pandas.merge_asof does per group, re-expressed as a single window pass).

Contract: the right side must be unique per (key, right_ts) - pre-dedup
with ``max_by`` if it isn't (the registry query does) - otherwise which
same-timestamp right row wins is plan-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.functions.guards import not_nan


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Backward as-of left join: every ``left`` row gains ``right_cols``
    from the latest ``right`` row with ``right_ts <= left_ts`` for the
    same key (nulls when no such row exists).

    ``right_cols`` must not collide with ``left`` column names.
    """
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")

    # A right row with no timestamp has no position in the as-of order -
    # left at the window's front it would carry its value forward into
    # EVERY left row of the key that precedes the first real right row
    # (measured: a NULL-ts right row silently matched left rows with no
    # true match). NULL-keyed right rows likewise match nothing, exactly
    # as they would in the equi-join this operator replaces. Left rows
    # keep standard left-join semantics: unmatched (including NULL ts or
    # key) pass through with NULL right values.
    # NaN needs its own arm when the order column is a float: it
    # survives isNotNull and sorts LAST (NaN-is-greatest), so a NaN-ts
    # right row would match NaN-ts left rows (corrupt matching corrupt)
    # - and, worse, a NaN-ts LEFT row would inherit the key's latest
    # right value as if its timestamp were +infinity (handled below).
    # The guard is type-dispatched (functions/guards.py): only float
    # order columns get the isnan arm - timestamps/dates/ints cannot
    # hold NaN, and DATE cannot even be cast to DOUBLE, so a cast-based
    # probe would crash a valid date-typed as-of at analysis time.
    right_valid = F.col(right_ts).isNotNull() & not_nan(right, right_ts)
    for k in key_cols:
        right_valid = right_valid & F.col(k).isNotNull()
    right = right.filter(right_valid)

    left_rest = [c for c in left.columns if c not in key_cols and c != left_ts]

    l_side = left.select(
        *key_cols,
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *left_rest,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right_cols
        ],
    )
    r_side = right.select(
        *key_cols,
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_rest
        ],
        *right_cols,
    )

    # right rows sort before left rows at the same timestamp: a right row
    # AT left_ts is eligible (the <= contract)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_t"), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = l_side.unionByName(r_side)
    # a NaN-ts left row sorts after every real right row and would
    # carry the key's LATEST value forward into itself - but a row
    # with no orderable timestamp has no as-of match, exactly like
    # the NULL-ts left rows (which stay NULL because the window
    # ordering puts them FIRST, before any right row). not_nan is
    # type-dispatched: for non-float _t it returns lit(True), which
    # Catalyst folds the CASE WHEN away entirely.
    for c in right_cols:
        out = out.withColumn(
            c, F.when(not_nan(out, "_t"), F.last(c, ignorenulls=True).over(w))
        )
    return (
        out.filter(F.col("_side") == 0)
        .drop("_side")
        .withColumnRenamed("_t", left_ts)
    )
