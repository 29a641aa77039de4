"""Generic relational helpers used across queries.

Only what queries actually share lives here - individual queries stay
plain DataFrame expressions so Catalyst sees the whole plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.functions.guards import not_nan


def exact_percentile_threshold(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    fraction: float,
    out_col: str = "threshold",
    count_col: str | None = None,
) -> DataFrame:
    """Exact, oracle-reproducible low-percentile threshold per group.

    Returns one row per group: the largest ``value_col`` whose
    ``percent_rank`` within the group is <= ``fraction``. ``percent_rank``
    is rank-based exact arithmetic ((rank-1)/(n-1)), identical across
    engines - unlike interpolated percentiles, whose float interpolation
    differs in the last ulp between Spark and DuckDB.

    Replaces ``percentile_approx`` (reference ``Mechanism Y.py:86``) where
    golden equality matters.

    Round-14 plan change (guide §2.3 "aggregate before you shuffle"):
    the percent_rank window used to SORT every raw row per group - a
    full-width exchange + sort of the fact table (the flagship's worst
    stage: 101.9s standalone at sf10, fitted exponent 1.36). All rows
    holding the same value share one rank, and the downstream filter
    only needs per-VALUE percent_rank, so the rank is now computed on
    the ``(group, value, count)`` histogram: a hash aggregate (partial
    map-side combine shrinks the exchange to distinct values - e.g. 11
    distinct discounts per (merchant, category) vs every lineitem row)
    followed by a window over the histogram rows only.

    Value equivalence is exact, not approximate: ``percent_rank() =
    (rank - 1) / (n - 1)`` where ``rank - 1`` is the count of rows
    strictly before, i.e. ``count(value < v)`` under ``ORDER BY value``
    with ties sharing the first row's rank. The rewrite computes the
    identical integer ``count(< v)`` via a strict-predecessor running
    sum over the histogram and performs the same double division (and
    Spark's n == 1 -> 0.0 special case), so every value's percent_rank
    is bit-identical to the window form and the ``<= fraction``
    boundary behaviour cannot drift.

    ``count_col``: when the input is ALREADY row-count-aggregated (each
    df row represents ``count_col`` original rows - e.g. a shared base
    aggregate feeding several consumers), the histogram sums that
    column instead of counting rows; ranks are then computed over the
    original row multiset exactly as if the raw rows had been passed.
    """
    # NULL values must not enter the rank: Spark orders them FIRST, so
    # they would occupy percent_rank 0..k and push every real value's
    # rank upward - a silently inflated threshold (DuckDB additionally
    # orders NULLs LAST, so the engines would disagree). A NULL has no
    # rank in a value distribution; SQL aggregates skip it, and so do we.
    # NaN survives isNotNull and sorts ABOVE every real value, so it
    # would stretch the rank denominator (deflating every real value's
    # percent_rank) and at fraction=1.0 become the threshold itself -
    # NaN, which no real value compares to. No rank for NaN either.
    hist = (
        df.filter(
            # type-dispatched (guards.py): the isnan arm only exists for
            # float value columns - a date-typed value column cannot be
            # cast to double and would crash at analysis otherwise
            F.col(value_col).isNotNull()
            & not_nan(df, value_col)
        )
        .groupBy(*group_cols, value_col)
        .agg(
            (F.sum(count_col) if count_col else F.count("*")).alias("_c")
        )
    )
    w_before = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_group = Window.partitionBy(*group_cols)
    n = F.sum("_c").over(w_group)
    before = F.coalesce(F.sum("_c").over(w_before), F.lit(0).cast("long"))
    pr = F.when(
        n > 1, before.cast("double") / (n - F.lit(1)).cast("double")
    ).otherwise(F.lit(0.0))
    return (
        hist.withColumn("_pr", pr)
        .filter(F.col("_pr") <= fraction)
        .groupBy(*group_cols)
        .agg(F.max(value_col).alias(out_col))
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list,
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Deterministic per-group top-k via row_number. Callers must make
    ``order_exprs`` a total order (tie-break on a key column) or the
    result is nondeterministic under retries. ``rank_col`` keeps the
    1-based rank in the output; None drops it."""
    w = Window.partitionBy(*group_cols).orderBy(*order_exprs)
    out = df.withColumn(rank_col or "_rn", F.row_number().over(w)).filter(
        F.col(rank_col or "_rn") <= k
    )
    return out if rank_col else out.drop("_rn")
