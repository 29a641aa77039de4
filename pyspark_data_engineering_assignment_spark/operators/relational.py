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
) -> DataFrame:
    """Exact, oracle-reproducible low-percentile threshold per group.

    Returns one row per group: the largest ``value_col`` whose
    ``percent_rank`` within the group is <= ``fraction``. ``percent_rank``
    is rank-based exact arithmetic ((rank-1)/(n-1)), identical across
    engines - unlike interpolated percentiles, whose float interpolation
    differs in the last ulp between Spark and DuckDB.

    Replaces ``percentile_approx`` (reference ``Mechanism Y.py:86``) where
    golden equality matters. Window + max aggregates: two shuffles on the
    group key, both pre-aggregatable; fine for dimension-sized inputs.
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
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    return (
        df.filter(
            # type-dispatched (guards.py): the isnan arm only exists for
            # float value columns - a date-typed value column cannot be
            # cast to double and would crash at analysis otherwise
            F.col(value_col).isNotNull()
            & not_nan(df, value_col)
        )
        .withColumn("_pr", F.percent_rank().over(w))
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
