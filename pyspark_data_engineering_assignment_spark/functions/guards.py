"""Type-aware validity guards shared by operators.

The round-8 NaN sweep added ``~F.isnan(col.cast("double"))`` arms to
several operators' validity filters. That cast is the wrong tool for
the type dispatch: Spark cannot cast DATE to DOUBLE at all, so an
as-of join on a date-typed timestamp column - a perfectly valid input
that worked before the sweep - failed at analysis time with
AnalysisException (round-8 ADVICE.md medium). Only FloatType/DoubleType
columns can hold NaN in the first place, so the right guard inspects
the column's dataType and emits the ``isnan`` arm only when the type
can actually be NaN; every other type gets a literal-true no-op that
Catalyst folds away.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DoubleType, FloatType


def can_hold_nan(dtype: DataType) -> bool:
    """Only IEEE float types can contain NaN; ints, decimals,
    timestamps, dates, strings cannot."""
    return isinstance(dtype, (FloatType, DoubleType))


def not_nan(df: DataFrame, col: str) -> Column:
    """``True`` when ``df[col]`` is not NaN.

    For non-float types (which cannot hold NaN, and some of which -
    DATE - cannot even be cast to DOUBLE) this is a literal True, so
    composing it into a filter is always analysis-safe and free.
    """
    if can_hold_nan(df.schema[col].dataType):
        return ~F.isnan(F.col(col))
    return F.lit(True)
