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


def _dtype_of(df: DataFrame, col: str) -> DataType:
    """Resolve ``col``'s dataType the way Spark's analyzer would:
    exact match first, then case-insensitive (spark.sql.caseSensitive
    defaults to false, so F.col('Value') legally targets a 'value'
    field - StructType.__getitem__ alone would raise KeyError). On a
    schema with two fields differing only by case, the analyzer raises
    AMBIGUOUS_REFERENCE - mirror that instead of silently guarding
    whichever field happens to come first.

    DELIBERATE divergence from the analyzer (round-10 advisor note):
    an exact-case match wins immediately, even when a second field
    differs only by case - a reference Spark itself would reject as
    AMBIGUOUS_REFERENCE under caseSensitive=false. Mirroring that
    rejection here would make the GUARD the thing that crashes a plan
    the caller never executes; instead the guard resolves the exact
    field and lets the engine raise on the real reference if the plan
    is ever analyzed. test_guards.py pins this exact-match-wins order
    as intended behavior."""
    try:
        return df.schema[col].dataType
    except KeyError:
        low = col.lower()
        matches = [f for f in df.schema.fields if f.name.lower() == low]
        if len(matches) > 1:
            raise ValueError(
                f"ambiguous column reference {col!r}: matches "
                f"{[f.name for f in matches]} case-insensitively"
            ) from None
        if matches:
            return matches[0].dataType
        raise


def valid_vector(col) -> Column:
    """The three-arm embedding validity filter, centralized: the vector
    is non-NULL, holds no NaN element, and holds no NULL element.

    The third arm is load-bearing and easy to forget: ``F.exists(vec,
    isnan)`` IGNORES null elements (measured round 9 - isnan(NULL) is
    NULL and exists treats it as false), so a NULL-holed vector slips
    past the isnan arm into training/candidacy/standardization, where
    its NULL distances sort nulls-first in Spark but nulls-last in
    DuckDB. Round 9 had to add that arm at six call sites; new vector
    operators should take the whole guard from here.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        c.isNotNull()
        & ~F.exists(c, F.isnan)
        & ~F.exists(c, lambda x: x.isNull())
    )


def not_nan(df: DataFrame, col: str) -> Column:
    """``True`` when ``df[col]`` is not NaN.

    For non-float types (which cannot hold NaN, and some of which -
    DATE - cannot even be cast to DOUBLE) this is a literal True, so
    composing it into a filter is always analysis-safe and free.
    """
    if can_hold_nan(_dtype_of(df, col)):
        return ~F.isnan(F.col(col))
    return F.lit(True)
