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


# Smallest positive magnitude NOT representable in DECIMAL(18,2) - the
# reference state schema's money type (``sql/postgres_tables.sql:14``).
MONEY_CAP = 10**16


def money_dec(col, colname: str = "amount") -> Column:
    """The Float -> DECIMAL(18,2) money seam (survey §1.3), with the
    round-13 overflow contract:

    * NULL / NaN -> NULL - a NON-VALUE stays out of sums (round-8 NaN
      axis adjudication; the oracle side mirrors with TRY_CAST);
    * finite overflow (|amount| >= 10^16) -> LOUD per-row error, raised
      by an explicit guard so it fires regardless of
      ``spark.sql.ansi.enabled``. Pre-fix this path used ``try_cast``
      alone, which silently NULLed an oversized FINITE amount and the
      batch sum dropped real money - the exact failure the reference's
      Postgres NUMERIC(18,2) column refuses with 'numeric field
      overflow' (``Mechanism Y.py:40`` money lands in
      ``postgres_tables.sql:14``). A non-value carries no information;
      an out-of-range value is data the schema cannot hold, and only
      the second one may abort the stream.
    """
    c = F.col(col) if isinstance(col, str) else col
    # The overflow probe runs in the DOUBLE domain via try_cast so the
    # guard composes with any money input type (round-13 advice): a bare
    # F.isnan(c) fails at ANALYSIS time for non-float columns (decimal,
    # string), unlike the sibling ``not_nan`` which type-dispatches.
    # try_cast never raises (ANSI-independent); a double column passes
    # through unchanged, a decimal can never be NaN, and a non-numeric
    # string try_casts to NULL - all land in the non-overflow arm, where
    # the existing ``try_cast(decimal)`` NULL contract takes over.
    d = c.try_cast("double")
    overflow = d.isNotNull() & ~F.isnan(d) & (F.abs(d) >= F.lit(float(MONEY_CAP)))
    return F.when(
        overflow,
        F.raise_error(
            F.concat(
                F.lit(f"money overflow: {colname} "),
                c.cast("string"),
                F.lit(" exceeds DECIMAL(18,2); the reference NUMERIC(18,2)"
                      " column refuses this row ('numeric field overflow')"),
            )
        ).cast("decimal(18,2)"),
    ).otherwise(c.try_cast("decimal(18,2)"))


def checked_money_total(sum_col: Column, label: str, precision: int = 18,
                        scale: int = 2) -> Column:
    """Narrow an aggregated money SUM (decimal(p+10, s)) back to the
    state schema's DECIMAL(p, s) with an ANSI-independent overflow
    check: a cumulative total the column cannot hold raises loudly
    instead of depending on the session's ``spark.sql.ansi.enabled``
    (ANSI off turns the same cast into a silent NULL - cumulative
    state corruption, the worst failure an additive store can have).
    """
    cap = 10 ** (precision - scale)
    return F.when(
        sum_col.isNotNull() & (F.abs(sum_col) >= F.lit(cap)),
        F.raise_error(
            F.concat(
                F.lit(f"money overflow: {label} total "),
                sum_col.cast("string"),
                F.lit(f" exceeds DECIMAL({precision},{scale}); refusing the"
                      " merge (reference parity: Postgres NUMERIC raises"
                      " 'numeric field overflow')"),
            )
        ).cast(f"decimal({precision},{scale})"),
    ).otherwise(sum_col.cast(f"decimal({precision},{scale})"))
