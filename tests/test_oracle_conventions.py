"""Lint pins for the cross-engine conventions the oracles depend on.

The round-9 try_cast sweep left the guarded money cast defined ~50
times across the oracle SQL strings (a helper would have changed every
registered SQL literal at once - riskier than the sweep itself). These
lints make the duplication safe: any FUTURE oracle that writes the
unguarded form, or any Spark plan that reintroduces the crashing ANSI
cast, reds the suite immediately instead of waiting for a corrupt row.
"""

from __future__ import annotations

import re

from pyspark_data_engineering_assignment_spark.plans import QUERIES

# a plain CAST of a SIMPLE COLUMN to the money decimal - the form that
# throws in DuckDB on NaN and diverges from Spark's try_cast. Outer
# casts of aggregates (CAST(sum(..) AS DECIMAL..)) don't match: the
# argument there starts with a function call, not a bare identifier.
_UNGUARDED_SQL = re.compile(
    r"(?<!TRY_)CAST\(\s*[a-z_][a-z_0-9.]*\s+AS\s+DECIMAL\(18,\s*2\)\)",
    re.IGNORECASE,
)


def test_no_oracle_casts_raw_money_columns_unguarded():
    """Every inner money cast in every oracle must be the NaN-guarded
    TRY_CAST(CASE WHEN isnan(col) THEN NULL ELSE col END AS ...) form:
    DuckDB's plain CAST throws on NaN/1e308 (one corrupt row kills the
    oracle) and its bare TRY_CAST still throws on NaN."""
    offenders = []
    for name, spec in QUERIES.items():
        sql = spec.oracle or spec.local_oracle
        if not sql:
            continue
        m = _UNGUARDED_SQL.search(sql)
        if m:
            offenders.append((name, m.group(0)))
    assert not offenders, (
        "unguarded money casts in oracle SQL (use the TRY_CAST(CASE "
        f"WHEN isnan(..) ..) form): {offenders}"
    )


def test_every_oracle_is_visible_to_corrupt_gate_discovery():
    """The corrupt-corpus parity gates discover their query lists via a
    FROM/JOIN scan in ``oracle_harness.oracle_tables_of``. An oracle the
    scan cannot see (lowercase ``from``, quoted name, odd spacing) would
    silently drop out of EVERY gate, and the gates' count floors only
    catch mass collapse. Pin: discovery sees at least one known driver
    table in every oracle-bearing query's SQL."""
    from tests.oracle_harness import oracle_tables_of

    invisible = []
    for name, spec in QUERIES.items():
        sql = spec.oracle or spec.local_oracle
        if not sql:
            continue
        if not oracle_tables_of(sql):
            invisible.append(name)
    assert not invisible, (
        "oracles invisible to corrupt-gate discovery (FROM/JOIN scan "
        f"found no known table): {invisible}"
    )


def test_no_spark_plan_casts_raw_money_columns_unguarded():
    """Source-level lint over the registry modules: no F.col(..).cast(DEC)
    (or the literal decimal string) on a raw input column - Spark's ANSI
    cast throws NUMERIC_VALUE_OUT_OF_RANGE on NaN/1e308; try_cast skips
    the corrupt observation like the oracles do."""
    import os

    import pyspark_data_engineering_assignment_spark.plans as plans_pkg

    pat = re.compile(r"F\.col\([\"'][a-z_0-9.]+[\"']\)\.cast\((?:DEC\b|\"decimal\(18,2\)\")")
    offenders = []
    root = os.path.dirname(plans_pkg.__file__)
    for fname in os.listdir(root):
        if not fname.endswith(".py"):
            continue
        src = open(os.path.join(root, fname)).read()
        for m in pat.finditer(src):
            offenders.append((fname, m.group(0)))
    assert not offenders, (
        f"raw-column .cast(DEC) in plans source (use .try_cast): {offenders}"
    )
