"""Local replica of the driver's correctness gate: run each registered
Spark query and its DuckDB oracle on the same parquet tables, compare
row count + column names + order-insensitive values.

Both result sets are fetched through pandas (``DataFrame.toPandas`` /
``duckdb .df()``) because that is how a driver-side value hash sees
them - and the conversions are NOT symmetric: DuckDB renders DECIMAL as
float64 while Spark renders it as ``decimal.Decimal`` objects, and
DuckDB widens ``sum(INT)`` to HUGEINT. Round 1 lost 6 queries to
exactly that class of mismatch while the old ``fetchall`` +
``Decimal.normalize()`` harness stayed green. Canonicalization here is
therefore deliberately STRICT: no decimal normalization, types must
already agree. Registered queries must emit only hash-stable output
types (BIGINT / DOUBLE / STRING); see the fixed-point conventions in
``plans/registry.py``.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb
import numpy as np
import pandas as pd

from pyspark_data_engineering_assignment_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v) -> str:
    """Strict cell canonicalization - intentionally does NOT unify
    Decimal vs float or int vs float: a query whose two sides disagree
    on value *type* must fail here, like it fails the driver's hash."""
    if v is None:
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return repr(f)
    if isinstance(v, decimal.Decimal):
        return str(v)  # strict: Decimal('5.00') != float 5.0
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        t = pd.Timestamp(v)
        if t.tzinfo is not None:
            t = t.tz_convert("UTC").tz_localize(None)
        return t.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rows(pdf: pd.DataFrame) -> list[tuple]:
    out = []
    for row in pdf.itertuples(index=False, name=None):
        out.append(tuple(None if (x is None or x is pd.NaT or (isinstance(x, float) and math.isnan(x))) else x for x in row))
    return out


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_canon(row[i]) for i in order) for row in rows)


def compare_query(spark, con, fn, oracle: str, sf_dir: str) -> tuple[bool, str]:
    spdf = fn(spark, sf_dir).toPandas()
    spark_cols = [c.lower() for c in spdf.columns]
    spark_rows = _rows(spdf)

    dpdf = con.execute(oracle).df()
    duck_cols = [c.lower() for c in dpdf.columns]
    duck_rows = _rows(dpdf)

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    a = normalize_rows(spark_cols, spark_rows)
    b = normalize_rows(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"ok ({len(spark_rows)} rows)"


def oracle_tables_of(sql: str) -> frozenset:
    """Known driver tables an oracle's SQL reads, discovered by a
    case-insensitive FROM/JOIN scan (an oracle written with lowercase
    ``from`` or odd spacing must not silently drop out of the corrupt
    gates). ``test_oracle_conventions.py`` pins that this returns a
    non-empty set for EVERY oracle-bearing registry query, so a query
    that discovery cannot see fails loudly instead of being skipped."""
    import re

    known = frozenset(TABLES)
    found = re.findall(
        r"\b(?:FROM|JOIN)\s+([A-Za-z_][A-Za-z0-9_]*)", sql, re.IGNORECASE
    )
    return frozenset(t.lower() for t in found) & known


def oracle_queries_reading_only(tables: frozenset | set) -> list[str]:
    """Names of oracle-bearing registry queries whose SQL reads ONLY
    the given driver tables - shared by the per-table corrupt-corpus
    parity gates (boundary pins, documents, events, TPC-H star) so the
    FROM/JOIN discovery scan and the known-table set have one
    definition instead of four drifting copies."""
    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    want = frozenset(tables)
    out = []
    for n, s in QUERIES.items():
        sql = s.oracle or s.local_oracle
        if not sql:
            continue
        tabs = oracle_tables_of(sql)
        if tabs and tabs <= want:
            out.append(n)
    return out


def run_parity_gate(spark, con, names: list[str], sf_dir: str) -> list[tuple[str, str]]:
    """Run each named registry query through compare_query, collecting
    (name, message) for every failure or crash - the shared body of the
    corrupt-corpus gates."""
    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    fails = []
    for name in names:
        spec = QUERIES[name]
        sql = spec.oracle or spec.local_oracle
        try:
            ok, msg = compare_query(spark, con, spec.fn, sql, sf_dir)
        except Exception as ex:  # noqa: BLE001 - collect, report all
            ok, msg = False, f"{type(ex).__name__}: {ex}"
        if not ok:
            fails.append((name, msg[:300]))
    return fails
