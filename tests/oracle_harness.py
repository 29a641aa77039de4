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
    # Round-15: the Spark side runs in a helper thread while the DuckDB
    # side executes in the calling thread - for a heavy query (e.g. the
    # 200 KB-doc winnowing sweep: ~30 s Spark + ~84 s single-threaded
    # DuckDB lambdas) the wall time becomes max() instead of sum().
    # Identical comparison semantics; a Spark-side exception surfaces
    # through future.result() exactly as it did inline.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        sp_fut = pool.submit(lambda: fn(spark, sf_dir).toPandas())
        dpdf = con.execute(oracle).df()
        spdf = sp_fut.result()
    spark_cols = [c.lower() for c in spdf.columns]
    spark_rows = _rows(spdf)

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


def run_parity_gate(
    spark, con, names: list[str], sf_dir: str, workers: int = 8
) -> list[tuple[str, str]]:
    """Run each named registry query through compare_query, collecting
    (name, message) for every failure or crash - the shared body of the
    corrupt-corpus gates.

    Round-15: queries run from a small thread pool. The gates' wall
    time was dominated by the ORACLE side running one single-threaded
    DuckDB list-lambda query at a time while 32 cores idled (the
    200 KB-doc sweep alone was ~285 s of a ~34 min full suite).
    Spark's scheduler happily serves concurrent driver threads, and
    each worker gets its own ``con.cursor()`` - a separate DuckDB
    connection to the same in-memory catalog (the non-temp views the
    gates create are shared), which is DuckDB's documented
    multi-threading model. Results are collected in ``names`` order,
    and per-query exceptions are caught exactly as before, so the
    verdict and its reporting are unchanged - only the overlap is new.
    ``workers=1`` restores the serial path."""
    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    def one(name: str) -> tuple[str, str] | None:
        spec = QUERIES[name]
        sql = spec.oracle or spec.local_oracle
        cur = con.cursor()
        try:
            ok, msg = compare_query(spark, cur, spec.fn, sql, sf_dir)
        except Exception as ex:  # noqa: BLE001 - collect, report all
            ok, msg = False, f"{type(ex).__name__}: {ex}"
        finally:
            cur.close()
        return None if ok else (name, msg[:300])

    if workers <= 1 or len(names) <= 1:
        return [r for r in map(one, names) if r]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(workers, len(names))) as pool:
        return [r for r in pool.map(one, names) if r]
