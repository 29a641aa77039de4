"""External-RDBMS state backend: the reference's UPSERT protocol, verbatim.

The reference keeps cumulative state in PostgreSQL and merges each batch
with driver-side ``INSERT ... SELECT ... FROM temp ON CONFLICT (key) DO
UPDATE SET counter = counter + EXCLUDED.counter`` (``Mechanism Y.py:
147-160``, ``:172-180``, ``:195-203``; DDL ``sql/postgres_tables.sql``).
This backend preserves that contract against an embedded DuckDB database
(no PostgreSQL/JDBC driver ships in this environment; DuckDB speaks the
same ``ON CONFLICT`` dialect), behind the same ``StateStore`` interface
as ``ParquetStateStore`` - so the pipeline can swap backends untouched.

Two deliberate fixes over the reference, matching the parquet backend:
  * merges are idempotent by batch_id (an ``_applied_batches`` ledger
    updated in the same transaction as the UPSERT - the reference
    double-counts on replay, survey §7.4.2);
  * null counters coalesce to 0 on BOTH sides of the addition
    (the reference coalesces only the stored side, ``:178``).

Scale honesty: per-batch aggregates cross the driver here (the reference
shipped them through a JDBC temp table; same boundary). That is fine for
dimension-sized aggregate rows and true to the reference architecture -
the 100 TB path is ``ParquetStateStore`` / Delta ``MERGE``, where the
merge runs as a distributed join.
"""

from __future__ import annotations

import decimal

import duckdb

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DataType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
)

from pyspark_data_engineering_assignment_spark.state.store import StateTableSpec


def _ddl_type(dt: DataType) -> str:
    if isinstance(dt, StringType):
        return "VARCHAR"
    if isinstance(dt, IntegerType):
        return "INTEGER"
    if isinstance(dt, LongType):
        return "BIGINT"
    if isinstance(dt, DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, TimestampType):
        return "TIMESTAMP"
    raise TypeError(f"unsupported state column type: {dt}")


def migration_statements(
    old_spec: StateTableSpec, new_spec: StateTableSpec
) -> list[str]:
    """Portable ALTER TABLE plan for evolving ``old_spec`` into
    ``new_spec`` - the SQL every targeted engine (DuckDB, PostgreSQL)
    accepts verbatim: ``ADD COLUMN`` (with ``DEFAULT 0`` + backfill for
    new sum_cols), ``ALTER COLUMN ... SET DATA TYPE ... USING CAST``
    for type changes (the explicit USING clause matters: PostgreSQL
    rejects ``SET DATA TYPE`` without it for any change lacking an
    assignment cast, e.g. VARCHAR->BIGINT, while DuckDB accepts the
    USING form too - round-12 advice fix; only the DuckDB dialect is
    exercised by tests in this sandbox), ``DROP COLUMN`` for removals.
    Shared by DuckDBStateStore and JdbcStateStore so the two RDBMS
    backends cannot drift."""
    old_fields = {f.name: f for f in old_spec.schema.fields}
    new_fields = {f.name: f for f in new_spec.schema.fields}
    stmts = []
    for name, f in new_fields.items():
        ddl = _ddl_type(f.dataType)
        if name not in old_fields:
            default = " DEFAULT 0" if name in new_spec.sum_cols else ""
            stmts.append(
                f"ALTER TABLE {old_spec.name} ADD COLUMN {name} {ddl}{default}"
            )
            if name in new_spec.sum_cols:
                # DEFAULT covers future inserts; backfill existing rows
                stmts.append(
                    f"UPDATE {old_spec.name} SET {name} = 0 "
                    f"WHERE {name} IS NULL"
                )
        elif _ddl_type(old_fields[name].dataType) != ddl:
            stmts.append(
                f"ALTER TABLE {old_spec.name} ALTER COLUMN {name} "
                f"SET DATA TYPE {ddl} USING CAST({name} AS {ddl})"
            )
    for name in old_fields:
        if name not in new_fields:
            stmts.append(f"ALTER TABLE {old_spec.name} DROP COLUMN {name}")
    return stmts


class DuckDBStateStore:
    """``StateStore`` backed by an embedded SQL database file.

    ``max_batch_rows`` guards the driver boundary: per-batch aggregates
    cross the driver here (``toPandas``), which is correct for this
    backend's dimension-sized parity role but silently wrong for
    fact-sized frames - a misrouted 100 TB aggregate would OOM the
    driver long after the design review that approved this class. The
    guard turns that misuse into an immediate, explainable error.
    """

    def __init__(
        self,
        spark: SparkSession,
        db_path: str,
        max_batch_rows: int = 5_000_000,
    ) -> None:
        self.spark = spark
        self.max_batch_rows = max_batch_rows
        self.con = duckdb.connect(db_path)
        self.con.execute(
            "CREATE TABLE IF NOT EXISTS _applied_batches ("
            "table_name VARCHAR, batch_id BIGINT, meta VARCHAR, "
            "PRIMARY KEY (table_name))"
        )
        # databases created before the meta column existed
        self.con.execute(
            "ALTER TABLE _applied_batches ADD COLUMN IF NOT EXISTS meta VARCHAR"
        )
        self._created: set[str] = set()

    def _ensure_table(self, spec: StateTableSpec) -> None:
        if spec.name in self._created:
            return
        cols = ", ".join(
            f"{f.name} {_ddl_type(f.dataType)}" for f in spec.schema.fields
        )
        pk = ", ".join(spec.key_cols)
        self.con.execute(
            f"CREATE TABLE IF NOT EXISTS {spec.name} ({cols}, PRIMARY KEY ({pk}))"
        )
        self._created.add(spec.name)

    def last_batch_id(self, spec: StateTableSpec) -> int:
        row = self.con.execute(
            "SELECT batch_id FROM _applied_batches WHERE table_name = ?",
            [spec.name],
        ).fetchone()
        return row[0] if row else -1

    def batch_meta(self, spec: StateTableSpec, batch_id: int) -> dict | None:
        """Metadata recorded with the latest merge for ``batch_id``, or
        None (mirrors ``ParquetStateStore.batch_meta``: one entry, the
        latest - a restart replays exactly the last uncommitted batch)."""
        import json

        row = self.con.execute(
            "SELECT batch_id, meta FROM _applied_batches WHERE table_name = ?",
            [spec.name],
        ).fetchone()
        if row and row[0] == batch_id and row[1] is not None:
            return json.loads(row[1])
        return None

    def vacuum(
        self, spec: StateTableSpec, retention_seconds: float = 0.0
    ) -> int:
        """No-op for Protocol parity: the embedded database updates rows
        in place, there are no orphaned snapshot files to collect (and
        therefore nothing for ``retention_seconds`` to spare)."""
        return 0

    def read_state(self, spec: StateTableSpec) -> DataFrame:
        self._ensure_table(spec)
        cols = ", ".join(spec.schema.fieldNames())
        rows = self.con.execute(f"SELECT {cols} FROM {spec.name}").fetchall()
        return self.spark.createDataFrame(rows, spec.schema)

    def migrate_schema(
        self, old_spec: StateTableSpec, new_spec: StateTableSpec
    ) -> int:
        """The RDBMS face of ``ParquetStateStore.migrate_schema``: the
        same evolution expressed as the DDL the reference's Postgres
        tables would take (ALTER TABLE ADD/DROP COLUMN, ALTER TYPE),
        with identical rules - keys immutable, added sum_cols default
        0, other added columns NULL, drops discard, type changes cast.
        One transaction, so a concurrent reader on another connection
        sees the old or the new shape, never half. Returns the number
        of ALTER statements executed."""
        if old_spec.name != new_spec.name:
            raise ValueError(
                f"migrate_schema evolves one table in place: "
                f"{old_spec.name!r} != {new_spec.name!r}"
            )
        if tuple(old_spec.key_cols) != tuple(new_spec.key_cols):
            raise ValueError(
                "key columns are the table's identity and cannot be "
                f"migrated: {old_spec.key_cols} -> {new_spec.key_cols}"
            )
        self._ensure_table(old_spec)
        stmts = migration_statements(old_spec, new_spec)
        self.con.execute("BEGIN")
        try:
            for s in stmts:
                self.con.execute(s)
            self.con.execute("COMMIT")
        except Exception:
            self.con.execute("ROLLBACK")
            raise
        return len(stmts)

    def merge_batch(
        self,
        spec: StateTableSpec,
        batch_agg: DataFrame,
        batch_id: int,
        now: str | None = None,
        meta: dict | None = None,
    ) -> None:
        """The reference UPSERT, transactionally paired with the batch-id
        ledger so a replayed micro-batch is a no-op.

        Raises ``ValueError`` when the batch exceeds ``max_batch_rows``:
        the ``limit(n+1)`` fetch bounds what can ever reach the driver,
        so even the failing call stays memory-safe."""
        self._ensure_table(spec)
        if batch_id <= self.last_batch_id(spec):
            return

        in_cols = list(spec.key_cols) + list(spec.sum_cols)
        # One pass, bounded: fetch at most ceiling+1 rows; seeing the +1
        # row proves the batch is over the ceiling without counting (or
        # materializing) the rest of it.
        pdf = batch_agg.select(*in_cols).limit(self.max_batch_rows + 1).toPandas()
        if len(pdf) > self.max_batch_rows:
            raise ValueError(
                f"batch for {spec.name} exceeds max_batch_rows="
                f"{self.max_batch_rows}: this driver-side backend is for "
                "dimension-sized state parity; route fact-sized merges "
                "through ParquetStateStore (distributed merge)"
            )
        # Decimal columns cross pandas as objects; stringify (exact) and
        # let SQL CAST restore the declared DECIMAL type.
        agg_exprs = []
        for c in spec.sum_cols:
            f = spec.schema[c]
            ddl = _ddl_type(f.dataType)
            if isinstance(f.dataType, DecimalType):
                pdf[c] = pdf[c].map(
                    lambda v: None
                    if v is None or (isinstance(v, float) and v != v)
                    else str(v)
                )
            # pre-aggregate: ON CONFLICT rejects duplicate source keys, and
            # the reference always groupBy'd per batch before the UPSERT -
            # folding it into the statement keeps the contract whole here.
            # coalesce matches the parquet backend: an all-null batch
            # inserts 0, not NULL.
            agg_exprs.append(
                f"CAST(coalesce(sum(CAST({c} AS {ddl})), 0) AS {ddl}) AS {c}"
            )

        keys = ", ".join(spec.key_cols)
        ts_expr = "CAST(? AS TIMESTAMP)" if now else "now()::TIMESTAMP"
        updates = ", ".join(
            f"{c} = coalesce({spec.name}.{c}, 0) + coalesce(EXCLUDED.{c}, 0)"
            for c in spec.sum_cols
        )
        # NULL-keyed rows are EXCLUDED from keyed state, not inserted: a
        # NULL key means the upstream row was unattributable (e.g. a
        # malformed CSV line PERMISSIVE-nulled), and the PRIMARY KEY would
        # reject it anyway - but failing here makes that one poison row
        # crash the stream on every replay forever. The parquet backend
        # applies the identical filter so both backends agree (pinned by
        # test_null_keyed_rows_excluded_both_backends).
        not_null = " AND ".join(f"{k} IS NOT NULL" for k in spec.key_cols)
        # target columns NAMED, not positional: after a migrate_schema
        # the table's physical column order differs from the spec's
        # (ALTER TABLE ADD COLUMN appends last), and a positional
        # INSERT would land counters in last_updated
        target_cols = ", ".join([*spec.key_cols, *spec.sum_cols, "last_updated"])
        sql = (
            f"INSERT INTO {spec.name} ({target_cols}) "
            f"SELECT {keys}, {', '.join(agg_exprs)}, {ts_expr} AS last_updated "
            f"FROM batch_view WHERE {not_null} GROUP BY {keys} "
            f"ON CONFLICT ({keys}) DO UPDATE SET "
            f"{updates}, last_updated = EXCLUDED.last_updated"
        )
        self.con.register("batch_view", pdf)
        try:
            import json as _json

            self.con.execute("BEGIN")
            self.con.execute(sql, [now] if now else [])
            self.con.execute(
                "INSERT INTO _applied_batches VALUES (?, ?, ?) "
                "ON CONFLICT (table_name) DO UPDATE SET "
                "batch_id = EXCLUDED.batch_id, meta = EXCLUDED.meta",
                [spec.name, batch_id, None if meta is None else _json.dumps(meta)],
            )
            self.con.execute("COMMIT")
        except Exception:
            self.con.execute("ROLLBACK")
            raise
        finally:
            self.con.unregister("batch_view")
