"""Cumulative keyed state, maintained by distributed additive merge.

Replaces the reference's PostgreSQL state path - per-batch temp-table JDBC
writes plus driver-serialized ``INSERT ... ON CONFLICT (key) DO UPDATE SET
counter = counter + EXCLUDED.counter`` (reference ``Mechanism Y.py:136-206``,
``sql/postgres_tables.sql:3-25``) - with a Spark-native design:

  * the additive merge runs as a distributed union + hash re-aggregation
    (exactly what a Delta/Iceberg ``MERGE`` plans), not a driver-side SQL
    statement;
  * state versions are immutable parquet snapshots with an atomically
    swapped pointer file - readers never see a partial write;
  * merges are **idempotent by batch_id**: replaying a micro-batch after a
    crash-before-checkpoint does not double-count (fixes the reference's
    replay hazard, survey §7.4.2).

On a real lakehouse this class is swapped for Delta ``MERGE INTO`` with the
same interface; the pointer dance is what Delta's transaction log does for
us there. State size scales with distinct keys, not rows, and the merge
shuffles only O(|batch keys| + |state keys|) pre-aggregated rows.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pyspark_data_engineering_assignment_spark import schemas as S


@dataclass(frozen=True)
class StateTableSpec:
    """One cumulative state table: keys + additively merged counters."""

    name: str
    key_cols: tuple[str, ...]
    sum_cols: tuple[str, ...]
    schema: StructType


# The three reference state tables (``sql/postgres_tables.sql:3-25``).
MERCHANT_SUMMARY = StateTableSpec(
    "merchant_transaction_summary",
    ("merchant_id",),
    ("total_transactions",),
    S.MERCHANT_STATE_SCHEMA,
)
CUSTOMER_MERCHANT_SUMMARY = StateTableSpec(
    "customer_merchant_summary",
    ("customer_id", "merchant_id"),
    ("transaction_count", "total_amount_sum"),
    S.CUSTOMER_MERCHANT_STATE_SCHEMA,
)
MERCHANT_GENDER_SUMMARY = StateTableSpec(
    "merchant_gender_summary",
    ("merchant_id",),
    ("male_transaction_count", "female_transaction_count"),
    S.MERCHANT_GENDER_STATE_SCHEMA,
)
REFERENCE_TABLES = (MERCHANT_SUMMARY, CUSTOMER_MERCHANT_SUMMARY, MERCHANT_GENDER_SUMMARY)


class StateStore(Protocol):
    def read_state(self, spec: StateTableSpec) -> DataFrame: ...

    def merge_batch(self, spec: StateTableSpec, batch_agg: DataFrame, batch_id: int) -> None: ...


class ParquetStateStore:
    """Versioned-parquet state store with atomic pointer swap."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- pointer management -------------------------------------------------
    def _pointer_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_LATEST.json")

    def _read_pointer(self, table: str) -> dict:
        try:
            with open(self._pointer_path(table)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"version": -1, "last_batch_id": -1}

    def _write_pointer(self, table: str, pointer: dict) -> None:
        path = self._pointer_path(table)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
        with os.fdopen(fd, "w") as f:
            json.dump(pointer, f)
        os.replace(tmp, path)  # atomic on POSIX

    # --- public API ----------------------------------------------------------
    def last_batch_id(self, spec: StateTableSpec) -> int:
        return self._read_pointer(spec.name)["last_batch_id"]

    def read_state(self, spec: StateTableSpec) -> DataFrame:
        pointer = self._read_pointer(spec.name)
        if pointer["version"] < 0:
            return self.spark.createDataFrame([], spec.schema)
        path = os.path.join(self.root, spec.name, f"v={pointer['version']}")
        return self.spark.read.schema(spec.schema).parquet(path)

    def merge_batch(
        self,
        spec: StateTableSpec,
        batch_agg: DataFrame,
        batch_id: int,
        now: str | None = None,
    ) -> None:
        """Additively merge one batch's aggregates into cumulative state.

        Semantics of the reference UPSERT (``Mechanism Y.py:152-160`` etc.):
        new keys insert; existing keys add counters; ``last_updated`` is
        refreshed for touched keys. Null counters coalesce to 0
        (``Mechanism Y.py:178``). Skips already-applied batch_ids.
        """
        pointer = self._read_pointer(spec.name)
        if batch_id <= pointer["last_batch_id"]:
            return  # replayed batch: already merged, keep idempotent

        ts = F.to_timestamp(F.lit(now)) if now else F.current_timestamp()
        batch_side = batch_agg.withColumn("last_updated", ts)

        current = self.read_state(spec)
        # Union + re-aggregate == distributed ON CONFLICT additive merge.
        merged = (
            current.select(*spec.schema.fieldNames())
            .unionByName(batch_side.select(*spec.schema.fieldNames()))
            .groupBy(*spec.key_cols)
            .agg(
                *[
                    F.sum(F.coalesce(F.col(c), F.lit(0))).cast(
                        spec.schema[c].dataType
                    ).alias(c)
                    for c in spec.sum_cols
                ],
                F.max("last_updated").alias("last_updated"),
            )
            .select(*spec.schema.fieldNames())
        )

        version = pointer["version"] + 1
        out = os.path.join(self.root, spec.name, f"v={version}")
        merged.write.mode("overwrite").parquet(out)
        self._write_pointer(
            spec.name, {"version": version, "last_batch_id": batch_id}
        )
