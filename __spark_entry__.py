"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` - flagship query smoke check on sf0.001.
``queries()`` - one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` - matching DuckDB SQL per query for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark_data_engineering_assignment_spark.plans import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    PatId1 "UPGRADE" re-expressed over the driver tables - the deepest
    reference plan (two state aggregates + percentile-threshold dimension
    join + two semi-joins + distinct).
    """
    return QUERIES["patid1_upgrade"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted keys get the weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops)."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
