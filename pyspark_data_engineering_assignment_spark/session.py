"""SparkSession factory with scale-oriented defaults.

The reference runs on Databricks 13.3 / Spark 3.4.1 with stock configs
(reference ``README.md:164``). We centralize session construction so every
entry point (tests, bench, streaming jobs, the driver contract) gets the
same tuned session:

  * AQE on (runtime re-plan, skew-join splitting, partition coalescing) -
    essential at 100 TB where static stats are wrong.
  * ``spark.sql.session.timeZone=UTC`` - deterministic timestamp semantics
    that match the DuckDB oracle (naive timestamps).
  * Arrow enabled - pandas UDFs in the extension operators are batch
    vectorized, never row-at-a-time.
  * Shuffle partitions sized from the env (local[32] test box: 32;
    a 1000-executor cluster would set this to ~2-3x total cores, or rely
    on AQE coalescing from a high initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32]/128GiB test harness. On a real cluster,
# master/cores come from the submitter; only the sql confs below carry over.
_DEF_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


# Dynamic SQL confs the engine's query semantics depend on. The round
# driver calls entry()/queries() with ITS OWN vanilla session, so these
# must be applied at query-build time too (all are dynamic = safe to set
# on a live session; idempotent).
_REQUIRED_RUNTIME_CONFS = {
    # timestamp semantics are defined in UTC: date_trunc/date_format and
    # toPandas all render in session tz, and the DuckDB oracle is naive-UTC
    "spark.sql.session.timeZone": "UTC",
    # events.ts is parquet TIMESTAMP(NANOS): read as long, truncate to micros
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply the dynamic confs correctness depends on to a session we did
    not build (e.g. the round driver's vanilla session)."""
    for k, v in _REQUIRED_RUNTIME_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def get_spark(
    app_name: str = "pyspark-dea-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Idempotent: repeated calls return the active session. ``extra_conf``
    lets tests override (e.g. tiny shuffle partitions for plan inspection).
    """
    cpus = int(_DEF_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- determinism / oracle parity ---
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is parquet TIMESTAMP(NANOS); read as long + truncate to
        # micros (sources/tables.py) instead of [PARQUET_TYPE_ILLEGAL]
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- adaptive execution: the 100TB safety net ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing ---
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or cpus),
        )
        # --- scans ---
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # --- python <-> jvm ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Python DataSource filter pushdown (sources/simsource.py):
        # Spark hard-fails a pushdown-capable Python reader without it
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # --- codegen ---
        # Static conf, default 100: a 79-query bench/test session compiles
        # far more than 100 codegen stages, and evictions re-bill multi-
        # second recompiles to whichever query runs next (measured: the
        # r5 "warm regressions" on events_value_brackets/patid1_upgrade
        # shrank to noise in a fresh session). 5000 entries is ~tens of MB.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # quieter local runs
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
