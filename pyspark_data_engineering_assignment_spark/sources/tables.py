"""Loader for the driver-provided parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings - one parquet file per table under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from pyspark_data_engineering_assignment_spark.session import ensure_session_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver hands us ITS vanilla session; apply the dynamic confs the
    # engine's semantics assume (UTC timestamps, nanosAsLong) exactly once.
    ensure_session_confs(spark)
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), read as long under
        # nanosAsLong, truncated to micros - matching DuckDB's microsecond
        # TIMESTAMP. `div` is integer division: epoch-nanos ~1.7e18 exceed
        # double's 2^53 exact range, so float division could skew the
        # result by +/-1 microsecond.
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
