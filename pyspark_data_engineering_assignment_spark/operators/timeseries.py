"""Time-series resample + gap-fill (hypertable-style continuous rollup).

The reference engine has no time-series surface; this is the extension
operator a telemetry/training pipeline needs on an events table: bucket
raw events to a fixed grain, then DENSIFY the result so every
(series, bucket) in the observed span exists - empty buckets as
explicit zero rows plus a last-observation-carried-forward column.

Scale shape (100 TB events):

  * the bucketed aggregate is ONE hash-agg shuffle keyed on
    (series, bucket) - partial aggregation map-side, output is
    O(series x buckets), not O(rows);
  * the dense spine is generated, not scanned: distinct series
    (tiny) x a ``sequence()`` over the global [min, max] bucket span
    (a 1-row aggregate broadcast into the cross join). No row of the
    raw table is re-read to build it;
  * the gap-fill join is spine LEFT JOIN actuals on (series, bucket) -
    both sides already partitioned by the same key;
  * LOCF is a per-series window (``last(ignorenulls)`` over buckets) -
    one sort within the series partition, bounded by buckets-per-series,
    not by raw rows. A series with pathological bucket cardinality is a
    config error (pick a coarser grain), not a skew surprise.

Money stays fixed-point: per-row cast to DECIMAL(18,2) cents then
BIGINT sums, the registry's cross-engine-exact convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def resample_gapfill(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Bucket ``df`` to ``unit`` grain per ``series_col`` and densify.

    Output columns:
      series_col, bucket_ts,
      n_events       - rows in the bucket (0 for gaps),
      sum_value_cents- fixed-point bucket sum (0 for gaps),
      locf_sum_cents - last OBSERVED bucket sum at-or-before this bucket
                       (null until the series' first observation),
      is_gap         - true where the bucket had no rows.
    """
    bucket = F.date_trunc(unit, F.col(ts_col))
    actual = (
        df.groupBy(F.col(series_col), bucket.alias("bucket_ts"))
        .agg(
            F.count("*").alias("_n"),
            F.sum((F.col(value_col).cast(DEC) * 100).cast("long"))
            .cast("long")
            .alias("_sum_cents"),
        )
    )
    # Global span: a 1-row aggregate; the cross join below broadcasts it.
    bounds = df.agg(
        F.date_trunc(unit, F.min(ts_col)).alias("_t0"),
        F.date_trunc(unit, F.max(ts_col)).alias("_t1"),
    )
    series = df.select(series_col).distinct()
    spine = series.crossJoin(F.broadcast(bounds)).select(
        series_col,
        F.explode(
            F.sequence(F.col("_t0"), F.col("_t1"), F.expr(f"interval 1 {unit}"))
        ).alias("bucket_ts"),
    )
    filled = spine.join(actual, on=[series_col, "bucket_ts"], how="left")
    w = (
        Window.partitionBy(series_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        series_col,
        "bucket_ts",
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        F.coalesce(F.col("_sum_cents"), F.lit(0)).cast("long").alias(
            "sum_value_cents"
        ),
        F.last(F.col("_sum_cents"), ignorenulls=True)
        .over(w)
        .alias("locf_sum_cents"),
        F.col("_n").isNull().alias("is_gap"),
    )
