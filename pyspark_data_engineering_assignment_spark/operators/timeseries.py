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
    (one 1-row min/max aggregate, collected once and inlined as plan
    literals). No row of the raw table is re-read to build it;
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

from pyspark_data_engineering_assignment_spark.functions.guards import not_nan

DEC = "decimal(18,2)"


# Budget divisors for every unit the spine's ``interval 1 <unit>`` step
# supports. month/quarter/year use fixed approximations (30/91/365 days):
# they UNDERSTATE the true average month length, so the derived bucket
# count slightly OVERSTATES reality - conservative in the only direction
# a budget guard cares about (it can fire marginally early at the
# boundary, never silently admit an over-budget spine).
_SECONDS_PER_UNIT = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
    "month": 2_592_000,
    "quarter": 7_862_400,
    "year": 31_536_000,
}


def resample_gapfill(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    max_spine_buckets: int = 1_000_000,
) -> DataFrame:
    """Bucket ``df`` to ``unit`` grain per ``series_col`` and densify.

    Output columns:
      series_col, bucket_ts,
      n_events       - rows in the bucket (0 for gaps),
      sum_value_cents- fixed-point bucket sum (0 for gaps),
      locf_sum_cents - last OBSERVED bucket sum at-or-before this bucket
                       (null until the series' first observation),
      is_gap         - true where the bucket had no rows.

    Rows with a NULL timestamp cannot be bucketed and are excluded
    EXPLICITLY (pre-fix they vanished implicitly when the NULL bucket
    fell outside the densified range - same result, invisible in the
    plan); route them to a quality report, not a time series.

    ``max_spine_buckets`` is the densification budget (round-12
    timestamp-extremes axis): the spine is ``sequence(min, max)`` over
    the OBSERVED span, so a single corrupt far-future or deep-past
    timestamp silently inflates it by orders of magnitude - one planted
    2262 instant turned the sf0.001 hourly rollup's output from ~3.6k
    rows into 10.4 million. Like TimescaleDB's gapfill, which refuses
    to run without finite explicit bounds, the span is checked BEFORE
    densifying (one metadata-sized 1-row min/max job whose result is
    then reused as the spine's literal bounds, so the aggregate runs
    exactly once) and a budget-exceeding span fails loudly naming the
    bounds - filter the input or pick a coarser grain. The default
    (1M buckets = 114 years hourly) never fires on sane telemetry.
    The budget covers every unit ``interval 1 <unit>`` supports,
    second through year (month/quarter/year via conservative fixed
    divisors). NOTE: collecting the bounds makes plan construction
    eager - building this plan runs the min/max scan immediately
    rather than at first action (documented execution-profile change,
    round-12 advice).
    """
    bucket = F.date_trunc(unit, F.col(ts_col))
    actual = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(series_col), bucket.alias("bucket_ts"))
        .agg(
            F.count("*").alias("_n"),
            F.sum((F.col(value_col).try_cast(DEC) * 100).cast("long"))
            .cast("long")
            .alias("_sum_cents"),
        )
    )
    # Global span: ONE metadata-sized 1-row min/max job; the collected
    # bounds drive BOTH the budget check and, as plan literals, the spine
    # itself (pre-fix the same aggregate ran twice - once eagerly for the
    # check, once re-planned inside the broadcast cross join).
    b = df.agg(
        F.date_trunc(unit, F.min(ts_col)).alias("_t0"),
        F.date_trunc(unit, F.max(ts_col)).alias("_t1"),
    ).first()
    # Densification budget check. The divisor table covers every unit the
    # interval step supports (second..year); an exotic date_trunc grain
    # outside it (e.g. 'millennium') skips the guard, documented by the
    # assert-like lookup below rather than silently.
    if b is not None and b["_t0"] is not None and unit in _SECONDS_PER_UNIT:
        span_s = (b["_t1"] - b["_t0"]).total_seconds()
        n_buckets = int(span_s // _SECONDS_PER_UNIT[unit]) + 1
        if n_buckets > max_spine_buckets:
            raise ValueError(
                f"resample_gapfill: observed span {b['_t0']} .. {b['_t1']} "
                f"densifies to {n_buckets} {unit} buckets, over the "
                f"max_spine_buckets={max_spine_buckets} budget - a stray "
                f"out-of-range {ts_col} value usually causes this; filter "
                "the input span or use a coarser unit"
            )
    if b is not None and b["_t0"] is not None:
        t0_lit, t1_lit = F.lit(b["_t0"]), F.lit(b["_t1"])
    else:
        # Empty/all-null input: sequence(NULL, NULL) is NULL and explode
        # drops the row, so the spine (and output) stay empty - identical
        # to the pre-fix cross-join-with-null-bounds behavior.
        t0_lit = F.lit(None).cast("timestamp")
        t1_lit = F.lit(None).cast("timestamp")
    series = df.select(series_col).distinct()
    spine = series.select(
        series_col,
        F.explode(
            F.sequence(t0_lit, t1_lit, F.expr(f"interval 1 {unit}"))
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


def ewma_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.125,
) -> DataFrame:
    """Exponentially-weighted moving average per key: the classic
    time-decayed feature (recent activity weighted ``alpha``, history
    decayed by ``1 - alpha``), defined by the recurrence
    ``s_1 = x_1; s_i = alpha*x_i + (1-alpha)*s_{i-1}`` over the
    key's values in ``order_cols`` order. Returns one row per key:
    ``(*key_cols, n_events, ewma_value)``.

    A recurrence cannot be a window aggregate, but it IS a sequential
    left fold - so: one hash aggregate collects each key's
    (order, value) structs, ``array_sort`` fixes a total order
    (``order_cols`` must be tie-free, e.g. include a unique id), and
    ``F.aggregate`` folds. Because the fold order is total and both
    engines run the identical IEEE ops in the identical sequence, the
    double result is bit-exact against a DuckDB
    ``list_reduce(list(... ORDER BY ...))`` oracle - unlike any
    floating-point SUM, which is order-undefined.

    Scale: one shuffle; per-key arrays must be bounded (cap upstream or
    pre-aggregate to a coarser grain) - the same contract as every
    grouped-map operator here. The unbounded-stream variant of this
    recurrence lives in streaming/stateful.py (applyInPandasWithState).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    # A NULL observation would poison the fold permanently (every
    # subsequent s_i = alpha*x + (1-alpha)*NULL stays NULL) - and so
    # would a NaN, which survives isNotNull: one NaN makes the key's
    # EWMA NaN forever, while the streaming twin's pandas dropna()
    # (which removes NaN) keeps folding - the silent batch/stream
    # divergence the bit-exact contract exists to prevent. Corrupt
    # observations are SKIPPED - the recurrence folds over the key's
    # real values and n_events counts observations actually used; a
    # key with no usable observations is absent from the output.
    # not_nan is type-dispatched: only float columns get the isnan arm
    # (a DATE value column cannot be cast to double - guards.py)
    df = df.filter(F.col(value_col).isNotNull() & not_nan(df, value_col))
    # An observation with a NULL order key has no position in the fold:
    # Spark's struct array_sort and DuckDB's list(... ORDER BY) place
    # NULL keys at OPPOSITE ends, so the engines would fold the same
    # values in different orders and diverge (round-9 corrupt-events
    # parity finding). No position, no observation. NaN order keys get
    # the same exclusion (type-dispatched): the streaming twin's pandas
    # dropna removes them, and a NaN would sort last here but first
    # in... nowhere consistent - corrupt keys carry no fold position.
    for c in order_cols:
        df = df.filter(F.col(c).isNotNull() & not_nan(df, c))
    seq = F.array_sort(
        F.collect_list(
            F.struct(
                *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
                F.col(value_col).cast("double").alias("_v"),
            )
        )
    )
    grouped = df.groupBy(*key_cols).agg(
        F.count("*").alias("n_events"), seq.alias("_seq")
    )
    vals = grouped.withColumn(
        "_vals", F.transform(F.col("_seq"), lambda s: s["_v"])
    )
    v = F.col("_vals")
    ewma = F.aggregate(
        F.slice(v, 2, F.size(v) - 1),
        F.element_at(v, 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return vals.select(*key_cols, "n_events", ewma.alias("ewma_value"))


def funnel_counts(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    event_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered-funnel analytics: how many keys (users) reached stage i,
    where reaching stage i means an event of ``stages[i]`` occurred
    STRICTLY AFTER the key's first occurrence of stage i-1 (the classic
    view -> click -> purchase conversion funnel). Returns one row per
    stage: ``(stage, event_type, n_users)``.

    Chained min-after aggregations, not a per-key event-array fold: each
    stage is filter -> co-keyed join with the previous stage's first
    times -> min aggregate. Every step shuffles on the SAME key, so one
    partitioning is reused down the chain, no per-key array is ever
    materialized (the fold formulation bounds per-key state by event
    count - this bounds it by len(stages)), and a skewed power user
    costs one aggregate row per stage, not an array. len(stages) is
    small and fixed; the plan is len(stages) co-partitioned passes over
    a progressively SHRINKING keyset.

    Each stage's first-times DataFrame is ``persist()``-ed: it feeds
    BOTH its own count branch and the next stage's join, and without
    the cache each union branch re-embeds (and re-executes) every
    earlier stage's filter+aggregate subtree - quadratic passes over
    events. Caller cache contract (same as ``operators/dedup.py``):
    materialize the result, then ``spark.catalog.clearCache()``.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    counts = []
    prev = None
    for i, stage_event in enumerate(stages):
        f = events.filter(F.col(event_col) == stage_event)
        if prev is not None:
            f = f.join(prev, on=key_col).filter(
                F.col(ts_col) > F.col(f"_p{i - 1}")
            )
        prev = f.groupBy(key_col).agg(F.min(ts_col).alias(f"_p{i}")).persist()
        counts.append(
            prev.agg(F.count("*").alias("n_users")).select(
                F.lit(i + 1).cast("long").alias("stage"),
                F.lit(stage_event).alias("event_type"),
                F.col("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out
