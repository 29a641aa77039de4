"""Event-time windowed aggregation with watermarks over ``events``.

The reference carries event time (``step``) but never uses it - all its
state is wall-clock (survey §2.9 "Absent"). This module supplies the
streaming surface a real deployment needs: tumbling/sliding event-time
windows with late-data handling, the streaming twin of the batch
``events_hourly`` registry query (``plans/registry.py``).

Design notes for 100 TB streams:
  * The aggregation is a plain watermarked ``groupBy(window(...))`` -
    Spark keeps O(open windows x group keys) state, evicting each window
    once the watermark passes its end. State size is bounded by the
    watermark delay, not the stream length.
  * The same plan runs in batch mode (``F.window`` works on static
    DataFrames; ``withWatermark`` is a no-op there), which is how the
    equivalence test pins streaming output to the batch oracle.
  * Money is fixed-pointed to BIGINT cents per row before summing - the
    engine-wide hash-stability convention (``plans/registry.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,2)"

#: Default producer-clock-skew tolerance for every event-time streaming
#: constructor in this package (round-13 finding 73 / round-14 wiring):
#: rows whose event time is more than this far AHEAD of processing time
#: are filtered out BEFORE ``withWatermark`` so one future-clocked
#: producer cannot advance the global watermark past all genuine
#: traffic and blackhole the stream. Pass ``future_tolerance=None`` to
#: disable (trusted-clock feeds).
FUTURE_TOLERANCE_DEFAULT = "10 minutes"


def _guard_future_event_time(
    df: DataFrame, ts_col: str, tolerance: str | None
) -> DataFrame:
    """Apply the finding-73 guard to a STREAMING DataFrame: drop rows
    more than ``tolerance`` ahead of processing time, before the caller
    attaches a watermark. The drop is NOT silent - the skewed-row count
    is published per micro-batch as the named observation
    ``future_skew_quarantine.rows_quarantined`` (visible in every
    ``StreamingQueryProgress.observedMetrics``), so a monitoring page
    sees the unit-mix-up producer immediately. Callers who need the
    skewed ROWS (not just the count) route the feed through
    ``split_future_event_time`` themselves and write the skewed leg to
    a quarantine sink (e.g. both legs inside one ``foreachBatch``).

    Batch DataFrames pass through untouched: a batch query has no
    watermark, so future rows cannot poison anything there - and keeping
    the batch plan unguarded preserves batch==stream equality on every
    sane feed while the streaming side only diverges on rows that would
    have blackholed it anyway.
    """
    if tolerance is None or not df.isStreaming:
        return df
    horizon = F.current_timestamp() + F.expr(f"INTERVAL {tolerance}")
    is_future = F.coalesce(F.col(ts_col) > horizon, F.lit(False))
    return df.observe(
        "future_skew_quarantine",
        F.sum(F.when(is_future, 1).otherwise(0)).alias("rows_quarantined"),
    ).filter(~is_future)


def windowed_event_aggregate(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark_delay: str | None = "2 hours",
    ts_col: str = "ts",
    future_tolerance: str | None = FUTURE_TOLERANCE_DEFAULT,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide_duration`` is set) event-time
    counts and cent-exact value sums per (window, event_type).

    Output columns match the batch ``events_hourly`` query:
    ``hour`` (window start, formatted), ``event_type``, ``n_events``,
    ``total_value_cents`` - so the two are directly comparable.

    ``future_tolerance`` (default ON): streaming inputs are routed
    through the producer-clock-skew guard before the watermark is
    attached - see ``_guard_future_event_time`` / finding 73.
    """
    df = events
    if watermark_delay is not None and df.isStreaming:
        df = _guard_future_event_time(df, ts_col, future_tolerance)
        df = df.withWatermark(ts_col, watermark_delay)
    win = (
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        df.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("value").try_cast(DEC) * 100).cast("long"))
            .cast("long")
            .alias("total_value_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "total_value_cents",
        )
    )


def session_windowed_events(
    events: DataFrame,
    gap_duration: str = "30 minutes",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    future_tolerance: str | None = FUTURE_TOLERANCE_DEFAULT,
) -> DataFrame:
    """Session windows per user_id: only a silence STRICTLY LONGER than
    ``gap_duration`` closes a session - events exactly ``gap`` apart
    merge (``F.session_window`` extends while cur - prev <= gap;
    empirically pinned in tests/test_streaming_windows.py). Window =
    [first event, last event + gap). Purely built-in
    (``F.session_window``), state bounded by the watermark; also runs in
    batch mode, where the DuckDB gaps-and-islands oracle checks it with
    the matching strict-> split (``plans/registry.py`` events_sessions).
    ``future_tolerance``: clock-skew guard, default ON in streaming
    (see ``_guard_future_event_time``)."""
    df = events
    if df.isStreaming:
        df = _guard_future_event_time(df, ts_col, future_tolerance)
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap_duration).alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("value").try_cast(DEC) * 100).cast("long"))
            .cast("long")
            .alias("total_value_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "user_id",
            "n_events",
            "total_value_cents",
        )
    )


def split_future_event_time(
    df: DataFrame,
    ts_col: str = "ts",
    tolerance: str = "10 minutes",
    now_col=None,
):
    """Ingest-side producer-clock-skew guard: returns ``(clean,
    skewed)`` where ``skewed`` holds rows whose event time is more than
    ``tolerance`` AHEAD of processing time.

    Why this exists (round-13 clock-skew axis): the global watermark is
    ``max(event time seen) - delay``, computed over EVERY input row.
    LATE data hurts only itself - but FUTURE data poisons everyone
    else: one producer with a wrong clock (a year-ahead RTC, a ms/us
    unit mix-up) advances the watermark past all genuine traffic, and
    every subsequent legitimate event is silently dropped as "late"
    (pinned in tests/test_clock_skew_watermark.py - one skewed row
    blackholes the whole stream with zero errors). Filtering future
    timestamps BEFORE ``withWatermark`` keeps the watermark anchored to
    real traffic; route ``skewed`` to the quarantine channel, not
    /dev/null - a unit mix-up is diagnosable from the captured rows.

    ``now_col`` defaults to ``F.current_timestamp()``, which inside a
    micro-batch is the BATCH's query timestamp - deterministic within a
    batch, replay-stable under checkpoint recovery. Tests inject a
    fixed literal. NULL event times are routed to ``clean`` (they
    cannot advance a watermark; the null-routing policy downstream
    owns them).

    BATCH determinism caveat (round-13 advice): the two returned frames
    are separate lineages, and in plain batch use each action resolves
    ``current_timestamp()`` at ITS OWN query start - so with the
    default ``now_col`` a row near the tolerance boundary can land in
    both legs or neither across two separately-executed actions. This
    is inherent to per-query timestamp resolution, not to where the
    flag is computed (a ``withColumn`` flag is equally lazy). Streaming
    is safe: both legs of one micro-batch share the batch timestamp.
    Batch callers MUST pass an explicit ``now_col`` literal (e.g.
    ``F.lit(...).cast("timestamp")``) when they execute the legs as
    separate actions - the constructors in this module need only the
    clean leg inside one query, so they are exempt."""
    now = F.current_timestamp() if now_col is None else now_col
    horizon = now + F.expr(f"INTERVAL {tolerance}")
    is_future = F.coalesce(F.col(ts_col) > horizon, F.lit(False))
    return df.filter(~is_future), df.filter(is_future)
