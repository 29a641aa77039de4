"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference keeps all cumulative state in an external RDBMS
(``Mechanism Y.py:136-206``). ``state/store.py`` replicates that
architecture Spark-natively; this module is the OTHER idiomatic choice
the survey names (§1.1): keep keyed state inside Spark's checkpointed
state store and process it with Arrow-batched Python. Pick this one when
the state is only needed by the stream itself (no external readers):
no external system, exactly-once for free via the checkpoint, state
partitioned with the stream (no per-batch full-state scan).

Scale notes: state lives per group key, sharded across executors by the
``groupBy`` hash - O(distinct keys) memory cluster-wide, each micro-batch
touches only keys present in the batch. The Python function sees Arrow
batches (pandas), never a Python loop over rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_PAIR_SCHEMA = StructType(
    [
        StructField("customer", StringType(), True),
        StructField("merchant", StringType(), True),
        StructField("transaction_count", LongType(), True),
        StructField("total_amount_cents", LongType(), True),
    ]
)

_PAIR_STATE_SCHEMA = StructType(
    [
        StructField("transaction_count", LongType(), True),
        StructField("total_amount_cents", LongType(), True),
    ]
)


def running_pair_counters(
    transactions, emit_min_count: int = 3
) -> DataFrame:
    """Cumulative per-(customer, merchant) count + cent-exact amount sum,
    maintained in Spark's own state store; emits the running totals for
    every pair that has reached ``emit_min_count`` transactions, each
    batch the pair is active.

    The streaming-native twin of the ``customer_merchant_summary`` state
    table + PatId2 gate: same additive semantics, but state is
    checkpointed with the query instead of living in an external table.
    Money is folded to integer cents inside the function so state is
    penny-exact (the float->DECIMAL seam of survey §1.3, solved in the
    integer domain).
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        count, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            count += len(pdf)
            # float32 amounts -> exact cents PER ROW before summing
            # (vectorized): rounding a chunk's float sum once would
            # drift up to 0.5 cent per chunk for hot keys.
            cents += int(
                pdf["amount"].astype("float64").mul(100).round().astype("int64").sum()
            )
        state.update((count, cents))
        if count >= emit_min_count:
            yield pd.DataFrame(
                {
                    "customer": [key[0]],
                    "merchant": [key[1]],
                    "transaction_count": [count],
                    "total_amount_cents": [cents],
                }
            )

    return (
        transactions.select("customer", "merchant", "amount")
        .groupBy("customer", "merchant")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_PAIR_SCHEMA,
            stateStructType=_PAIR_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream_by_key(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
    future_tolerance: str | None = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication: keep the first arrival per key,
    dropping re-deliveries that arrive within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state by event
    time: a key's fingerprint is evicted once the watermark passes it, so
    state is O(keys per watermark window), not O(all keys ever) - the
    property that makes streaming dedup viable on an unbounded 100 TB
    stream (plain ``dropDuplicates`` on a stream grows state forever).

    ``future_tolerance``: the finding-73 clock-skew guard
    (``windows._guard_future_event_time``), default ON. Round-14 probe:
    this operator IS blackholed by one future-clocked row - the global
    watermark jumps past genuine traffic and every later legitimate
    event is silently dropped as late (not merely "a duplicate slips
    through": the rows vanish; pinned in
    tests/test_clock_skew_watermark.py). Dropping the one skewed row -
    counted in the ``future_skew_quarantine`` observed metric - is the
    strictly smaller loss.
    """
    if future_tolerance is not None:
        from pyspark_data_engineering_assignment_spark.streaming.windows import (
            _guard_future_event_time,
        )

        stream = _guard_future_event_time(stream, ts_col, future_tolerance)
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


EWMA_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("n_events", LongType(), True),
        StructField("ewma_value", DoubleType(), True),
    ]
)

_EWMA_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("ewma", DoubleType(), True),
    ]
)


def running_ewma(
    events: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.125,
) -> DataFrame:
    """Streaming twin of ``operators/timeseries.ewma_by_key``: the same
    EWMA recurrence (s_1 = x_1; s_i = a*x_i + (1-a)*s_{i-1}) folded
    incrementally in Spark's checkpointed state store, emitting each
    key's running (n_events, ewma_value) every batch the key is active.

    Within a batch, rows are sorted by ``order_cols`` before folding, so
    when batches arrive in order-col order (a time-ordered feed) the
    stream's final value is BIT-IDENTICAL to the batch fold - Python and
    JVM doubles are both IEEE-754 binary64 and the op sequence is the
    same (pinned by a batch==stream equality test). The fold is a
    deliberate Python loop over ONE key's rows within an Arrow batch
    (bounded by per-key batch size): a recurrence is sequential by
    definition, and the vectorized alternatives (pandas ``ewm`` uses
    ``old + a*(x-old)``, numpy uses cumulative powers) compute
    different IEEE sequences that break the bit-exact contract. State
    per key is two scalars; note transformWithStateInPandas (the v2
    API) needs protobuf, which this container lacks -
    applyInPandasWithState expresses the same operator.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, ewma = state.get if state.exists else (0, None)
        # Concatenate ALL of this key's Arrow chunks before the single
        # sort: a key whose batch rows span multiple chunks (batch rows
        # > spark.sql.execution.arrow.maxRecordsPerBatch) delivers the
        # chunks in arbitrary shuffle order, and sorting each chunk
        # independently would fold them out of order-col order,
        # breaking the bit-exact batch==stream contract.
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(order_cols)
        # A NULL ORDER key has no position in the fold - the batch twin
        # excludes such rows (round 9: engine NULL orderings diverge),
        # and pandas would otherwise sort NaT/NaN last and fold them,
        # silently diverging from batch on a corrupt feed.
        pdf = pdf.dropna(subset=list(order_cols))
        # NULL observations are SKIPPED, exactly like the batch twin
        # (timeseries.ewma_by_key filters them): a null value arrives
        # here as NaN, and folding NaN would poison the key's state
        # FOREVER - silent divergence from batch, the worst kind.
        for x in pdf[value_col].dropna().astype("float64"):
            ewma = x if ewma is None else alpha * x + (1.0 - alpha) * ewma
            n += 1
        state.update((n, ewma))
        # a key activated only by null observations has no usable state
        # yet; the batch twin omits such keys, so the stream emits
        # nothing for them either
        if n > 0:
            yield pd.DataFrame(
                {"key": [key[0]], "n_events": [n], "ewma_value": [ewma]}
            )

    return (
        events.select(
            F.col(key_col).cast("string").alias("key"),
            *[F.col(c) for c in order_cols],
            F.col(value_col),
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=EWMA_SCHEMA,
            stateStructType=_EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_FIRST_SEEN_STATE_SCHEMA = StructType([StructField("seen", LongType(), True)])


def first_seen_by_key(
    events: DataFrame,
    key_col: str,
    order_col: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming first-occurrence keeper: for every key, emit EXACTLY
    ONE row across the whole stream - the batch-minimum ``order_col``
    row of the micro-batch where the key first appears - and carry the
    chosen row's ``payload_cols`` with it. The streaming twin of the
    batch curation funnel's exact-dedup keeper (groupBy(fingerprint) ->
    min(doc_id) -> semi join): when the feed is order-col-ordered
    across batches (an id-ordered ingest), the emitted set is IDENTICAL
    to the batch keeper set, pinned by an equality test.

    vs ``dropDuplicates``: Spark's streaming dedup keeps an ARBITRARY
    row of the first batch, so a batch twin cannot be stated, and it
    cannot carry keeper-row payload selection logic. State here is one
    long per key (the corpus fingerprint index, sharded with the
    stream); at 100 TB the same role is played by the persisted-index
    anti join (``dedup.dedup_against_corpus``) when the index must
    outlive the query - this operator is the in-stream form.
    """
    payload_cols = list(payload_cols or [])
    in_fields = {f.name: f for f in events.schema.fields}
    out_schema = StructType(
        [StructField("key", StringType(), True)]
        + [
            StructField(c, in_fields[c].dataType, True)
            for c in [order_col, *payload_cols]
        ]
    )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # A row with no order value cannot be "first" (SQL min() skips
        # NULL; idxmin over all-NaN would crash): drop such rows, and if
        # none remain the key has not orderably appeared yet - no state.
        pdf = pdf[pdf[order_col].notna()]
        if pdf.empty:
            return
        row = pdf.loc[pdf[order_col].idxmin()]
        state.update((int(row[order_col]),))
        yield pd.DataFrame(
            {"key": [key[0]], **{c: [row[c]] for c in [order_col, *payload_cols]}}
        )

    return (
        events.select(
            F.col(key_col).cast("string").alias("key"),
            *[F.col(c) for c in [order_col, *payload_cols]],
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_FIRST_SEEN_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_ANOM_STATE_SCHEMA = StructType(
    [StructField("recent", StringType(), True)]  # csv of last N cents
)


def running_spend_anomalies(
    events: DataFrame,
    key_col: str,
    order_cols: list[str],
    cents_col: str,
    window: int = 10,
    min_prev: int = 5,
    k: int = 3,
) -> DataFrame:
    """Streaming twin of the batch ``user_spend_anomalies`` query: flag
    each event whose integer-cents value deviates more than ``k`` std
    devs from the key's trailing ``window`` events (current excluded,
    ``min_prev`` priors required), carrying the trailing deque across
    micro-batches in Spark's checkpointed state.

    The z-test is the same cross-multiplied integer arithmetic as the
    batch query - (x*n - sum)^2 > k^2*(n*sumsq - sum^2) - so on an
    order-col-ordered feed the flagged set is EXACTLY the batch
    window-query's flagged set (pinned by an equality test; integer
    math means exactly, not approximately). State per key is at most
    ``window`` longs (serialized compactly); the per-key Python loop
    is a sequential recurrence over one key's batch rows, the same
    justified shape as ``running_ewma``.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (csv,) = state.get if state.exists else ("",)
        recent = [int(x) for x in csv.split(",") if x]
        pdf = pd.concat(list(pdfs), ignore_index=True)
        id_col = order_cols[-1]  # row identity for exact set compare
        # Corrupt observations (missing cents, or missing any ordering
        # field - unplaceable in the recurrence) are skipped exactly like
        # the batch twin's isNotNull filter; they neither flag nor enter
        # the trailing window. int(NaN) would otherwise crash the stream.
        keep = pdf[cents_col].notna()
        for c in order_cols:
            keep &= pdf[c].notna()
        pdf = pdf[keep].sort_values(order_cols)
        flagged, flagged_ids = [], []
        for x, oid in zip(
            (int(v) for v in pdf[cents_col]),
            (int(v) for v in pdf[id_col]),
        ):
            n = len(recent)
            if n >= min_prev:
                s = sum(recent)
                ss = sum(v * v for v in recent)
                dev = x * n - s
                if dev * dev > k * k * (n * ss - s * s):
                    flagged.append(x)
                    flagged_ids.append(oid)
            recent.append(x)
            if len(recent) > window:
                recent.pop(0)
        state.update((",".join(str(v) for v in recent),))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(flagged),
                "order_id": pd.Series(flagged_ids, dtype="int64"),
                "cents": pd.Series(flagged, dtype="int64"),
            }
        )

    out_schema = StructType(
        [
            StructField("key", StringType(), True),
            StructField("order_id", LongType(), True),
            StructField("cents", LongType(), True),
        ]
    )
    return (
        events.select(
            F.col(key_col).cast("string").alias("key"),
            *[F.col(c) for c in order_cols],
            F.col(cents_col),
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_ANOM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_CDC_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("last_op", StringType(), True),
        StructField("last_ts_micros", LongType(), True),
        StructField("last_cents", LongType(), True),
    ]
)
_CDC_STATE_SCHEMA = StructType(
    [
        StructField("ts_micros", LongType(), True),
        StructField("event_id", LongType(), True),
        StructField("op", StringType(), True),
        StructField("cents", LongType(), True),
    ]
)


def cdc_apply_stream(
    changes: DataFrame,
    key_col: str,
    ts_micros_col: str,
    seq_col: str,
    op_col: str,
    cents_col: str,
) -> DataFrame:
    """Streaming CDC apply: keyed last-writer-wins state over an
    insert/upsert/delete change feed - the streaming twin of the batch
    ``user_cdc_state`` window query. Per key the state is ONE winning
    row (ts, seq, op, cents); each batch's rows compete against it on
    the (ts, seq) total order, out-of-order and replayed deliveries
    lose to a newer winner, and a winning delete is held as a TOMBSTONE
    (emitted with op='delete') rather than dropped - dropping state
    would let an older replayed upsert resurrect the key, the classic
    CDC-apply bug. Each batch emits every touched key's current state;
    downstream filters tombstones. State size is exactly one row per
    live key, sharded by the groupBy hash."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # A change record with no position in the (ts, seq) total order is
        # corrupt, not a change: skip it, exactly like the batch twin's
        # isNotNull filter. Before this, pandas' NULL->NaN turned one such
        # row into int(NaN) -> ValueError, and since the poisoned source
        # file survives restart, the stream crash-looped on it forever.
        pdf = pdf[pdf["ts_micros"].notna() & pdf["seq"].notna()]
        if pdf.empty:
            # touched only by corrupt rows: state (and its emission
            # history) is exactly as if the batch never arrived
            return
        best = None  # (ts, seq, op, cents)
        for row in pdf.itertuples(index=False):
            cand = (
                int(row.ts_micros),
                int(row.seq),
                None if pd.isna(row.op) else str(row.op),
                None if pd.isna(row.cents) else int(row.cents),
            )
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        if state.exists:
            ts, seq, op, cents = state.get
            if (ts, seq) > (best[0], best[1]):
                best = (ts, seq, op, cents)
        state.update(best)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "last_op": [best[2]],
                "last_ts_micros": [best[0]],
                "last_cents": [best[3]],
            }
        )

    return (
        changes.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_micros_col).cast("long").alias("ts_micros"),
            F.col(seq_col).cast("long").alias("seq"),
            F.col(op_col).cast("string").alias("op"),
            F.col(cents_col).cast("long").alias("cents"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=_CDC_OUT_SCHEMA,
            stateStructType=_CDC_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_EXPIRING_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("n_events", LongType(), True),
        StructField("expired", LongType(), True),
    ]
)
_EXPIRING_STATE_SCHEMA = StructType([StructField("n", LongType(), True)])


def expiring_counts(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    ttl_minutes: int = 60,
    watermark_delay: str = "10 minutes",
    future_tolerance: str | None = "10 minutes",
) -> DataFrame:
    """Keyed running counts whose state EXPIRES by event time: a key
    idle for ``ttl_minutes`` past the watermark emits one final row
    (expired=1) and its state is removed - the eviction discipline
    every custom stateful operator needs at 100 TB, where 'keep state
    for every key ever seen' (what running_pair_counts legitimately
    does for the reference's cumulative semantics) is a memory leak
    for unbounded key domains. Uses EventTimeTimeout: deterministic
    under replay because expiry is driven by the watermark, not wall
    clock - an availableNow drain with a late flush row expires
    everything before it reproducibly (pinned in tests).

    ``future_tolerance``: finding-73 guard, default ON - and for THIS
    operator the unguarded failure is the loudest of the family
    (round-14 probe): the poisoned watermark makes every legitimate
    key's ``setTimeoutTimestamp(newest + ttl)`` land BELOW the
    watermark, which raises INVALID_TIMEOUT_TIMESTAMP inside the state
    function - and because the poisoned source file survives restart,
    the query CRASH-LOOPS on it forever (pinned in
    tests/test_clock_skew_watermark.py)."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [key[0]], "n_events": [n], "expired": [1]}
            )
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # Rows with no event time have no position in event time: they
        # can neither count toward an event-time-windowed state nor set
        # its timeout (an all-NaT batch would otherwise compute a garbage
        # NaT-min timeout and crash or never expire). Skip them; if none
        # remain, the batch is as if it never arrived - existing state
        # and its previously set timeout stand.
        pdf = pdf[pdf["_ts"].notna()]
        if pdf.empty:
            return
        n = (state.get[0] if state.exists else 0) + len(pdf)
        state.update((n,))
        # ttl measured from this batch's newest event for the key
        # (the Python GroupState API takes one absolute ms timestamp)
        newest_ms = int(pdf["_ts"].astype("datetime64[ms]").astype("int64").max())
        state.setTimeoutTimestamp(newest_ms + ttl_minutes * 60_000)
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "expired": [0]})

    if future_tolerance is not None and events.isStreaming:
        from pyspark_data_engineering_assignment_spark.streaming.windows import (
            _guard_future_event_time,
        )

        events = _guard_future_event_time(events, ts_col, future_tolerance)
    return (
        events.withWatermark(ts_col, watermark_delay)
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col).alias("_ts"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=_EXPIRING_OUT_SCHEMA,
            stateStructType=_EXPIRING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
