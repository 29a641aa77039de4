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
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
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
) -> DataFrame:
    """Streaming exact deduplication: keep the first arrival per key,
    dropping re-deliveries that arrive within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state by event
    time: a key's fingerprint is evicted once the watermark passes it, so
    state is O(keys per watermark window), not O(all keys ever) - the
    property that makes streaming dedup viable on an unbounded 100 TB
    stream (plain ``dropDuplicates`` on a stream grows state forever).
    """
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )
