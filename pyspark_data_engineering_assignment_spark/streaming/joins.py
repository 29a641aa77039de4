"""Stream-stream joins with event-time bounds.

Absent from the reference entirely (its one join is stream-to-static,
survey §2.4); required for attribution-style questions ("purchase within
an hour of the click"). The mechanics that make this safe unbounded:

  * both sides carry watermarks, and the join condition bounds the
    event-time distance between matching rows;
  * Spark derives from (watermark, time bound) how long each side's rows
    must stay in state, and evicts beyond it - state is
    O(rows per watermark+bound window), not O(stream);
  * without the time bound the state would grow forever (Spark rejects
    some of those plans, silently hoards state in others - always bound).

The same plan runs in batch mode (watermarks no-op), which is how the
test pins streaming output to the batch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_STREAM_JOIN_TYPES = {"inner", "leftOuter", "rightOuter"}


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    max_lag: str = "1 hour",
    watermark_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``left`` to ``right`` on ``key_cols`` where the
    left event happens in the window ``(right_ts, right_ts + max_lag]``
    - "left follows right within max_lag" (e.g. purchase after click).

    ``how``: ``inner`` (default), ``leftOuter`` or ``rightOuter``. The
    outer forms answer "which events never got a match within the
    bound" WITHOUT a second anti-join pass - but their null-padded rows
    emit only once the watermark has passed the row's entire match
    window (Spark must prove no future match can arrive before it can
    declare the row unmatched). Two consequences at scale: outer
    results trail the watermark delay + lag bound behind event time,
    and a drained/idle stream holds its final unmatched rows in state
    until a later event (or an explicit flush row) advances the
    watermark past them. Same state-eviction bound as the inner join.

    Column names must be disjoint apart from ``key_cols``.
    """
    if how not in _STREAM_JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_STREAM_JOIN_TYPES)}")
    l = left.withWatermark(left_ts, watermark_delay) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark_delay) if right.isStreaming else right
    cond = [l[k] == r[k] for k in key_cols] + [
        l[left_ts] > r[right_ts],
        l[left_ts] <= r[right_ts] + F.expr(f"INTERVAL {max_lag}"),
    ]
    joined = l.join(r, cond, how)
    # drop the duplicated key columns from the null-padded side
    drop_side = r if how != "rightOuter" else l
    return joined.drop(*[drop_side[k] for k in key_cols])


def enrich_stream_static(
    stream_df: DataFrame,
    static_dim: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Declarative stream-to-static enrichment - the reference's one join
    (importance dim onto the transaction stream, survey §2.4), expressed
    as Spark's native stream-static join instead of a per-batch join
    inside foreachBatch (DetectionPipeline does the latter; both are
    supported surfaces).

    Stateless: a static-side row needs no watermark or state store, and
    Spark RE-RESOLVES the static plan each micro-batch, so a dim table
    updated in place (e.g. a parquet dir rewritten nightly) is picked up
    without restarting the query. The broadcast hint pins the 100 TB
    plan: the stream side never shuffles for the join; each executor
    probes the broadcast dim - at cluster scale the dim is the small
    side by construction (an enrichment dim that does not fit broadcast
    belongs in a pre-bucketed join inside foreachBatch instead).
    """
    return stream_df.join(F.broadcast(static_dim), on=on, how=how)
