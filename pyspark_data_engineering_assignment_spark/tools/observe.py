"""One-pass pipeline observability via ``Dataset.observe``.

A 100 TB ingest cannot afford "count it again to check it": every audit
aggregate must ride the SAME scan as the work itself. Spark's observed
metrics do exactly that - arbitrary aggregate expressions evaluated as
accumulator-style side-state of an action, costing zero extra passes
(unlike ``df.count()`` + ``df.agg(...)`` + the real job = three scans).

Two entry points, one per execution mode:

  * batch: ``observed(df, name, **metrics)`` returns ``(df', Observation)``;
    after ANY action on ``df'`` the metrics are in ``observation.get``.
  * streaming: ``observe_stream(df, name, **metrics)`` attaches a NAMED
    observation; each micro-batch's values arrive in
    ``StreamingQueryProgress.observedMetrics[name]`` - the hook a
    production pipeline feeds its metrics system from, per batch, with
    no second aggregation query competing for the state store.

The audit metrics themselves are ordinary Column aggregates, so the
fixed-point conventions used everywhere else (cents-exact sums) apply
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach audit aggregates to a batch DataFrame's next action.

    Returns the instrumented frame and the ``Observation`` handle;
    read ``observation.get`` (dict) after an action has run. Metric
    kwargs become the metric names.
    """
    obs = Observation(name)
    cols = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, cols[0], *cols[1:]), obs


def observe_stream(df: DataFrame, name: str, **metrics: Column) -> DataFrame:
    """Attach named audit aggregates to a streaming DataFrame.

    Per-micro-batch values surface in every
    ``StreamingQueryProgress.observedMetrics[name]`` row - poll
    ``query.recentProgress`` or a ``StreamingQueryListener``.
    """
    cols = [c.alias(n) for n, c in metrics.items()]
    return df.observe(name, cols[0], *cols[1:])
