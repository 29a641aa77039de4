"""Declarative data-quality expectations, evaluated in ONE pass.

The Deequ/Great-Expectations shape without the framework: a rule list
compiles to a single aggregation over the table (every rule is one
aggregate expression), then unpivots to one row per rule - so a 100 TB
table pays exactly one scan for its whole quality report, and the
aggregates ride partial/final hash aggregation like any other groupBy.

Supported rules:
  ("not_null", col)            - violations = null count
  ("unique", col)              - violations = rows - distinct values
  ("between", col, lo, hi)     - violations = rows outside [lo, hi]
  ("in_set", col, values)      - violations = rows outside the set
  ("positive", col)            - violations = rows <= 0

The report is integer counts only - cross-engine hash-exact, so the
quality report itself can be oracle-checked (see
``events_quality_report`` in the registry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Rule = tuple


def _violations(rule: Rule) -> Column:
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "not_null":
        return F.count_if(c.isNull())
    if kind == "unique":
        return F.count(F.lit(1)) - F.countDistinct(c)
    if kind == "between":
        lo, hi = rule[2], rule[3]
        return F.count_if(c.isNull() | (c < lo) | (c > hi))
    if kind == "in_set":
        return F.count_if(c.isNull() | ~c.isin(list(rule[2])))
    if kind == "positive":
        # NaN is not a positive number, but Spark's total ordering puts
        # NaN ABOVE every value, so `NaN <= 0` is false and a bare
        # comparison would silently BLESS NaN - in the one tool whose
        # job is catching bad values. isnan over a double cast is
        # false for NULL and for every integral value, so the rule
        # stays value-identical on non-float columns (the oracle
        # mirrors of integral-column rules need no isnan arm).
        return F.count_if(
            c.isNull() | F.isnan(c.cast("double")) | (c <= 0)
        )
    raise ValueError(f"unknown rule kind: {kind}")


def _rule_name(rule: Rule) -> str:
    return f"{rule[0]}({rule[1]})"


def quality_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One row per rule: (rule, violations, n_rows, passed). Exactly one
    aggregation job over ``df`` regardless of rule count."""
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        _violations(r).alias(f"_v{i}") for i, r in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    stack = F.expr(
        "stack({n}, {args})".format(
            n=len(rules),
            args=", ".join(
                f"'{_rule_name(r)}', _v{i}" for i, r in enumerate(rules)
            ),
        )
    ).alias("rule", "violations")
    return wide.select(stack, F.col("_n").alias("n_rows")).select(
        "rule",
        F.col("violations").cast("long").alias("violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.when(F.col("violations") == 0, 1).otherwise(0).alias("passed"),
    )


def streaming_quality_metrics(df: DataFrame, name: str, rules: list[Rule]) -> DataFrame:
    """Ride the SAME rules on a streaming DataFrame as observed metrics:
    one violation counter per rule (plus n_rows) lands in every
    micro-batch's ``StreamingQueryProgress.observedMetrics[name]`` - the
    per-batch quality telemetry a production ingest alerts on, costing
    zero extra passes over the stream. ``unique`` rules are rejected:
    distinct-aggregates cannot ride a streaming observe (cross-batch
    uniqueness needs keyed state; use ``dedup_stream_by_key`` there)."""
    if any(r[0] == "unique" for r in rules):
        raise ValueError(
            "unique rules need keyed state, not an observe metric"
        )
    metrics = {"n_rows": F.count(F.lit(1))}
    for r in rules:
        metrics[_rule_name(r)] = _violations(r)
    cols = [c.alias(n) for n, c in metrics.items()]
    return df.observe(name, cols[0], *cols[1:])
