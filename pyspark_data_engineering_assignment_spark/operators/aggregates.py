"""Per-batch aggregates that feed cumulative state.

These are the partial halves of the reference's partial+final aggregation
split: Spark computes per-batch aggregates (A1/A2/A3, reference
``Mechanism Y.py:142-190``), and the state store performs the final
additive merge (the reference's ``INSERT ... ON CONFLICT DO UPDATE``,
``:152-203``; ours: ``state.store``).

All are plain hash aggregates - Catalyst gives partial+final (map-side
combine) automatically, so each shuffles only one pre-aggregated row per
key per batch regardless of batch size. That property is what makes the
design hold at 100 TB: shuffle volume is O(distinct keys), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merchant_batch_aggregate(batch: DataFrame) -> DataFrame:
    """A1: transactions per merchant in this batch (``Mechanism Y.py:142-143``)."""
    return batch.groupBy(F.col("merchant").alias("merchant_id")).agg(
        F.count("*").alias("total_transactions")
    )


def customer_merchant_batch_aggregate(batch: DataFrame) -> DataFrame:
    """A2: count + amount sum per (customer, merchant) (``Mechanism Y.py:167``).

    ``amount`` is Float in flight but DECIMAL(18,2) in state (the money
    seam, survey §1.3) - the cast happens here, once, so the additive
    merge downstream is penny-exact. The seam's overflow contract
    (round-13 decimal-overflow axis) lives in ``guards.money_dec``:
    NaN/NULL -> NULL, finite |amount| >= 10^16 -> loud per-row error
    independent of the session's ANSI mode (pre-fix, try_cast silently
    dropped the oversized row's money from the sum); the batch-total
    narrowing back to DECIMAL(18,2) is likewise overflow-checked.
    """
    from pyspark_data_engineering_assignment_spark.functions.guards import (
        checked_money_total,
        money_dec,
    )

    return batch.groupBy(
        F.col("customer").alias("customer_id"),
        F.col("merchant").alias("merchant_id"),
    ).agg(
        F.count("*").alias("transaction_count"),
        checked_money_total(
            F.sum(money_dec("amount")), "total_amount_sum"
        ).alias("total_amount_sum"),
    )


def gender_pivot_aggregate(batch: DataFrame) -> DataFrame:
    """A3: M/F transaction counts per merchant (``Mechanism Y.py:187-190``).

    The explicit pivot value list ["M","F"] avoids the distinct-values
    pre-scan and silently drops BankSim's other gender codes ('E','U'),
    exactly like the reference. ``fillna(0)`` zero-fills pivot gaps.
    """
    return (
        batch.groupBy(F.col("merchant").alias("merchant_id"))
        .pivot("gender", ["M", "F"])
        .count()
        .na.fill(0, subset=["M", "F"])
        .withColumnRenamed("M", "male_transaction_count")
        .withColumnRenamed("F", "female_transaction_count")
    )
