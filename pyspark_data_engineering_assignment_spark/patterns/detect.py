"""The three detection patterns, as pure DataFrame -> DataFrame functions.

Reference semantics (authoritative: ``mechanism_y/Mechanism Y.py:221-244``;
prose: ``README.md:202-214``):

* **PatId1 "UPGRADE"** (``Mechanism Y.py:231-239``): emit (customer, merchant)
  where (1) cumulative merchant ``total_transactions > 5``, (2) cumulative
  (customer, merchant) ``transaction_count > 2``, and (3) the *current batch*
  contains a transaction for the pair whose dimension Weight is below the
  1st-percentile weight for (merchant, category) - fallback ``Weight < 2.0``
  when the percentile table is unavailable (``:236-237``). Condition (3) is
  batch-local on purpose: a pair fires only in batches where a low-weight
  transaction actually arrives.
* **PatId2 "CHILD"** (``Mechanism Y.py:243``): from state alone,
  ``transaction_count >= 3`` and average amount ``< 23.0`` (null-safe
  ratio-of-sums). Re-fires every batch while true - parity quirk kept
  behind ``EngineConfig.refire_stateful_patterns``.
* **PatId3 "DEI-NEEDED"** (``Mechanism Y.py:244``): from state alone,
  ``female_transaction_count < male_transaction_count`` and
  ``female_transaction_count > 2``; CustomerName is ``""``.

Differences from the reference (deliberate, documented):
  * The dimension join broadcasts (the importance dim is small and cached).
  * Inner-join-then-project-then-distinct is expressed as ``left_semi``
    where the right side contributes no columns (survey §2.4 J2/J3 note).
  * The clock is injected (``Clock``) so golden tests are deterministic;
    the reference used wall-clock IST (``Mechanism Y.py:112-113``).
  * No ``rdd.isEmpty()`` probes, no ``collect()`` - detections stay
    distributed until the sink.
"""

from __future__ import annotations

import datetime as dt
from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.config import PatternThresholds

IST = dt.timezone(dt.timedelta(hours=5, minutes=30))
TS_FMT = "%Y-%m-%d %H:%M:%S"


class Clock(Protocol):
    def now_str(self) -> str: ...


class SystemClock:
    """Wall-clock IST, formatted like the reference (``Mechanism Y.py:112-113``)."""

    def now_str(self) -> str:
        return dt.datetime.now(IST).strftime(TS_FMT)


class FixedClock:
    """Deterministic clock for golden tests."""

    def __init__(self, value: str = "2024-01-01 00:00:00") -> None:
        self.value = value

    def now_str(self) -> str:
        return self.value


def shape_detection(
    df: DataFrame,
    pattern_id: str,
    action_type: str,
    y_start: str,
    detection_time: str,
    customer_col: str | None,
    merchant_col: str,
) -> DataFrame:
    """Project to the canonical 6-string-column detection record
    (reference ``Mechanism Y.py:60-64``); CustomerName is ``""`` when the
    pattern has no customer dimension (PatId3, ``:244``)."""
    customer = F.col(customer_col).cast("string") if customer_col else F.lit("")
    return df.select(
        F.lit(y_start).alias("YStartTime"),
        F.lit(detection_time).alias("DetectionTime"),
        F.lit(pattern_id).alias("PatternId"),
        F.lit(action_type).alias("ActionType"),
        customer.alias("CustomerName"),
        F.col(merchant_col).cast("string").alias("MerchantId"),
    )


def low_weight_thresholds(importance: DataFrame, percentile: float = 0.01) -> DataFrame:
    """Per-(merchant, category) low-weight threshold from the importance
    dimension (reference ``Mechanism Y.py:84-89``: ``percentile_approx``
    of Weight at 0.01, keyed by (Target, typeTrans)).

    We keep ``percentile_approx`` for parity (it is deterministic for a
    given dataset and accuracy); callers that need oracle-exact semantics
    use the rank-based variant in ``operators.relational.exact_percentile``.
    """
    return (
        importance.groupBy("Target", "typeTrans")
        .agg(F.percentile_approx("Weight", F.lit(percentile)).alias("p1_weight"))
        .withColumnRenamed("Target", "merchant_key")
        .withColumnRenamed("typeTrans", "category_key")
    )


def enrich_batch(batch: DataFrame, importance: DataFrame) -> DataFrame:
    """J1 enrichment: batch left-joined to the importance dimension on
    (customer, merchant, category) (reference ``Mechanism Y.py:221``),
    broadcast because the dimension is small and cached."""
    dim = F.broadcast(importance)
    return batch.join(
        dim,
        on=(
            (batch["customer"] == dim["Source"])
            & (batch["merchant"] == dim["Target"])
            & (batch["category"] == dim["typeTrans"])
        ),
        how="left",
    )


def detect_patid1(
    merchant_state: DataFrame,
    customer_merchant_state: DataFrame,
    enriched_batch: DataFrame,
    weight_thresholds: DataFrame | None,
    thresholds: PatternThresholds,
    y_start: str,
    detection_time: str,
) -> DataFrame:
    """PatId1 "UPGRADE" (reference ``Mechanism Y.py:231-239``)."""
    active_merchants = merchant_state.filter(
        F.col("total_transactions") > thresholds.merchant_total_txns
    ).select("merchant_id")

    hot_pairs = customer_merchant_state.filter(
        F.col("transaction_count") > thresholds.customer_merchant_txns
    ).select("customer_id", "merchant_id")

    if weight_thresholds is not None:
        thr = F.broadcast(weight_thresholds)
        low_weight = (
            enriched_batch.join(
                thr,
                on=(
                    (enriched_batch["merchant"] == thr["merchant_key"])
                    & (enriched_batch["category"] == thr["category_key"])
                ),
                how="inner",
            )
            .filter(F.col("Weight") < F.col("p1_weight"))
            .select(
                F.col("customer").alias("customer_id"),
                F.col("merchant").alias("merchant_id"),
            )
            .distinct()
        )
    else:
        # fallback: fixed threshold (reference ``Mechanism Y.py:236-237``)
        low_weight = (
            enriched_batch.filter(
                F.col("Weight").isNotNull()
                & (F.col("Weight") < thresholds.fallback_weight)
            )
            .select(
                F.col("customer").alias("customer_id"),
                F.col("merchant").alias("merchant_id"),
            )
            .distinct()
        )

    # Reference chains inner joins then projects pair columns then distinct
    # (``Mechanism Y.py:239``); the right sides contribute no columns, so the
    # idiomatic plan is semi joins (no duplicate blow-up, smaller shuffle).
    qualified = (
        low_weight.join(active_merchants, on="merchant_id", how="left_semi")
        .join(hot_pairs, on=["customer_id", "merchant_id"], how="left_semi")
        .distinct()
    )
    return shape_detection(
        qualified, "PatId1", "UPGRADE", y_start, detection_time,
        customer_col="customer_id", merchant_col="merchant_id",
    )


def detect_patid2(
    customer_merchant_state: DataFrame,
    thresholds: PatternThresholds,
    y_start: str,
    detection_time: str,
) -> DataFrame:
    """PatId2 "CHILD" (reference ``Mechanism Y.py:243``): state-only scan.

    The average is the reference's null-safe ratio-of-sums
    ``coalesce(sum,0)/coalesce(count,1)``; expressed multiplicatively
    (``sum < threshold * count``) to stay in exact Decimal arithmetic.
    """
    avg_ok = F.coalesce(
        F.col("total_amount_sum"), F.lit(0).cast("decimal(18,2)")
    ) < (
        F.lit(thresholds.child_max_avg_amount)
        * F.coalesce(F.col("transaction_count"), F.lit(1))
    )
    qualified = customer_merchant_state.filter(
        (F.col("transaction_count") >= thresholds.child_min_txns) & avg_ok
    )
    return shape_detection(
        qualified, "PatId2", "CHILD", y_start, detection_time,
        customer_col="customer_id", merchant_col="merchant_id",
    )


def detect_patid3(
    merchant_gender_state: DataFrame,
    thresholds: PatternThresholds,
    y_start: str,
    detection_time: str,
) -> DataFrame:
    """PatId3 "DEI-NEEDED" (reference ``Mechanism Y.py:244``): state-only."""
    qualified = merchant_gender_state.filter(
        (F.col("female_transaction_count") < F.col("male_transaction_count"))
        & (F.col("female_transaction_count") > thresholds.dei_min_female)
    )
    return shape_detection(
        qualified, "PatId3", "DEI-NEEDED", y_start, detection_time,
        customer_col=None, merchant_col="merchant_id",
    )


def detect_all(
    merchant_state: DataFrame,
    customer_merchant_state: DataFrame,
    merchant_gender_state: DataFrame,
    enriched_batch: DataFrame,
    weight_thresholds: DataFrame | None,
    thresholds: PatternThresholds,
    clock: Clock,
    y_start: str,
) -> DataFrame:
    """Union of all three patterns (reference ``Mechanism Y.py:247-258``) -
    a single ``unionByName`` fold, no per-DF emptiness probes (each probe
    spawned an extra Spark job in the reference, ``:234``, ``:255``)."""
    detection_time = clock.now_str()
    p1 = detect_patid1(
        merchant_state, customer_merchant_state, enriched_batch,
        weight_thresholds, thresholds, y_start, detection_time,
    )
    p2 = detect_patid2(customer_merchant_state, thresholds, y_start, detection_time)
    p3 = detect_patid3(merchant_gender_state, thresholds, y_start, detection_time)
    return p1.unionByName(p2).unionByName(p3)
