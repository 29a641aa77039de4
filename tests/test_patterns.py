"""Pattern golden tests (SURVEY §5.1): each detection pattern as a pure
function over in-memory DataFrames, exact rows asserted, deterministic
clock. Covers both PatId1 threshold paths (percentile table present /
fallback fixed weight) - the percentile path the e2e test doesn't touch.
Reference semantics: ``Mechanism Y.py:221-244``.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.config import PatternThresholds
from pyspark_data_engineering_assignment_spark.patterns.detect import (
    FixedClock,
    detect_patid1,
    detect_patid2,
    detect_patid3,
    enrich_batch,
    low_weight_thresholds,
)
from pyspark_data_engineering_assignment_spark import schemas as S

TH = PatternThresholds()
T0 = "2024-01-01 00:00:00"
T1 = "2024-01-01 00:00:05"


def _detections(df):
    return sorted(
        (r["PatternId"], r["ActionType"], r["CustomerName"], r["MerchantId"])
        for r in df.collect()
    )


def _merchant_state(spark, rows):
    return spark.createDataFrame(
        [(m, n, None) for m, n in rows], S.MERCHANT_STATE_SCHEMA
    )


def _cm_state(spark, rows):
    return spark.createDataFrame(
        [(c, m, n, Decimal(a) if a is not None else None, None) for c, m, n, a in rows],
        S.CUSTOMER_MERCHANT_STATE_SCHEMA,
    )


def _gender_state(spark, rows):
    return spark.createDataFrame(
        [(m, male, female, None) for m, male, female in rows],
        S.MERCHANT_GENDER_STATE_SCHEMA,
    )


def _batch(spark, rows):
    """(customer, merchant, category) triples as a minimal fact batch."""
    return spark.createDataFrame(
        [(c, m, cat) for c, m, cat in rows], ["customer", "merchant", "category"]
    )


def _importance(spark, rows):
    return spark.createDataFrame(
        rows, ["Source", "Target", "Weight", "typeTrans"]
    )


# ---------------------------------------------------------------------------
# PatId2 "CHILD" (Mechanism Y.py:243)
# ---------------------------------------------------------------------------

def test_patid2_thresholds_and_boundaries(spark):
    state = _cm_state(
        spark,
        [
            ("C1", "M1", 3, "60.00"),    # avg 20 < 23 -> fire
            ("C2", "M1", 2, "10.00"),    # count 2 < 3 -> no
            ("C3", "M1", 3, "69.00"),    # avg exactly 23 -> NOT < 23 -> no
            ("C4", "M1", 4, "91.99"),    # avg 22.9975 -> fire
            ("C5", "M1", 3, None),       # null sum coalesces to 0 -> fire
        ],
    )
    got = _detections(detect_patid2(state, TH, T0, T1))
    assert got == [
        ("PatId2", "CHILD", "C1", "M1"),
        ("PatId2", "CHILD", "C4", "M1"),
        ("PatId2", "CHILD", "C5", "M1"),
    ]


# ---------------------------------------------------------------------------
# PatId3 "DEI-NEEDED" (Mechanism Y.py:244)
# ---------------------------------------------------------------------------

def test_patid3_boundaries(spark):
    state = _gender_state(
        spark,
        [
            ("M1", 5, 3),   # f=3 > 2 and f < m -> fire
            ("M2", 3, 3),   # f == m -> no
            ("M3", 5, 2),   # f == dei_min (2), not > 2 -> no
            ("M4", 2, 3),   # f > m -> no
        ],
    )
    got = _detections(detect_patid3(state, TH, T0, T1))
    assert got == [("PatId3", "DEI-NEEDED", "", "M1")]


# ---------------------------------------------------------------------------
# PatId1 "UPGRADE" (Mechanism Y.py:231-239), both threshold paths
# ---------------------------------------------------------------------------

@pytest.fixture()
def patid1_inputs(spark):
    merchant = _merchant_state(spark, [("M1", 6), ("M2", 2)])  # M2 not active
    cm = _cm_state(
        spark,
        [
            ("C1", "M1", 3, "10.00"),   # hot pair
            ("C2", "M1", 2, "10.00"),   # count 2, not > 2
            ("C3", "M2", 9, "10.00"),   # hot but M2 inactive
        ],
    )
    importance = _importance(
        spark,
        [
            ("C1", "M1", 0.5, "cat_a"),   # low weight
            ("C2", "M1", 0.4, "cat_a"),   # low weight but pair not hot
            ("C3", "M2", 0.3, "cat_a"),   # low weight but merchant inactive
            ("C9", "M1", 9.0, "cat_a"),   # high weight
        ],
    )
    batch = _batch(
        spark,
        [
            ("C1", "M1", "cat_a"),
            ("C2", "M1", "cat_a"),
            ("C3", "M2", "cat_a"),
            ("C9", "M1", "cat_a"),
        ],
    )
    return merchant, cm, enrich_batch(batch, importance)


def test_patid1_fallback_weight_path(spark, patid1_inputs):
    merchant, cm, enriched = patid1_inputs
    got = _detections(
        detect_patid1(merchant, cm, enriched, None, TH, T0, T1)
    )
    # only (C1, M1): low weight (<2.0) AND hot pair AND active merchant
    assert got == [("PatId1", "UPGRADE", "C1", "M1")]


def test_patid1_percentile_threshold_path(spark, patid1_inputs):
    merchant, cm, enriched = patid1_inputs
    # crafted per-(merchant, category) thresholds: C1's weight 0.5 is
    # below M1/cat_a's 0.6; C9's 9.0 is not
    thresholds = spark.createDataFrame(
        [("M1", "cat_a", 0.6), ("M2", "cat_a", 0.1)],
        ["merchant_key", "category_key", "p1_weight"],
    )
    got = _detections(
        detect_patid1(merchant, cm, enriched, thresholds, TH, T0, T1)
    )
    assert got == [("PatId1", "UPGRADE", "C1", "M1")]

    # raise the bar above everyone: nothing fires
    none = spark.createDataFrame(
        [("M1", "cat_a", 0.1)], ["merchant_key", "category_key", "p1_weight"]
    )
    assert _detections(detect_patid1(merchant, cm, enriched, none, TH, T0, T1)) == []


def test_patid1_condition_is_batch_local(spark, patid1_inputs):
    """The low-weight condition looks only at the current batch: state
    qualifies (C1,M1) but a batch without their transaction emits nothing
    (Mechanism Y.py:235 nuance, survey §2.12)."""
    merchant, cm, _ = patid1_inputs
    importance = _importance(spark, [("C1", "M1", 0.5, "cat_a")])
    other_batch = enrich_batch(_batch(spark, [("C9", "M9", "cat_z")]), importance)
    got = _detections(detect_patid1(merchant, cm, other_batch, None, TH, T0, T1))
    assert got == []


# ---------------------------------------------------------------------------
# static setup: percentile table from the dimension (Mechanism Y.py:84-89)
# ---------------------------------------------------------------------------

def test_low_weight_thresholds_shape(spark):
    imp = _importance(
        spark,
        [
            ("C1", "M1", 1.0, "cat_a"),
            ("C2", "M1", 2.0, "cat_a"),
            ("C3", "M1", 9.0, "cat_b"),
        ],
    )
    rows = {
        (r["merchant_key"], r["category_key"]): r["p1_weight"]
        for r in low_weight_thresholds(imp, 0.01).collect()
    }
    # percentile_approx at 0.01 on tiny groups returns the smallest element
    assert rows == {("M1", "cat_a"): 1.0, ("M1", "cat_b"): 9.0}


def test_enrich_batch_left_join_keeps_unmatched(spark):
    imp = _importance(spark, [("C1", "M1", 1.0, "cat_a")])
    batch = _batch(spark, [("C1", "M1", "cat_a"), ("C2", "M2", "cat_b")])
    rows = {r["customer"]: r["Weight"] for r in enrich_batch(batch, imp).collect()}
    assert rows["C1"] == 1.0
    assert rows["C2"] is None


def test_detection_record_shape(spark):
    state = _gender_state(spark, [("M1", 5, 3)])
    out = detect_patid3(state, TH, T0, T1)
    assert [f.name for f in out.schema.fields] == [
        "YStartTime", "DetectionTime", "PatternId",
        "ActionType", "CustomerName", "MerchantId",
    ]
    assert all(f.dataType.typeName() == "string" for f in out.schema.fields)
    r = out.collect()[0]
    assert (r["YStartTime"], r["DetectionTime"]) == (T0, T1)
