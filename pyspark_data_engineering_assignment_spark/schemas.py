"""Explicit schemas - never inferred (reference ``Mechanism Y.py:35-64``).

The reference declares every schema as a static ``StructType``; we keep that
discipline because at 100 TB schema inference is a full extra scan.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DecimalType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Fact stream: BankSim-style transactions (reference ``Mechanism Y.py:35-41``).
TRANSACTION_SCHEMA = StructType(
    [
        StructField("step", IntegerType(), True),
        StructField("customer", StringType(), True),
        StructField("age", StringType(), True),  # string on purpose: bands + 'U'
        StructField("gender", StringType(), True),
        StructField("zipcodeOri", StringType(), True),
        StructField("merchant", StringType(), True),
        StructField("zipMerchant", StringType(), True),
        StructField("category", StringType(), True),
        StructField("amount", FloatType(), True),
        StructField("fraud", IntegerType(), True),
    ]
)

# Static dimension: customer importance weights (reference ``Mechanism Y.py:42-46``).
IMPORTANCE_SCHEMA = StructType(
    [
        StructField("Source", StringType(), True),
        StructField("Target", StringType(), True),
        StructField("Weight", FloatType(), True),
        StructField("typeTrans", StringType(), True),
        StructField("fraud", IntegerType(), True),  # renamed ci_fraud on load
    ]
)

# Cumulative state tables (reference ``sql/postgres_tables.sql:3-25``,
# Spark mirrors ``Mechanism Y.py:47-59``). Money standardizes on
# DECIMAL(18,2) at the state layer (survey §1.3).
MERCHANT_STATE_SCHEMA = StructType(
    [
        StructField("merchant_id", StringType(), False),
        StructField("total_transactions", LongType(), True),
        StructField("last_updated", TimestampType(), True),
    ]
)

CUSTOMER_MERCHANT_STATE_SCHEMA = StructType(
    [
        StructField("customer_id", StringType(), False),
        StructField("merchant_id", StringType(), False),
        StructField("transaction_count", LongType(), True),
        StructField("total_amount_sum", DecimalType(18, 2), True),
        StructField("last_updated", TimestampType(), True),
    ]
)

MERCHANT_GENDER_STATE_SCHEMA = StructType(
    [
        StructField("merchant_id", StringType(), False),
        StructField("male_transaction_count", LongType(), True),
        StructField("female_transaction_count", LongType(), True),
        StructField("last_updated", TimestampType(), True),
    ]
)

# Detection record (reference ``Mechanism Y.py:60-64``): six string columns,
# timestamps pre-formatted as IST strings by an injectable clock.
DETECTION_SCHEMA = StructType(
    [
        StructField("YStartTime", StringType(), True),
        StructField("DetectionTime", StringType(), True),
        StructField("PatternId", StringType(), True),
        StructField("ActionType", StringType(), True),
        StructField("CustomerName", StringType(), True),
        StructField("MerchantId", StringType(), True),
    ]
)
