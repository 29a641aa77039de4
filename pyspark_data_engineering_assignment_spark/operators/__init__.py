from pyspark_data_engineering_assignment_spark.operators.aggregates import (
    customer_merchant_batch_aggregate,
    gender_pivot_aggregate,
    merchant_batch_aggregate,
)
from pyspark_data_engineering_assignment_spark.operators.relational import (
    exact_percentile_threshold,
)

__all__ = [
    "customer_merchant_batch_aggregate",
    "gender_pivot_aggregate",
    "merchant_batch_aggregate",
    "exact_percentile_threshold",
]
