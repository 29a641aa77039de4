from pyspark_data_engineering_assignment_spark.plans.registry import QUERIES, QuerySpec

# Importing these modules registers their queries into QUERIES.
from pyspark_data_engineering_assignment_spark.plans import text_queries  # noqa: F401
from pyspark_data_engineering_assignment_spark.plans import vector_queries  # noqa: F401

__all__ = ["QUERIES", "QuerySpec"]
