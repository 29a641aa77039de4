from pyspark_data_engineering_assignment_spark.tools.feeder import feed_chunks

__all__ = ["feed_chunks"]
