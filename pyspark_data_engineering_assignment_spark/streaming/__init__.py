from pyspark_data_engineering_assignment_spark.streaming.pipeline import DetectionPipeline
from pyspark_data_engineering_assignment_spark.streaming.sink import write_detections

__all__ = ["DetectionPipeline", "write_detections"]
