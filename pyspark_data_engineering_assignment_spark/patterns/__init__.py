from pyspark_data_engineering_assignment_spark.patterns.detect import (
    Clock,
    FixedClock,
    detect_all,
    detect_patid1,
    detect_patid2,
    detect_patid3,
    enrich_batch,
    low_weight_thresholds,
    shape_detection,
)

__all__ = [
    "Clock",
    "FixedClock",
    "detect_all",
    "detect_patid1",
    "detect_patid2",
    "detect_patid3",
    "enrich_batch",
    "low_weight_thresholds",
    "shape_detection",
]
