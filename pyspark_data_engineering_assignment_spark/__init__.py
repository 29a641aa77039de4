"""PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``Daso007/pyspark-data-engineering-assignment``
(a financial-transaction pattern-detection pipeline: chunked CSV ingest ->
Structured Streaming -> cumulative keyed state -> three detection patterns ->
50-row CSV detection files), extended with the operators a large-scale
LLM-training-data pipeline needs (dedup, similarity search, text analysis,
multimodal column plumbing).

Design rules (100 TB first):
  * DataFrame / SQL everywhere; RDDs never.
  * Catalyst does the optimizing - we express plans declaratively and verify
    pushdown / broadcast / codegen with ``plans.explain`` helpers.
  * No driver-side materialization in any operator: nothing crosses the
    driver except metadata and explicitly-bounded top-k results.
  * Python UDFs only as Arrow-batched pandas UDFs, and only where built-in
    functions genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from pyspark_data_engineering_assignment_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
