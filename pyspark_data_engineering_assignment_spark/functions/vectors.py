"""Vector math over ``array<float>`` columns - pure built-in expressions.

Everything stays JVM-side (``zip_with`` / ``aggregate`` higher-order
functions inside whole-stage codegen); no UDF, no Python round-trip, no
driver materialization. This is the hot path of similarity search at
100 TB, so the expressions are written once here and reused.

Determinism contract: elements are cast to double *before* multiplying
(float32 products are exact in float64), and the fold is a sequential
left fold from 0.0 - bit-identical to the DuckDB oracle's
``list_reduce(list_transform(...))`` formulation (verified empirically:
0 bit-mismatches over 1500 pairs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in float64."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity: dot / (||a|| * ||b||), all in float64."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
