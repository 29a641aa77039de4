"""Grouped-map transforms via ``applyInPandas``.

Completes the Arrow-batched Python triple the engine uses where built-in
expressions genuinely can't express the semantics:

  * ``mapInPandas`` - per-batch, stateless (multimodal features);
  * ``applyInPandasWithState`` - keyed streaming state (running counters);
  * ``applyInPandas`` (here) - whole-group batch transforms where the
    function needs the ENTIRE group in memory at once (normalization by
    group statistics, per-group model fits).

Scale contract of grouped-map: one shuffle on the group key and one
Arrow batch per GROUP - safe when groups are bounded (labels,
categories), wrong for unbounded groups (a hot key materializes in one
worker's memory). Bounded-group operators belong here; everything else
stays in expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

def _standardized_schema(embeddings: DataFrame, id_col: str, label_col: str) -> StructType:
    """Output schema mirrors the input's id/label types (label is int in
    the driver tables, string elsewhere - don't assume)."""
    return StructType(
        [
            StructField("vec_id", embeddings.schema[id_col].dataType, False),
            StructField("label", embeddings.schema[label_col].dataType, True),
            StructField("embedding_std", ArrayType(FloatType()), True),
        ]
    )


def standardize_embeddings_by_label(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    eps: float = 1e-8,
) -> DataFrame:
    """Per-label z-score normalization of embedding vectors (grouped
    whitening): within each label, every dimension is centered by the
    label mean and scaled by the label std. The group statistic makes
    this a genuine grouped-map - no per-row expression can see the
    whole label's distribution.

    Numpy-vectorized per group: stack -> mean/std -> broadcast - no
    Python loop over rows. Unit-tested against a pure-numpy
    reimplementation (tests/test_grouped.py).
    """

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
        mu = mat.mean(axis=0)
        sd = mat.std(axis=0)
        out = (mat - mu) / (sd + eps)
        return pd.DataFrame(
            {
                "vec_id": pdf[id_col],
                "label": pdf[label_col],
                "embedding_std": list(out.astype(np.float32)),
            }
        )

    return (
        embeddings.select(id_col, label_col, vec_col)
        .groupBy(label_col)
        .applyInPandas(
            standardize, schema=_standardized_schema(embeddings, id_col, label_col)
        )
    )
