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
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.functions.guards import valid_vector
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

def _standardized_schema(embeddings: DataFrame, id_col: str, label_col: str) -> StructType:
    """Output schema mirrors the input's id/label NAMES and types (label
    is int in the driver tables, string elsewhere - don't assume; and
    hard-coding 'vec_id'/'label' here would mismatch the pandas frame
    the UDF builds for any non-default column names)."""
    return StructType(
        [
            StructField(id_col, embeddings.schema[id_col].dataType, False),
            StructField(label_col, embeddings.schema[label_col].dataType, True),
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
        # sort by id FIRST: numpy's pairwise mean/std sums depend on row
        # order, and the group's arrival order depends on the shuffle -
        # without the sort the standardized floats differed in the last
        # ulp between runs/partitionings, which is why this operator
        # could only carry a rows-only check. Sorted, the output is a
        # pure function of the group's CONTENT (pinned by the
        # partitioning-invariance test), even though the float stats
        # remain unreplayable in SQL.
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
        mu = mat.mean(axis=0)
        sd = mat.std(axis=0)
        out = (mat - mu) / (sd + eps)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                label_col: pdf[label_col],
                "embedding_std": list(out.astype(np.float32)),
            }
        )

    return (
        # a NULL vector is a corrupt/missing row, not a sample: np.stack
        # would crash the whole group on it, and including it in the
        # label's mean/std would be wrong anyway - same exclusion as the
        # similarity operators' NULL-cos filter. A NaN ELEMENT is worse
        # than a crash: one NaN vector makes the label's mean and std
        # NaN, standardizing EVERY vector in the group to NaN - silent
        # whole-group poisoning - so NaN-bearing vectors are excluded
        # with the NULLs.
        embeddings.select(id_col, label_col, vec_col)
        # the extra arm: F.exists ignores NULL elements (measured), so a
        # NULL-holed vector would slip into the pandas batch as an
        # object-dtype column and poison the group's mean/std
        .filter(valid_vector(vec_col))
        .groupBy(label_col)
        .applyInPandas(
            standardize, schema=_standardized_schema(embeddings, id_col, label_col)
        )
    )


LAG_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_purchases", LongType(), True),
        StructField("n_attributed", LongType(), True),
        StructField("median_lag_seconds", DoubleType(), True),
    ]
)


def conversion_lag_stats(
    purchases: DataFrame,
    clicks: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user conversion-lag statistics via COGROUPED applyInPandas:
    both sides of a key are delivered to Python together, one Arrow
    batch pair per key - the shape for per-key sequence alignment that
    would need N self-joins as expressions. For each purchase, the lag
    to the user's latest prior click (numpy searchsorted over the sorted
    click times); emits per-user counts and the median attributed lag.

    Same bounded-group contract as grouped-map: one shuffle per side on
    the key, a key's full history materializes in one worker.
    """

    def stats(p: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame(columns=[f.name for f in LAG_SCHEMA.fields])
        uid = p[key_col].iloc[0]
        pt = np.sort(p[ts_col].values.astype("datetime64[us]").astype("int64"))
        ct = np.sort(c["_right_ts"].values.astype("datetime64[us]").astype("int64")) if not c.empty else np.array([], dtype="int64")
        idx = np.searchsorted(ct, pt, side="right") - 1
        attributed = idx >= 0
        lags = (pt[attributed] - ct[idx[attributed]]) / 1_000_000.0
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_purchases": [len(pt)],
                "n_attributed": [int(attributed.sum())],
                "median_lag_seconds": [float(np.median(lags)) if len(lags) else None],
            }
        )

    # The right side's time column is renamed before the cogroup: when
    # both sides derive from the SAME scan, their identically-named
    # columns share one attribute id, and Catalyst's attribute dedup
    # prunes the right side's copy - the Python function would receive a
    # click frame without its timestamp. Distinct names sidestep it.
    return (
        purchases.select(key_col, ts_col)
        .groupBy(key_col)
        .cogroup(
            clicks.select(key_col, F.col(ts_col).alias("_right_ts")).groupBy(key_col)
        )
        .applyInPandas(stats, schema=LAG_SCHEMA)
    )
