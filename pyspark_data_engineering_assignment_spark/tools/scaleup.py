"""Deterministic scale-up of a driver testdata dir for scaling sweeps.

Replicates an sf directory ``factor``x with TPC-H-faithful cardinality
semantics so sf0.1 -> sf1.0 wall-time ratios measure the ENGINE's
scaling, not an artifact of the copy process:

  * ``nation``/``region`` stay fixed (25/5 rows at every sf, like TPC-H).
  * ``customer``/``supplier``/``part``/``orders``/``lineitem``/``events``
    replicate with every key column offset by ``copy * stride`` (stride =
    max key + 1), so copy *i*'s facts reference copy *i*'s dimensions -
    join fan-out, per-key group sizes and filter selectivities are
    IDENTICAL to the source, only the table sizes grow.
  * ``documents``: copy *i* > 0 tags every 4th token with ``_i``. A pure
    text copy would make each doc an exact/near duplicate of its 9
    replicas, quadratically inflating every near-dup query's OUTPUT
    (C(10,2)=45 pairs per source doc) - not what real 10x data looks
    like. Tagging every 4th token breaks essentially all 3+-gram
    shingles across copies (every shingle spans a tagged token) while
    preserving per-doc length/token statistics. ``n_chars`` is
    recomputed (the generator's invariant n_chars == length(text)).
  * ``embeddings``: copy *i* adds a small deterministic per-(copy, dim)
    offset so replicas are not exact duplicates but the norm/cosine
    distribution is preserved.

Timestamps are written by Spark as TIMESTAMP(MICROS); ``load_table``
normalizes every encoding the driver generator has used, so the scaled
dir loads identically.

This is a measurement tool (SCALING.md sf0.1->sf1.0 sweep), NOT a
correctness input: the oracle gates always run on the driver's own
testdata.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.sources.tables import load_table

# key columns offset per copy, per table (stride = max(primary key) + 1
# of the table OWNING the key, so FKs follow their dimension's stride)
_KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
}

_STRIDE_KEY = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
}


def _strides(spark: SparkSession, src_dir: str) -> dict[str, int]:
    out = {}
    for name, (table, col) in _STRIDE_KEY.items():
        mx = load_table(spark, src_dir, table).agg(F.max(col)).first()[0]
        out[name] = int(mx) + 1
    return out


def _replicate_keyed(
    df: DataFrame, key_cols: dict[str, str], strides: dict[str, int], factor: int
) -> DataFrame:
    copies = df.withColumn("_copy", F.explode(F.lit(list(range(factor)))))
    for col, stride_of in key_cols.items():
        copies = copies.withColumn(
            col, F.col(col) + F.col("_copy").cast("long") * F.lit(strides[stride_of])
        )
    return copies.drop("_copy")


def _replicate_documents(df: DataFrame, factor: int) -> DataFrame:
    copies = df.withColumn("_copy", F.explode(F.lit(list(range(factor)))))
    stride = 10 ** 9  # doc ids are small; any stride > max(doc_id) works
    tagged = F.when(
        F.col("_copy") == 0, F.col("text")
    ).otherwise(
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t, j: F.when(
                    j % 4 == 0, F.concat(t, F.lit("_"), F.col("_copy"))
                ).otherwise(t),
            ),
        )
    )
    return (
        copies.withColumn("doc_id", F.col("doc_id") + F.col("_copy").cast("long") * F.lit(stride))
        .withColumn("text", tagged)
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("_copy")
    )


def _replicate_embeddings(df: DataFrame, factor: int) -> DataFrame:
    """Copy *i* = circular-roll(vec, i mod dim) * sign, sign flipping
    every ``dim`` copies, plus a small per-(copy, dim) offset. Round-7
    fix: the original perturbation-only copies stayed cosine-aligned
    (cos ~0.9998 to their source), so every copy group was a genuine
    near-dup cluster and embedding near-dup OUTPUT grew quadratically
    in the factor - a copy artifact, not a property of real 10x data
    (the text tables already avoided this via token tagging). Rolling
    de-correlates copies (random-ish vectors' rotations are near-
    orthogonal) while preserving norms exactly; the sign flip keeps
    copies i and i+dim (same roll) from re-aligning, so no cross-copy
    near-dups up to factor = 2*dim."""
    copies = df.withColumn("_copy", F.explode(F.lit(list(range(factor)))))
    stride = 10 ** 9
    dim = F.size(F.col("embedding"))
    shift = F.col("_copy") % dim
    # flip period = the ACTUAL embedding dim (copies i and i+dim share a
    # roll, so they must get opposite signs regardless of what dim is -
    # a literal 64 was only correct for 64-d embeddings)
    sign = F.when(
        (F.col("_copy").cast("long") / dim.cast("long")).cast("long") % 2 == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0)).cast("float")
    rolled = F.transform(
        F.col("embedding"),
        lambda v, j: (
            F.element_at(F.col("embedding"), ((j + shift) % dim) + 1) * sign
            + ((F.col("_copy") * 31 + j) % 7 - F.lit(3)).cast("float")
            * F.lit(0.003).cast("float")
            * F.when(F.col("_copy") == 0, F.lit(0.0)).otherwise(F.lit(1.0)).cast(
                "float"
            )
        ).cast("float"),
    )
    return (
        copies.withColumn("vec_id", F.col("vec_id") + F.col("_copy").cast("long") * F.lit(stride))
        .withColumn("embedding", rolled)
        .drop("_copy")
    )


def build_scaled_dir(
    spark: SparkSession, src_dir: str, dst_dir: str, factor: int = 10
) -> None:
    """Materialize ``factor``x-scaled copies of every table in ``src_dir``
    as one parquet dir per table under ``dst_dir`` (idempotent: skips
    tables already present)."""
    os.makedirs(dst_dir, exist_ok=True)
    strides = _strides(spark, src_dir)
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        out = f"{dst_dir}/{name}.parquet"
        if os.path.exists(out):
            continue
        df = load_table(spark, src_dir, name)
        if name in ("region", "nation"):
            scaled = df
        elif name == "documents":
            scaled = _replicate_documents(df, factor)
        elif name == "embeddings":
            scaled = _replicate_embeddings(df, factor)
        else:
            scaled = _replicate_keyed(df, _KEYED[name], strides, factor)
        # 8 output files per big table: enough input splits that sf1.0
        # scans parallelize, small enough to stay realistic row groups
        n_files = 1 if name in ("region", "nation") else 8
        scaled.repartition(n_files).write.mode("overwrite").parquet(out)
