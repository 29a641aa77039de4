"""Deterministic sampling / dataset splitting for training-data pipelines.

``df.sample()`` / ``sampleBy()`` draw from Spark's per-partition RNG:
the result changes with partitioning, task retries at 100 TB can
double-draw rows, and no other engine can reproduce the selection. A
training pipeline needs the opposite: a row's split assignment must be
a PURE FUNCTION of its id - stable across runs, engines, repartitions,
and incremental reprocessing (a new shard of documents lands in the
same train/val/test proportions without reshuffling old ones).

The assignment here is the standard salted-hash bucket:

    bucket(id) = md5(id || '|' || salt) mod buckets

md5 is the one hash both Spark and DuckDB share bit-for-bit (the same
idiom as the KMV sketch, operators/sketches.py), so the exact membership
of every split is oracle-checkable, not just its size. Changing the
salt re-draws every assignment; keeping it pins the dataset forever.

Scale: pure per-row map work - no shuffle, no state, trivially
parallel; the filter for one split pushes nothing to the scan (the
hash must be computed) but costs one md5 per row, vectorized JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: the widest md5 prefix that parses into a
# signed BIGINT identically in Spark and DuckDB (see operators/sketches).
_HEX_CHARS = 15
DEFAULT_SALT = "split-v1"


def hash_bucket(
    id_col: Column, buckets: int = 100, salt: str = DEFAULT_SALT
) -> Column:
    """Uniform bucket in [0, buckets) as a pure function of (id, salt);
    a NULL id has no bucket (NULL out, like every SQL function of a
    NULL input)."""
    # concat, not concat_ws: concat_ws SKIPS null arguments, so a NULL
    # id silently hashed to the bucket of the bare salt string - every
    # unattributable row landed together in one salt-chosen bucket (and
    # downstream, one salt-chosen split). concat NULL-propagates,
    # matching the `||` arithmetic the DuckDB oracles replay.
    h = F.conv(
        F.substring(
            F.md5(F.concat(id_col.cast("string"), F.lit("|" + salt))),
            1,
            _HEX_CHARS,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(buckets))


def split_assignment(
    id_col: Column,
    splits: dict[str, int] | None = None,
    salt: str = DEFAULT_SALT,
) -> Column:
    """Map an id column to a split label by cumulative bucket ranges.

    ``splits`` maps label -> weight (integers summing to <= 100, in
    iteration order); the remainder (if any) falls into the LAST label.
    Default: train/val/test = 80/10/10.
    """
    splits = splits or {"train": 80, "val": 10, "test": 10}
    if not splits or any(w <= 0 for w in splits.values()):
        raise ValueError("splits must be positive weights")
    total = sum(splits.values())
    if total > 100:
        raise ValueError(f"split weights sum to {total} > 100")
    b = hash_bucket(id_col, buckets=100, salt=salt)
    labels = list(splits)
    expr = None
    cum = 0
    for label in labels[:-1]:
        cum += splits[label]
        expr = (
            F.when(b < cum, label) if expr is None else expr.when(b < cum, label)
        )
    last = F.lit(labels[-1])
    base = last if expr is None else expr.otherwise(last)
    # A NULL id has no bucket; without this guard the when-chain's
    # NULL comparisons fall through to otherwise() and every
    # unattributable row lands in the LAST label - which in the
    # conventional train/val/test layout is the EVAL set. Missing
    # identity must surface as a visible NULL split, never a silent
    # assignment.
    return F.when(b.isNull(), F.lit(None).cast("string")).otherwise(base)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, int] | None = None,
    salt: str = DEFAULT_SALT,
    out_col: str = "split",
) -> DataFrame:
    """Attach a deterministic split label column to ``df``."""
    return df.withColumn(out_col, split_assignment(F.col(id_col), splits, salt))


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = DEFAULT_SALT,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership a pure function of the id.

    Unlike ``df.sample``, re-running (or re-partitioning, or resuming a
    failed job) selects exactly the same rows, and appending new data
    samples it at the same rate without disturbing prior selections.
    A NULL id has no bucket (NULL comparison is never true), so an
    unattributable row is never sampled.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(round(fraction * buckets))
    return df.filter(hash_bucket(F.col(id_col), buckets, salt) < threshold)


def stratified_take(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    n_per_stratum: int,
    salt: str = DEFAULT_SALT,
) -> DataFrame:
    """Deterministic per-stratum quota sample: up to ``n_per_stratum``
    rows from every stratum, chosen by hash order - the "at least n
    examples of every language/source" selection a training-mix builder
    runs, made reproducible.

    Rows are ranked inside each stratum by (hash_bucket, id) - a total
    order that is a pure function of (id, salt) - and the top n kept.
    Re-running, repartitioning, or appending data outside the winning
    set returns the identical sample; appending new rows can only
    displace prior winners when their hash ranks earlier (quota
    semantics, still deterministic).

    Scale: one window per stratum (hash-partitioned shuffle); state is
    bounded by the rank cutoff, and WindowGroupLimit pushes the top-n
    filter below the sort at the executor, so no stratum ever
    materializes fully sorted.
    """
    from pyspark.sql import Window

    # The contract is purity in (id, salt): a NULL-id row has no
    # deterministic identity, and after hash_bucket's NULL propagation
    # it would sort FIRST in its stratum (asc nulls-first) and steal a
    # quota slot from every real row. Unattributable rows take nothing.
    df = df.filter(F.col(id_col).isNotNull())
    rank_hash = hash_bucket(F.col(id_col), buckets=1 << 30, salt=salt)
    w = Window.partitionBy(*strata_cols).orderBy(
        rank_hash.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def content_safe_split(
    df: DataFrame,
    text_col: str = "text",
    splits: dict[str, int] | None = None,
    salt: str = DEFAULT_SALT,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe split: assign by the CONTENT fingerprint, not the
    row id, so exact duplicates always land in the same split - an
    id-keyed split leaks a copy of a training document into the eval
    set whenever duplicates survive upstream dedup, silently inflating
    eval scores. Still a pure per-row map (no shuffle, no join): the
    md5 fingerprint IS the group key, so co-assignment needs no
    clustering pass. For NEAR-duplicate safety, compose with
    ``dedup.duplicate_clusters`` and split on the cluster
    representative instead - that buys transitive safety at the cost
    of the clustering join.
    """
    from pyspark_data_engineering_assignment_spark.functions.text import (
        md5_fingerprint,
    )

    return df.withColumn(
        out_col, split_assignment(md5_fingerprint(F.col(text_col)), splits, salt)
    )
