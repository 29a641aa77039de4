"""Sequence packing: assign documents to fixed-token-budget training
sequences ("packs") the way LLM pretraining lays out a corpus - shard
the corpus, concatenate each shard's documents end-to-end in a
deterministic order, and cut the token stream every ``budget`` tokens.
A document's pack is the chunk its FIRST token falls in (concat-and-
chunk semantics; long documents simply spill into the next chunk, they
are not re-ordered - bin-repacking heuristics trade determinism for
fill rate and are out of scope).

Scale design: the only shuffle is the hash partition on ``shard``; the
per-shard running offset is a bounded-state window (sum over rows
UNBOUNDED PRECEDING - Spark streams it, no buffering of the frame).
Shard count is the parallelism knob: at 100 TB you size shards so one
shard's token stream is a few GB and let 1000 executors each own a
disjoint shard set. Everything is integer arithmetic - exact in any
engine, so a DuckDB oracle can replay the assignment bit-for-bit.

No equivalent in the reference (its surface is row-relational only);
this extends the engine for training-data preparation per the build
brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_concat_chunks(
    df: DataFrame,
    id_col: str,
    token_col: str,
    shard_col: str,
    budget: int = 2048,
) -> DataFrame:
    """Adds ``start_offset`` (tokens preceding this doc in its shard's
    concatenated stream) and ``pack_id`` (= start_offset DIV budget).

    Deterministic: ordering within a shard is by ``id_col``, so the
    assignment is a pure function of (shard, id, token counts) -
    re-runs, engine changes and repartitioning cannot move a document
    to a different pack.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "start_offset",
        (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long"),
    ).withColumn("pack_id", F.expr(f"start_offset DIV {int(budget)}"))


def pack_summary(packed: DataFrame, shard_col: str, token_col: str) -> DataFrame:
    """Per-(shard, pack) fill report: docs starting in the pack and
    their total tokens. One hash aggregate; integer-exact."""
    return packed.groupBy(shard_col, "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(token_col)).cast("long").alias("pack_tokens"),
    )
