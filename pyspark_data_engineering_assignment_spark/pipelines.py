"""End-to-end corpus curation: the operators composed as ONE pipeline.

Every stage exists (and is individually oracle-checked) elsewhere in
the repo; this module is the user-facing composition a training-data
team actually runs - filter -> exact-dedup (keep first) -> leakage-safe
split -> per-shard sequence packing - wired so the whole flow stays
declarative: one lazy DataFrame graph, no action until the caller
materializes, every stage a pure function of the input (re-runs and
retries reproduce the identical corpus).

Stage order matters and is deliberate:
  * quality gate FIRST (cheapest per row, shrinks everything after);
  * dedup before splitting (otherwise duplicate copies straddle
    splits - though the split is content-keyed and thus leak-safe even
    if dedup is skipped, duplicate TRAINING mass still skews);
  * split before packing (packs must never mix train and eval text).

Scale: gate is a per-row filter; dedup one fingerprint window; split a
per-row hash; packing one window per shard. Nothing crosses the driver;
the report frame aggregates each stage's row count in one union of
count-aggregates over the shared lineage (Spark reuses the common
subplans under AQE; at 100 TB run report and corpus in one job via
``df.observe`` counters instead of a second pass - tools/observe.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.functions.text import (
    md5_fingerprint,
    tokens,
)
from pyspark_data_engineering_assignment_spark.operators.packing import (
    pack_concat_chunks,
)
from pyspark_data_engineering_assignment_spark.operators.sampling import (
    content_safe_split,
)


@dataclass(frozen=True)
class CurationConfig:
    min_chars: int = 100
    min_tokens: int = 20
    splits: dict[str, int] = field(
        default_factory=lambda: {"train": 90, "val": 5, "test": 5}
    )
    pack_budget: int = 256
    n_shards: int = 8


def curate_corpus(
    docs: DataFrame,
    config: CurationConfig = CurationConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Returns {"corpus": packed clean docs, "report": stage counts}.

    ``corpus`` columns: id, split, shard, n_tokens, start_offset,
    pack_id (plus the original payload) - everything a loader needs to
    assemble fixed-budget training sequences per split.
    """
    toks = tokens(F.col(text_col))
    staged = docs.withColumn("n_tokens", F.size(toks)).withColumn(
        "fp", md5_fingerprint(F.col(text_col))
    )
    gated = staged.filter(
        (F.col("n_chars") >= config.min_chars)
        & (F.col("n_tokens") >= config.min_tokens)
    )
    # exact dedup, keep-first: one row_number window on the fingerprint
    w = Window.partitionBy("fp").orderBy(id_col)
    deduped = (
        gated.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    split = content_safe_split(deduped, text_col, config.splits)
    sharded = split.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(config.n_shards))
    )
    # packs must never mix splits: pack within (split, shard)
    packed = pack_concat_chunks(
        sharded.withColumn(
            "pack_key", F.concat_ws("/", "split", F.col("shard").cast("string"))
        ),
        id_col=id_col,
        token_col="n_tokens",
        shard_col="pack_key",
        budget=config.pack_budget,
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count("*").cast("long").alias("n_docs")
        )

    report = (
        stage("input", docs)
        .unionByName(stage("quality_gated", gated))
        .unionByName(stage("deduped", deduped))
        .unionByName(stage("packed", packed))
    )
    return {"corpus": packed, "report": report}
