"""The composed curation pipeline: invariants that must hold for ANY
input - no duplicate fingerprints survive, splits are content-coherent
and cover everything, packs never mix splits, token mass is conserved,
and the whole flow is deterministic under repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.pipelines import (
    CurationConfig,
    curate_corpus,
)
from pyspark_data_engineering_assignment_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
CFG = CurationConfig(pack_budget=128, n_shards=4)


def test_curation_pipeline_invariants(spark):
    docs = load_table(spark, SF, "documents")
    out = curate_corpus(docs, CFG)
    corpus = out["corpus"].cache()
    try:
        report = {r["stage"]: r["n_docs"] for r in out["report"].collect()}
        assert report["input"] == 500
        assert report["quality_gated"] <= report["input"]
        assert report["deduped"] <= report["quality_gated"]
        assert report["packed"] == report["deduped"]

        # no duplicate fingerprints survive
        assert corpus.groupBy("fp").count().filter("count > 1").count() == 0
        # every surviving doc has a split; splits roughly honor weights
        n = corpus.count()
        by_split = {
            r["split"]: r["count"]
            for r in corpus.groupBy("split").count().collect()
        }
        assert set(by_split) <= {"train", "val", "test"}
        assert sum(by_split.values()) == n
        assert by_split["train"] > 0.6 * n
        # packs never mix splits: pack_key embeds the split
        mixed = (
            corpus.groupBy("pack_key", "pack_id")
            .agg(F.countDistinct("split").alias("k"))
            .filter("k > 1")
            .count()
        )
        assert mixed == 0
        # token mass conserved: sum of n_tokens == max offset + last size
        for row in (
            corpus.groupBy("pack_key")
            .agg(
                F.sum("n_tokens").alias("total"),
                F.max(F.col("start_offset") + F.col("n_tokens")).alias("end"),
            )
            .collect()
        ):
            assert row["total"] == row["end"]
    finally:
        corpus.unpersist()


def test_curation_pipeline_deterministic_under_repartition(spark):
    docs = load_table(spark, SF, "documents")
    a = curate_corpus(docs, CFG)["corpus"].select(
        "doc_id", "split", "shard", "pack_key", "pack_id", "start_offset"
    )
    b = curate_corpus(docs.repartition(13), CFG)["corpus"].select(
        "doc_id", "split", "shard", "pack_key", "pack_id", "start_offset"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
