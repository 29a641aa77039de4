"""Deterministic hash split / sampling: stability, disjointness, purity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    split_assignment,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


def test_split_exhaustive_and_disjoint(spark, ids):
    out = hash_split(ids, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000


def test_split_proportions(spark, ids):
    counts = {
        r["split"]: r["n"]
        for r in hash_split(ids, "doc_id").groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    # 80/10/10 with binomial noise on n=2000 (sd ~ 18 for train, ~13 for others)
    assert abs(counts["train"] - 1600) < 100
    assert abs(counts["val"] - 200) < 70
    assert abs(counts["test"] - 200) < 70


def test_split_is_pure_function_of_id(spark, ids):
    a = {r.doc_id: r.split for r in hash_split(ids, "doc_id").collect()}
    shuffled = ids.repartition(13, F.col("doc_id"))
    b = {r.doc_id: r.split for r in hash_split(shuffled, "doc_id").collect()}
    assert a == b


def test_salt_redraws_assignments(spark, ids):
    a = {r.doc_id: r.split for r in hash_split(ids, "doc_id", salt="s1").collect()}
    b = {r.doc_id: r.split for r in hash_split(ids, "doc_id", salt="s2").collect()}
    changed = sum(1 for k in a if a[k] != b[k])
    assert changed > 400  # ~1 - (0.8^2 + 0.1^2 + 0.1^2) of 2000


def test_custom_weights_remainder_to_last(spark, ids):
    out = hash_split(ids, "doc_id", splits={"a": 50, "b": 25})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # b takes its 25 plus the undeclared remainder 25
    assert abs(counts["a"] - 1000) < 90
    assert abs(counts["b"] - 1000) < 90


def test_invalid_weights_rejected(spark, ids):
    with pytest.raises(ValueError):
        hash_split(ids, "doc_id", splits={"a": 60, "b": 50})
    with pytest.raises(ValueError):
        hash_split(ids, "doc_id", splits={"a": 0})


def test_deterministic_sample_nested_and_stable(spark, ids):
    s30 = set(r.doc_id for r in deterministic_sample(ids, "doc_id", 0.3).collect())
    s60 = set(r.doc_id for r in deterministic_sample(ids, "doc_id", 0.6).collect())
    # nested: raising the fraction only ADDS rows (same hash, higher cut)
    assert s30 <= s60
    assert abs(len(s30) - 600) < 120
    assert abs(len(s60) - 1200) < 120
    # appending new data never disturbs prior membership
    bigger = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    s30_b = set(
        r.doc_id
        for r in deterministic_sample(bigger, "doc_id", 0.3).collect()
        if r.doc_id < 2000
    )
    assert s30 == s30_b


def test_deterministic_sample_bounds(spark, ids):
    assert deterministic_sample(ids, "doc_id", 0.0).count() == 0
    assert deterministic_sample(ids, "doc_id", 1.0).count() == 2000
    with pytest.raises(ValueError):
        deterministic_sample(ids, "doc_id", 1.5)


def test_stratified_take_quota_and_determinism(spark):
    from pyspark_data_engineering_assignment_spark.operators.sampling import (
        stratified_take,
    )

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    out = stratified_take(df, ["lang"], "doc_id", n_per_stratum=5)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, set()).add(r.doc_id)
    assert set(per) == {"0", "1", "2"}
    assert all(len(v) == 5 for v in per.values())
    # pure function of (id, salt): repartitioning changes nothing
    again = stratified_take(
        df.repartition(17, F.col("doc_id")), ["lang"], "doc_id", n_per_stratum=5
    ).collect()
    assert {(r.doc_id, r.lang) for r in rows} == {(r.doc_id, r.lang) for r in again}


def test_stratified_take_small_stratum_kept_whole(spark):
    from pyspark_data_engineering_assignment_spark.operators.sampling import (
        stratified_take,
    )

    df = spark.createDataFrame(
        [(1, "rare"), (2, "rare"), *[(i, "common") for i in range(10, 40)]],
        ["doc_id", "lang"],
    )
    out = stratified_take(df, ["lang"], "doc_id", n_per_stratum=5)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"rare": 2, "common": 5}


def test_content_safe_split_colocates_duplicates(spark):
    """Planted duplicate texts (distinct doc_ids) must always share a
    split under content_safe_split; the id-keyed hash_split has no such
    guarantee (that asymmetry is the operator's reason to exist). Also
    pins normalization: case/whitespace variants co-assign."""
    from pyspark_data_engineering_assignment_spark.operators.sampling import (
        content_safe_split,
        hash_split,
    )

    dup = "the same document text appears many times in the corpus"
    rows = [(i, dup) for i in range(40)] + [
        (100 + i, f"unique document number {i}") for i in range(40)
    ]
    rows += [(500, "  THE SAME document text appears many times in the corpus ".lower()), (501, dup.upper())]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    out = content_safe_split(docs).collect()
    dup_splits = {
        r["split"] for r in out if r["text"].strip().lower() == dup.lower()
    }
    assert len(dup_splits) == 1  # every copy/variant in ONE split

    # same rows split by id scatter across splits (40 dup ids -> ~80/10/10)
    by_id = hash_split(docs, "doc_id").collect()
    id_splits = {r["split"] for r in by_id if r["text"].strip().lower() == dup.lower()}
    assert len(id_splits) > 1


def test_null_ids_have_no_bucket_anywhere(spark):
    """A NULL id is an unattributable row, and every sampling operator
    must treat it as identity-less, never as a silent assignment.
    Before this pin, concat_ws SKIPPED the NULL id so every NULL row
    hashed to the bucket of the bare salt string: all of them landed
    together in one salt-chosen split (and the split_assignment
    when-chain would otherwise dump a NULL bucket into the LAST label -
    the eval set)."""
    from pyspark_data_engineering_assignment_spark.operators.sampling import (
        content_safe_split,
        deterministic_sample,
        hash_split,
        stratified_take,
    )

    ids = spark.createDataFrame(
        [(1, "g"), (None, "g"), (2, "g"), (None, "h")],
        "doc_id long, lang string",
    )
    # hash_split: NULL id -> visible NULL split, real ids unaffected
    splits = {r["doc_id"]: r["split"] for r in hash_split(ids, "doc_id").collect()}
    assert splits[1] is not None and splits[2] is not None
    assert splits[None] is None
    # content_safe_split: NULL text -> NULL split ('' keeps its own)
    docs = spark.createDataFrame([("x",), (None,), ("",)], "text string")
    by_text = {
        r["text"]: r["split"] for r in content_safe_split(docs).collect()
    }
    assert by_text["x"] is not None and by_text[""] is not None
    assert by_text[None] is None
    # deterministic_sample: a NULL id can never be selected
    kept = deterministic_sample(ids, "doc_id", fraction=1.0).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2]
    # stratified_take: NULL-id rows neither win nor occupy quota slots
    took = stratified_take(ids, ["lang"], "doc_id", n_per_stratum=2).collect()
    assert sorted(r["doc_id"] for r in took) == [1, 2]
