"""Unit tests for the dedup operators (operators/dedup.py).

Covers the guarantees the registry's rows-only entries rely on:
  * exact dedup groups,
  * LSH precision (output is a subset of exact-Jaccard pairs - the
    verify stage makes this structural) and recall vs the exact
    all-pairs baseline,
  * the short-doc guard: docs with fewer than shingle_len tokens are
    excluded from the LSH path (no all-null-signature mega-bucket),
  * SimHash signature determinism + identical-doc detection,
  * the ngram-Jaccard bucket-size cap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pyspark_data_engineering_assignment_spark.operators.dedup import (
    exact_duplicate_groups,
    minhash_lsh_candidates,
    minhash_lsh_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
    simhash_signatures,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
    ]
)

BASE = "the quick brown fox jumps over the lazy dog while watching stars at night"
OTHER = "completely different subject matter about databases indexes and storage engines"
THIRD = "rain falls softly on the quiet village roofs as morning light arrives slowly"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                      # exact duplicate of 0
        (2, BASE + " tonight"),         # near-dup of 0 (shingle Jaccard ~0.92)
        (3, OTHER),
        (4, THIRD),
        (5, OTHER + " now"),            # near-dup of 3 (shingle Jaccard ~0.89)
        # short docs: fewer than shingle_len(=3) tokens
        (10, "hi"),
        (11, "hi"),                     # identical short doc
        (12, "ok then"),
        (13, "yo"),
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}


def exact_jaccard_pairs(docs, threshold=0.7, shingle_len=3):
    """All-pairs exact shingle-set Jaccard - the brute-force baseline."""
    from pyspark_data_engineering_assignment_spark.functions.text import word_ngrams

    sh = docs.select(
        "doc_id", F.array_distinct(word_ngrams(F.col("text"), shingle_len)).alias("sh")
    ).filter(F.size("sh") > 0)
    a, b = sh.alias("a"), sh.alias("b")
    num = int(round(threshold * 100))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.size(F.array_intersect("a.sh", "b.sh")).alias("i"),
            F.size(F.array_union("a.sh", "b.sh")).alias("u"),
        )
        .filter((F.col("u") > 0) & (F.col("i") * 100 >= F.col("u") * num))
    )


def test_exact_duplicate_groups(spark, docs):
    groups = {
        r["keeper_id"]: r["n_docs"] for r in exact_duplicate_groups(docs).collect()
    }
    assert groups == {0: 2, 10: 2}  # {0,1} and {10,11}


@pytest.mark.slow
def test_minhash_lsh_matches_exact_baseline(spark, docs):
    exact = _pairs(exact_jaccard_pairs(docs, 0.7))
    lsh = _pairs(minhash_lsh_near_duplicates(docs, jaccard_threshold=0.7))
    # precision is structural (verify stage recomputes exact Jaccard)
    assert lsh <= exact
    # recall on this fixture: every planted near-dup pair is found
    assert (0, 1) in lsh and (0, 2) in lsh and (1, 2) in lsh and (3, 5) in lsh
    assert len(lsh) == len(exact), f"missed pairs: {exact - lsh}"


@pytest.mark.slow
def test_minhash_lsh_shipped_config_matches_exact_baseline(spark, docs):
    # The registry query ships 48 hashes / 12 bands (see
    # plans/text_queries.py minhash_lsh_neardup): same structural
    # precision, full recall on the planted fixture.
    exact = _pairs(exact_jaccard_pairs(docs, 0.7))
    lsh = _pairs(
        minhash_lsh_near_duplicates(
            docs, num_hashes=48, bands=12, jaccard_threshold=0.7
        )
    )
    assert lsh <= exact
    assert len(lsh) == len(exact), f"missed pairs: {exact - lsh}"


def test_minhash_fused_shingles_value_identical(spark):
    """Round-15: fused shingle hashing (hash inside one transform over
    the token array, no shingle-string array materialized) must be
    VALUE-identical to the two-boundary form for both hash families -
    full output equality on a real corpus slice, including the hv-level
    md5 affine path the registry oracle pins. Covers the short-doc
    filter equivalence too (size(toks) >= n <=> nonempty shingles)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(200)
    )
    for hash_fn in ("md5", "xxhash64"):
        base = minhash_lsh_near_duplicates(
            docs, num_hashes=48, bands=12, hash_fn=hash_fn
        )
        fused = minhash_lsh_near_duplicates(
            docs, num_hashes=48, bands=12, hash_fn=hash_fn,
            fused_shingles=True,
        )
        assert fused.exceptAll(base).count() == 0, hash_fn
        assert base.exceptAll(fused).count() == 0, hash_fn
        spark.catalog.clearCache()


def test_minhash_short_docs_excluded(spark, docs):
    cands = _pairs(minhash_lsh_candidates(docs))
    short_ids = {10, 11, 12, 13}
    assert all(a not in short_ids and b not in short_ids for a, b in cands), (
        "short docs must be routed to exact dedup, not the LSH path"
    )


def test_minhash_no_short_doc_bucket_explosion(spark):
    # 100 single-token docs, all distinct: with the null-signature bug this
    # produced O(n^2) candidate pairs; with the guard it produces none.
    rows = [(i, f"tok{i}") for i in range(100)]
    one_tok = spark.createDataFrame(rows, DOCS_SCHEMA)
    assert minhash_lsh_candidates(one_tok).count() == 0
    assert minhash_lsh_near_duplicates(one_tok).count() == 0


def test_simhash_signature_deterministic(spark, docs):
    s1 = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    s2 = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert s1 == s2
    assert s1[0] == s1[1]  # identical text -> identical signature


def test_simhash_near_duplicates(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_duplicates(docs, max_hamming=8).collect()
    }
    assert pairs[(0, 1)] == 0  # identical docs
    assert (0, 3) not in pairs and (0, 4) not in pairs  # unrelated docs


def test_ngram_jaccard_bucket_cap(spark):
    # 5 docs sharing the first token: uncapped they form a bucket of 5;
    # capped at 3 the bucket is dropped entirely.
    rows = [(i, f"same start then unique tail {i} " + " ".join(f"w{i}{j}" for j in range(8))) for i in range(5)]
    rows += [(100, "same start then unique tail 0 " + " ".join(f"w0{j}" for j in range(8)))]
    d = spark.createDataFrame(rows, DOCS_SCHEMA)
    uncapped = ngram_jaccard_pairs(d, threshold_pct=70)
    capped = ngram_jaccard_pairs(d, threshold_pct=70, max_bucket_size=3)
    assert uncapped.count() > 0
    assert capped.count() == 0


def test_duplicate_clusters_chains_and_isolates(spark):
    """a~b, b~c (no a~c edge) must land in ONE cluster labeled min(id);
    disjoint pairs stay separate; the long chain needs multiple
    propagation rounds."""
    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        duplicate_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)],
        ["id_a", "id_b"],
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1,          # chained triple
        10: 10, 11: 10,            # isolated pair
        20: 20, 21: 20, 22: 20, 23: 20, 24: 20,  # 5-chain (diameter 4)
    }


def test_duplicate_clusters_converges_at_diameter_equal_cap(spark):
    """Regression: a path graph whose diameter EQUALS max_iterations makes
    its last label change on the final allowed propagation round; the
    convergence check needs one extra no-op round and must not raise."""
    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        duplicate_clusters,
    )

    # path 0-1-2-3-4: min-label 0 reaches node 4 on round 4
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], ["id_a", "id_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs, max_iterations=4).collect()
    }
    assert got == {i: 0 for i in range(5)}, got


def test_dedup_against_corpus(spark):
    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        dedup_against_corpus,
    )
    from pyspark_data_engineering_assignment_spark.functions.text import (
        md5_fingerprint,
    )

    corpus_docs = spark.createDataFrame(
        [(100, "known text one"), (101, "known text two")], ["doc_id", "text"]
    )
    corpus = corpus_docs.select(
        md5_fingerprint(F.col("text")).alias("fingerprint")
    ).distinct()
    batch = spark.createDataFrame(
        [
            (1, "Known Text One"),   # dup of corpus (normalization folds case)
            (2, "fresh text"),
            (3, "fresh text"),       # within-batch dup of 2: keeper = min id
            (4, "another fresh"),
        ],
        ["doc_id", "text"],
    )
    kept = {r.doc_id for r in dedup_against_corpus(batch, corpus).collect()}
    assert kept == {2, 4}


def test_canonical_docs_picks_largest_then_lowest_id(spark):
    from pyspark_data_engineering_assignment_spark.operators.dedup import canonical_docs

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        # cluster 1: doc 2 is largest; cluster 10: size tie -> lowest id
        [(1, 50), (2, 90), (3, 90 - 1), (10, 70), (11, 70), (99, 500)],
        "doc_id long, n_chars long",
    )
    got = {
        r["cluster_id"]: (r["canonical_doc_id"], r["n_members"], r["total_chars"])
        for r in canonical_docs(clusters, docs).collect()
    }
    # doc 99 is in no cluster and must not appear anywhere
    assert got == {1: (2, 3, 50 + 90 + 89), 10: (10, 2, 140)}


def test_contamination_screen_counts_and_short_doc_dropout(spark):
    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        contamination_screen,
    )

    # 4-token shingles; train doc 1 contains an eval 4-gram verbatim,
    # train doc 2 shares nothing, train doc 3 is shorter than n (drops).
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # shingles: a b g d, b g d e
            (2, "one two three four five"),
            (3, "too short"),
        ],
        DOCS_SCHEMA,
    )
    ev = spark.createDataFrame(
        [(10, "x alpha beta gamma delta y")], DOCS_SCHEMA
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"])
        for r in contamination_screen(train, ev, n=4).collect()
    }
    assert got == {1: (2, 1), 2: (2, 0)}  # doc 3 absent: nothing to test


def test_contamination_screen_full_containment(spark):
    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        contamination_screen,
    )

    # an exact duplicate of an eval doc is 100% contaminated
    text = "w1 w2 w3 w4 w5 w6"
    train = spark.createDataFrame([(1, text)], DOCS_SCHEMA)
    ev = spark.createDataFrame([(9, text)], DOCS_SCHEMA)
    [r] = contamination_screen(train, ev, n=3).collect()
    assert (r["n_shingles"], r["n_contaminated"]) == (4, 4)


def test_boilerplate_shingles_threshold_semantics(spark):
    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        boilerplate_shingles,
    )

    # the same 3-gram footer in 3 docs is boilerplate at min_docs=3;
    # a 2-doc overlap is not; duplicate occurrences WITHIN a doc count
    # once (distinct-per-doc grain).
    footer = "all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, f"unique one text {footer}"),
            (2, f"other content here {footer}"),
            (3, f"third thing entirely {footer} {footer}"),
            (4, "pair shared span body"),
            (5, "pair shared span tail"),
        ],
        DOCS_SCHEMA,
    )
    got = {
        r["doc_id"]: r["n_boilerplate"]
        for r in boilerplate_shingles(docs, n=3, min_docs=3).collect()
    }
    assert got[1] == 1 and got[2] == 1 and got[3] == 1
    assert got[4] == 0 and got[5] == 0  # "pair shared span" only in 2 docs


def test_duplicate_clusters_null_sided_pairs_are_inert(spark):
    """A candidate pair with a NULL doc id carries no linkage evidence:
    it must not bridge the real nodes it touches, the unattributable
    NULL node must not surface as a (NULL, NULL) cluster-member row
    (same PK semantics as the state stores' NULL-key exclusion), and a
    node seen ONLY through NULL-sided pairs stays an ordinary singleton
    - absent from the labeling exactly like a doc in no pair at all."""
    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        duplicate_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (3, None), (None, 4), (None, None)],
        "id_a long, id_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()
    }
    # 3 and 4 are NOT bridged through the shared NULL side and carry no
    # linkage evidence, so they are not labeled; no NULL row either.
    assert got == {1: 1, 2: 1}


@pytest.mark.slow
def test_duplicate_clusters_property_matches_union_find(spark):
    """Property (hypothesis): for ANY edge list over a small id universe
    - self-loops, duplicate and reversed pairs, NULL sides included -
    the iterative min-label propagation returns exactly the union-find
    connected components, each labeled by its minimum member id, with
    one output row per non-NULL endpoint."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        duplicate_clusters,
    )

    ids = st.none() | st.integers(min_value=0, max_value=9)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(edges=st.lists(st.tuples(ids, ids), min_size=1, max_size=12))
    def prop(edges):
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in duplicate_clusters(pairs).collect()
        }
        # union-find oracle over the valid (both-sides-non-NULL) edges
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            if a is None or b is None:
                continue
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {n: find(n) for n in parent}
        assert got == expect, (sorted(edges), got, expect)

    prop()
