"""Empty-input robustness across the operator layer.

At 100 TB, empty slices are routine — a date partition with no data, a
filter that matches nothing, an incremental batch that deduped to zero
rows — and an operator that works on 60k rows but throws on zero rows
takes the whole pipeline down at 3am. Contract pinned here:

  * row-transforming operators: empty in -> empty out, SAME columns,
    no exception (downstream unions/joins keep working);
  * trainers that cannot produce a model from nothing (k-means / IVF
    build): a LOUD, typed error — never a silent empty model that a
    probe would then serve as "no neighbors found".

Every frame is built from an explicit schema (createDataFrame([], s))
so the tests document exactly which input shape each operator needs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (

    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

pytestmark = pytest.mark.axis

DOCS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)
EMB = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)
EVENTS = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)
PAIRS = StructType(
    [
        StructField("id_a", LongType(), False),
        StructField("id_b", LongType(), False),
    ]
)


@pytest.fixture(scope="module")
def docs0(spark):
    return spark.createDataFrame([], DOCS)


@pytest.fixture(scope="module")
def emb0(spark):
    return spark.createDataFrame([], EMB)


@pytest.fixture(scope="module")
def events0(spark):
    return spark.createDataFrame([], EVENTS)


def _is_empty_with_columns(df, expected_cols=None):
    rows = df.collect()
    assert rows == []
    if expected_cols is not None:
        assert df.columns == expected_cols
    return True


# ---------------------------------------------------------------- dedup


def test_dedup_family_empty(docs0, spark):
    from pyspark_data_engineering_assignment_spark.operators import dedup as d

    assert _is_empty_with_columns(
        d.exact_duplicate_groups(docs0), ["fingerprint", "n_docs", "keeper_id"]
    )
    assert _is_empty_with_columns(d.minhash_lsh_near_duplicates(docs0))
    assert _is_empty_with_columns(d.simhash_near_duplicates(docs0))
    assert _is_empty_with_columns(d.ngram_jaccard_pairs(docs0))
    assert _is_empty_with_columns(d.boilerplate_shingles(docs0))
    pairs0 = spark.createDataFrame([], PAIRS)
    clusters = d.duplicate_clusters(pairs0)
    assert _is_empty_with_columns(clusters)
    assert _is_empty_with_columns(d.canonical_docs(clusters, docs0))


def test_incremental_dedup_empty_sides(docs0, spark):
    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        dedup_against_corpus,
        contamination_screen,
    )

    fp0 = spark.createDataFrame(
        [], StructType([StructField("fingerprint", StringType(), False)])
    )
    # empty new batch vs empty corpus
    assert _is_empty_with_columns(dedup_against_corpus(docs0, fp0))
    # non-empty new batch vs EMPTY corpus index: everything survives
    new = docs0.sparkSession.createDataFrame(
        [(1, "alpha beta gamma delta", 22)], DOCS
    )
    assert dedup_against_corpus(new, fp0).count() == 1
    # contamination: empty eval corpus -> zero overlap reported, train
    # rows still present (screen reports per-train-doc overlap)
    out = contamination_screen(new, docs0)
    assert out.count() <= 1
    assert _is_empty_with_columns(contamination_screen(docs0, new))


def test_null_text_is_not_a_duplicate(spark):
    """NULL text is missing data, not content. Pre-fix, md5(NULL)=NULL
    plus null-grouping groupBy/window declared all null-text docs one
    duplicate group and silently deleted all but one."""
    from pyspark_data_engineering_assignment_spark.operators.dedup import (
        dedup_against_corpus,
        exact_duplicate_groups,
    )
    from pyspark.sql.types import StructField, StructType, StringType

    docs = spark.createDataFrame(
        [(1, None, None), (2, None, None), (3, "same", 4), (4, "same", 4)],
        DOCS,
    )
    groups = exact_duplicate_groups(docs).collect()
    # the real duplicate pair groups; the two null-text docs do NOT
    assert len(groups) == 1
    assert groups[0]["keeper_id"] == 3 and groups[0]["n_docs"] == 2

    fp0 = spark.createDataFrame(
        [], StructType([StructField("fingerprint", StringType(), False)])
    )
    survivors = sorted(
        r["doc_id"] for r in dedup_against_corpus(docs, fp0).collect()
    )
    # both null-text rows pass through; the exact pair keeps min id
    assert survivors == [1, 2, 3]


def test_null_text_gets_no_split(spark):
    """content_safe_split must give null-text rows a visible NULL
    split. This SUPERSEDES the earlier pin that demanded a real label:
    what that behavior actually was (via concat_ws skipping the NULL
    fingerprint) is every contentless row landing together in ONE
    salt-chosen split - missing data silently entering train or,
    worse, eval. NULL text is missing data, not content (the dedup
    convention): it belongs to no split, every split filter correctly
    excludes it, and the NULL is countable by a DQ rule instead of
    invisible inside a split."""
    from pyspark_data_engineering_assignment_spark.operators.sampling import (
        content_safe_split,
    )

    docs = spark.createDataFrame([(1, None, None), (2, "x", 1)], DOCS)
    out = {r["doc_id"]: r["split"] for r in content_safe_split(docs).collect()}
    assert out[1] is None and out[2] is not None


# ----------------------------------------------------------- similarity


def test_similarity_family_empty(emb0, spark):
    from pyspark_data_engineering_assignment_spark.operators import (
        similarity as s,
    )

    one = spark.createDataFrame([(1, [1.0] * 64, 0)], EMB)
    # empty corpus x empty queries / one-sided empties
    assert _is_empty_with_columns(
        s.brute_force_topk(emb0, emb0),
        ["query_id", "neighbor_id", "cos", "rank"],
    )
    assert _is_empty_with_columns(s.brute_force_topk(emb0, one))
    assert _is_empty_with_columns(s.brute_force_topk(one, emb0))
    assert _is_empty_with_columns(s.int8_topk(emb0, emb0))
    assert _is_empty_with_columns(s.lsh_bucketed_topk(emb0, emb0))
    assert _is_empty_with_columns(s.lsh_bucketed_topk(one, emb0))
    assert _is_empty_with_columns(s.embedding_near_duplicates(emb0))


def test_kmeans_trainers_empty(emb0):
    """Training on zero vectors must fail LOUDLY — an empty centroid
    table silently served by a probe would answer every query with "no
    neighbors", which is indistinguishable from a correct miss."""
    from pyspark_data_engineering_assignment_spark.operators import clustering

    with pytest.raises(ValueError, match="[Ee]mpty|no vectors|0 vectors"):
        clustering.kmeans_fixedpoint(emb0).collect()
    with pytest.raises(ValueError, match="[Ee]mpty|no vectors|0 vectors"):
        cells, corpus = clustering.build_ivf_det_index(emb0)
        cells.collect()


def test_kmeans_corpus_smaller_than_k(spark):
    """A corpus with fewer vectors than n_cells must clamp to one cell
    per point, not index past the seed list (the pre-fix behavior was a
    raw IndexError on ANY slice smaller than k — a dev sample or a
    sparse partition would crash the build)."""
    from pyspark_data_engineering_assignment_spark.operators import clustering

    tiny = spark.createDataFrame(
        [(i, [float(i), float(-i)], 0) for i in range(3)], EMB
    )
    out = clustering.kmeans_fixedpoint(tiny, n_cells=8, iters=2).collect()
    assert len(out) == 3
    assert sorted(r["n_vectors"] for r in out) == [1, 1, 1]


def test_corrupt_vectors_do_not_occupy_topk_slots(spark):
    """A NULL or dimension-mismatched embedding scores NULL (zip_with
    pads the short side) - pre-fix those candidates held top-k ranks,
    and in the int8 path a NULL code fell into the otherwise(0.0)
    branch, outranking every real negative-cosine neighbor."""
    from pyspark_data_engineering_assignment_spark.operators.similarity import (
        brute_force_topk,
        int8_topk,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0] * 64, 0),
            (2, [-0.5] * 64, 0),  # real but anti-aligned: cos = -1
            (3, None, 0),
            (4, [1.0] * 32, 0),  # ragged
        ],
        EMB,
    )
    q = spark.createDataFrame([(10, [1.0] * 64, 0)], EMB)
    out = brute_force_topk(corpus, q, k=3, exclude_self=False).collect()
    assert sorted(r["neighbor_id"] for r in out) == [1, 2]
    assert all(r["cos"] is not None for r in out)
    out8 = int8_topk(corpus, q, k=3, exclude_self=False).collect()
    assert sorted(r["neighbor_id"] for r in out8) == [1, 2]
    # the anti-aligned neighbor keeps its genuine negative score -
    # no corrupt row shadows it with a fake 0.0
    assert min(r["cos_int8"] for r in out8) < 0


def test_kmv_never_counts_null(spark):
    from pyspark_data_engineering_assignment_spark.operators.sketches import (
        kmv_distinct_estimate,
    )
    from pyspark.sql.types import StructField, StructType, StringType

    EV = StructType(
        [
            StructField("event_type", StringType(), True),
            StructField("user_id", LongType(), True),
        ]
    )
    ev = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("a", None)], EV
    )
    [r] = kmv_distinct_estimate(ev, ["event_type"], "user_id").collect()
    assert r["distinct_est"] == 2  # COUNT(DISTINCT) semantics


def test_null_observations_do_not_poison_ewma(spark, events0):
    import datetime

    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        ewma_by_key,
        resample_gapfill,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "x", 1.0),
        (2, t0 + datetime.timedelta(hours=1), 7, "x", None),
        (3, t0 + datetime.timedelta(hours=2), 7, "x", 3.0),
        (4, None, 7, "x", 5.0),
    ]
    evt = spark.createDataFrame(rows, events0.schema)
    [r] = ewma_by_key(evt, ["user_id"], ["ts", "event_id"], "value").collect()
    # folds over the non-null observations only (pre-fix: NULL forever).
    # Round 9 tightened the contract further: a NULL ORDER key has no
    # position in the fold either (Spark's array_sort and DuckDB's
    # list(... ORDER BY) place NULL keys at opposite ends - the
    # corrupt-events parity gate caught the divergence), so the
    # null-ts row contributes nothing: 2 observations, EWMA over
    # [1.0, 3.0] = 0.125*3 + 0.875*1 exactly.
    assert r["n_events"] == 2
    assert r["ewma_value"] == 0.125 * 3.0 + 0.875 * 1.0
    # gapfill: the null-ts row is excluded, the 3 timestamped rows
    # produce exactly the 3 hourly buckets
    buckets = resample_gapfill(evt, "event_type", "ts", "value").collect()
    assert len(buckets) == 3
    assert all(b["bucket_ts"] is not None for b in buckets)


# -------------------------------------------------------------- sketches


def test_sketches_empty(events0, spark):
    from pyspark_data_engineering_assignment_spark.operators import sketches as sk

    assert _is_empty_with_columns(
        sk.kmv_distinct_estimate(events0, ["event_type"], "user_id")
    )
    # set algebra: zero groups -> zero pairs, guard does not trip
    assert _is_empty_with_columns(
        sk.kmv_set_cardinality(events0, "event_type", "user_id")
    )
    sketch = sk.cms_sketch(events0, "user_id")
    # an empty stream's sketch is all-zero counters (or no counters) —
    # either way estimates for any candidate are 0
    cand = spark.createDataFrame(
        [(7,)], StructType([StructField("user_id", LongType(), False)])
    )
    est = sk.cms_estimate(cand, sketch, "user_id").collect()
    assert all(r["freq_est"] == 0 for r in est)


# -------------------------------------------------------------- sampling


def test_sampling_empty(docs0):
    from pyspark_data_engineering_assignment_spark.operators import sampling as sa

    assert _is_empty_with_columns(sa.hash_split(docs0, "doc_id"))
    assert _is_empty_with_columns(
        sa.deterministic_sample(docs0, "doc_id", 0.25)
    )
    assert _is_empty_with_columns(
        sa.stratified_take(docs0, ["text"], "doc_id", 5)
    )
    assert _is_empty_with_columns(sa.content_safe_split(docs0))


# ------------------------------------------------------------ timeseries


def test_timeseries_empty(events0):
    from pyspark_data_engineering_assignment_spark.operators import (
        timeseries as ts,
    )

    assert _is_empty_with_columns(
        ts.resample_gapfill(events0, "event_type", "ts", "value")
    )
    assert _is_empty_with_columns(
        ts.ewma_by_key(events0, ["user_id"], ["ts", "event_id"], "value")
    )
    out = ts.funnel_counts(
        events0, "user_id", "ts", "event_type", ["view", "click"]
    )
    # funnel emits one row per stage even over no events — all zero
    rows = out.collect()
    assert all(r["n_users"] == 0 for r in rows)


# -------------------------------------------------------- text / packing


def test_textstats_empty(docs0):
    from pyspark_data_engineering_assignment_spark.operators import (
        textstats as tx,
    )

    assert _is_empty_with_columns(tx.language_id(docs0))
    assert _is_empty_with_columns(tx.quality_features(docs0))
    assert _is_empty_with_columns(tx.repetition_stats(docs0))
    assert _is_empty_with_columns(tx.unigram_surprisal(docs0))
    assert _is_empty_with_columns(tx.chunk_tokens(docs0))


def test_packing_empty(spark):
    from pyspark_data_engineering_assignment_spark.operators import packing as pk

    df0 = spark.createDataFrame(
        [],
        StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("n_tokens", LongType(), False),
                StructField("shard", LongType(), False),
            ]
        ),
    )
    packed = pk.pack_concat_chunks(df0, "doc_id", "n_tokens", "shard")
    assert _is_empty_with_columns(packed)
    assert _is_empty_with_columns(pk.pack_summary(packed, "shard", "n_tokens"))


# ------------------------------------------------------- multimodal nulls
def test_null_payloads_do_not_crash_media_operators(spark):
    """A NULL binary payload is missing media, not content: bytes(None)
    crashed the whole Arrow batch in byte_histogram/extract_features
    (and the mapInArrow variant) on one corrupt row. All three now skip
    such rows; real rows in the same batch are unaffected."""
    from pyspark_data_engineering_assignment_spark.operators.multimodal import (
        byte_histogram,
        byte_histogram_arrow,
        extract_features,
    )

    media = spark.createDataFrame(
        [
            (1, "text", bytearray(b"abc"), 3),
            (2, "text", None, None),  # corrupt: missing payload
        ],
        "media_id long, media_type string, payload binary, n_bytes long",
    )
    for op in (byte_histogram, byte_histogram_arrow):
        rows = op(media, dim=4).collect()
        assert [r["media_id"] for r in rows] == [1]
        assert sum(rows[0]["counts"]) == 3
    feats = extract_features(media, feature_dim=4).collect()
    assert [r["media_id"] for r in feats] == [1]


def test_sample_frames_ignores_lying_n_bytes_metadata(spark):
    """Frame count derives from the PAYLOAD, never the n_bytes metadata:
    a corrupt row claiming 10^9 bytes for a 10-byte payload would
    otherwise size a quarter-billion-element sequence() per row before
    substring could bound it (the generator blow-up hazard class). The
    frames produced are exactly the payload's own frames."""
    from pyspark_data_engineering_assignment_spark.operators.multimodal import (
        sample_frames,
    )

    media = spark.createDataFrame(
        [
            (1, "text", bytearray(b"0123456789"), 1_000_000_000),  # lying metadata
            (2, "text", None, 50),  # null payload: no frames at all
        ],
        "media_id long, media_type string, payload binary, n_bytes long",
    )
    rows = sample_frames(media, frame_bytes=4, every_k=1).collect()
    assert [(r["media_id"], r["frame_idx"], r["frame_len"]) for r in rows] == [
        (1, 0, 4),
        (1, 1, 4),
        (1, 2, 2),
    ]


# ------------------------------------------------ rank/percentile nulls
def test_exact_percentile_threshold_ignores_null_values(spark):
    """NULL values sort FIRST under Spark's default ordering, so they
    occupied percent_rank 0..k and pushed every real value's rank upward
    - a silently inflated threshold (and DuckDB orders NULLs LAST, so
    the engines disagreed on top of being wrong). NULLs have no rank in
    a value distribution: the threshold over [nulls + 1..10] must equal
    the threshold over [1..10]."""
    from pyspark_data_engineering_assignment_spark.operators.relational import (
        exact_percentile_threshold,
    )

    clean = [("g", float(v)) for v in range(1, 11)]
    dirty = clean + [("g", None)] * 5
    schema = "grp string, w double"
    t_clean = exact_percentile_threshold(
        spark.createDataFrame(clean, schema), ["grp"], "w", 0.35
    ).collect()[0]["threshold"]
    t_dirty = exact_percentile_threshold(
        spark.createDataFrame(dirty, schema), ["grp"], "w", 0.35
    ).collect()[0]["threshold"]
    assert t_clean == t_dirty == 4.0  # percent_rank(4)=3/9<=0.35, pr(5)>0.35


def test_grouped_standardization_skips_null_vectors(spark):
    """np.stack over a group containing a NULL vector crashed the whole
    label; a NULL vector is a corrupt row, excluded exactly like the
    similarity operators' NULL-cos filter. The label's statistics are
    computed from the real vectors only."""
    from pyspark_data_engineering_assignment_spark.operators.grouped import (
        standardize_embeddings_by_label,
    )

    emb = spark.createDataFrame(
        [
            (1, 0, [1.0, 2.0]),
            (2, 0, None),  # corrupt: missing vector
            (3, 0, [3.0, 4.0]),
        ],
        "vec_id long, label int, embedding array<float>",
    )
    rows = standardize_embeddings_by_label(emb).collect()
    assert sorted(r["vec_id"] for r in rows) == [1, 3]
    # two symmetric vectors: standardized to ±1 per dimension
    by_id = {r["vec_id"]: r["embedding_std"] for r in rows}
    assert [round(x) for x in by_id[1]] == [-1, -1]
    assert [round(x) for x in by_id[3]] == [1, 1]


# --------------------------------------------------------- writers
def test_write_zordered_empty_and_all_null_column(spark, tmp_path):
    """An empty frame (or an all-NULL z-column) has no min/max bounds;
    int(None) crashed the layout writer. An empty date partition is
    routine at 100 TB: the write must succeed, preserve every row, and
    merely lose the clustering contribution of the boundless axis."""
    from pyspark_data_engineering_assignment_spark.functions.zorder import (
        write_zordered,
    )

    schema = "a long, b long, v string"
    empty = spark.createDataFrame([], schema)
    p0 = str(tmp_path / "z_empty")
    write_zordered(empty, p0, ("a", "b"), num_files=2)
    assert spark.read.schema(schema).parquet(p0).count() == 0

    allnull_b = spark.createDataFrame(
        [(1, None, "x"), (2, None, "y")], schema
    )
    p1 = str(tmp_path / "z_nullcol")
    write_zordered(allnull_b, p1, ("a", "b"), num_files=2)
    back = spark.read.parquet(p1)
    assert back.count() == 2
    assert {r["v"] for r in back.collect()} == {"x", "y"}


def test_partitioned_writer_null_partition_roundtrip(spark, tmp_path):
    """A NULL partition value lands in __HIVE_DEFAULT_PARTITION__ and
    must read back as NULL (lossless roundtrip) - pinned because a
    malformed row's nulled partition key must not silently vanish from
    (or corrupt) the written dataset."""
    from pyspark_data_engineering_assignment_spark.sources.writers import (
        write_partitioned_parquet,
    )

    df = spark.createDataFrame(
        [("shard_a", 1), (None, 2)], "shard string, v long"
    )
    p = str(tmp_path / "parts")
    write_partitioned_parquet(df, p, ["shard"])
    back = {(r["shard"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert back == {("shard_a", 1), (None, 2)}


def test_exact_percentile_threshold_property_matches_rank_oracle(spark):
    """Property (hypothesis): for ANY grouped values with NULLs and ties
    mixed in and any fraction, the threshold equals the rank-based
    oracle - max value whose (rank-1)/(n-1) percent_rank over the
    group's NON-NULL values is <= fraction; NULLs never occupy a rank
    and an all-NULL group is absent."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_data_engineering_assignment_spark.operators.relational import (
        exact_percentile_threshold,
    )

    vals = st.none() | st.integers(min_value=0, max_value=9)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(st.sampled_from(["g", "h"]), vals), min_size=1, max_size=12
        ),
        fraction=st.sampled_from([0.0, 0.25, 0.5, 1.0]),
    )
    def prop(rows, fraction):
        df = spark.createDataFrame(
            [(g, None if v is None else float(v)) for g, v in rows],
            "g string, v double",
        )
        got = {
            r["g"]: r["threshold"]
            for r in exact_percentile_threshold(
                df, ["g"], "v", fraction
            ).collect()
        }
        expect = {}
        for grp in ("g", "h"):
            xs = sorted(float(v) for g, v in rows if g == grp and v is not None)
            if not xs:
                continue  # all-NULL group: no threshold row
            n = len(xs)
            kept = [
                x
                for x in xs
                # SQL rank with ties = index of the value's first occurrence;
                # a single-value group has percent_rank 0 by definition
                if (0.0 if n == 1 else xs.index(x) / (n - 1)) <= fraction
            ]
            expect[grp] = max(kept)  # min always has percent_rank 0
        assert got == expect, (rows, fraction, got, expect)

    prop()


# ------------------------------------------------------------- NaN axis
# NaN is the third degenerate axis after empty and NULL: it SURVIVES
# isNotNull, Spark's total ordering puts it ABOVE every real value, and
# the non-ANSI integral cast quantizes it to 0. Each operator below
# previously lied on one of those three routes (measured before fixing).


def test_nan_observations_do_not_poison_ewma(spark):
    """One NaN observation made the key's batch EWMA NaN forever while
    the streaming twin's dropna() skipped it - silent batch/stream
    divergence. NaN folds nothing and is not counted."""
    from pyspark_data_engineering_assignment_spark.operators.timeseries import (
        ewma_by_key,
    )

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, float("nan")), ("a", 2, 2.0)],
        "k string, o long, v double",
    )
    [r] = ewma_by_key(df, ["k"], ["o"], "v", alpha=0.5).collect()
    assert (r["n_events"], r["ewma_value"]) == (2, 0.5 * 2.0 + 0.5 * 1.0)


def test_nan_cos_never_takes_a_topk_slot(spark):
    """A NaN-element corpus vector dotted to cos=NaN, which sorts ABOVE
    cos=1.0 under desc - the corrupt candidate took rank 1 (measured).
    NaN cos is excluded before ranking, like NULL cos."""
    from pyspark_data_engineering_assignment_spark.operators.similarity import (
        brute_force_topk,
    )

    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    c = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [float("nan"), 1.0]), (12, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    got = [
        (r["neighbor_id"], r["rank"])
        for r in brute_force_topk(c, q, k=2).collect()
    ]
    assert got == [(10, 1), (12, 2)]


def test_nan_vector_excluded_from_int8_candidacy(spark):
    """The int8 path cannot filter at the cos stage: the non-ANSI
    integral cast quantizes NaN to code 0, producing a
    legitimate-looking score for a corrupt vector. Vectors containing
    NaN are excluded from candidacy before quantization."""
    from pyspark_data_engineering_assignment_spark.operators.similarity import (
        int8_topk,
    )

    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    c = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [float("nan"), 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = [r["neighbor_id"] for r in int8_topk(c, q, k=2).collect()]
    assert got == [10]


def test_nan_vector_cannot_pull_centroids(spark):
    """A NaN element fixed-points to 0 via the non-ANSI cast, so a
    corrupt vector silently dragged centroids toward the origin.
    Excluded from training and assignment like NULL vectors."""
    from pyspark_data_engineering_assignment_spark.operators.clustering import (
        kmeans_fixedpoint,
    )

    clean = spark.createDataFrame(
        [(1, [10.0, 10.0]), (2, [10.5, 10.0]), (3, [-10.0, -10.0]),
         (4, [-10.5, -10.0])],
        "vid long, vec array<double>",
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(5, [float("nan"), 0.0])], "vid long, vec array<double>"
        )
    )
    res_c = {
        r["cell"]: (r["n_vectors"], list(r["centroid"]))
        for r in kmeans_fixedpoint(
            clean, n_cells=2, iters=3, id_col="vid", vec_col="vec"
        ).collect()
    }
    res_d = {
        r["cell"]: (r["n_vectors"], list(r["centroid"]))
        for r in kmeans_fixedpoint(
            dirty, n_cells=2, iters=3, id_col="vid", vec_col="vec"
        ).collect()
    }
    assert res_c == res_d


def test_nan_has_no_percent_rank(spark):
    """NaN sorts ABOVE every real value, stretching the rank denominator
    (deflating real percent_ranks) and becoming the threshold itself at
    fraction=1.0 (measured: threshold=NaN). NaN is rankless like NULL."""
    from pyspark_data_engineering_assignment_spark.operators.relational import (
        exact_percentile_threshold,
    )

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", float("nan"))], "g string, v double"
    )
    [r] = exact_percentile_threshold(df, ["g"], "v", 1.0).collect()
    assert r["threshold"] == 2.0


def test_nan_vector_cannot_poison_group_standardization(spark):
    """One NaN-element vector made its label's mean and std NaN,
    standardizing EVERY vector in the group to NaN - silent whole-group
    poisoning. NaN-bearing vectors are excluded with the NULLs; the
    clean rows' output is identical with or without the corrupt row."""
    from pyspark_data_engineering_assignment_spark.operators.grouped import (
        standardize_embeddings_by_label,
    )

    clean = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 4.0], 0)], EMB
    )
    dirty = clean.unionByName(
        spark.createDataFrame([(3, [float("nan"), 0.0], 0)], EMB)
    )
    std_c = {
        r["vec_id"]: list(r["embedding_std"])
        for r in standardize_embeddings_by_label(clean).collect()
    }
    std_d = {
        r["vec_id"]: list(r["embedding_std"])
        for r in standardize_embeddings_by_label(dirty).collect()
    }
    assert std_c == std_d
    assert all(x == x for v in std_d.values() for x in v)  # no NaN


def test_nan_vector_emits_no_near_duplicate_pairs(spark):
    """NaN >= min_cosine is TRUE under Spark's NaN-is-greatest
    comparison semantics, and a NaN vector hashes to a valid LSH bucket
    (NaN dot > 0 is also true) - so one corrupt vector emitted a
    "near-duplicate" pair with EVERY bucket-mate (measured: 2 false
    pairs from 1 NaN vector among 2 real ones), and a dedup pipeline
    would then delete the real documents it touched."""
    from pyspark_data_engineering_assignment_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [float("nan"), 0.0], 0), (3, [0.0, 1.0], 0)],
        "vec_id long, embedding array<double>, label long",
    )
    assert embedding_near_duplicates(emb, min_cosine=0.95).collect() == []
    # and a genuine near-dup pair still reports
    emb2 = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.01], 0)],
        "vec_id long, embedding array<double>, label long",
    )
    pairs = embedding_near_duplicates(emb2, min_cosine=0.95).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
