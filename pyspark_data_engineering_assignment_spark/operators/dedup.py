"""Deduplication operators for document corpora.

Four strategies, each a pure DataFrame pipeline designed so that at
100 TB the quadratic step only ever runs *within candidate buckets*:

  * **exact** - hash-groupBy on a normalized fingerprint. One shuffle on
    the fingerprint; duplicate groups are O(distinct keys).
  * **MinHash + LSH** - shingle -> per-seed min-hash signature -> band
    hashes -> self-join on (band, band_hash) -> exact-Jaccard verify of
    candidates. Only colliding bands join, so the pair blow-up is bounded
    by bucket sizes (classic Broder/LSH; see PAPERS.md).
  * **SimHash** - 64-bit sign-of-weighted-bit-sums signature via
    explode + groupBy (shuffles once on doc_id), candidates = equal
    signature bands, verify by Hamming distance.
  * **n-gram Jaccard** - exact token-set Jaccard over cheap candidate
    buckets; the SQL-expressible baseline the others approximate.

No UDFs anywhere - built-in hash/array expressions keep everything in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from pyspark_data_engineering_assignment_spark.functions.text import (
    distinct_tokens,
    fused_shingle_hashes_md5,
    fused_shingle_hashes_xx,
    md5_fingerprint,
    minhash_signature,
    shingle_hashes,
    tokens,
    word_ngrams_of,
    minhash_signature_md5,
    shingle_hashes_md5,
)


def exact_duplicate_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of exact duplicates (normalized-text md5). Returns one row
    per duplicated fingerprint with the group size and the keeper (min id).

    NULL text is missing data, not content: md5(NULL) is NULL and
    groupBy puts all NULLs in ONE group, so without the filter two
    documents whose text failed to load would be declared "duplicates"
    and one silently deleted. NULL-text rows are excluded here — they
    belong to a quality gate, not a dedup decision."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col), md5_fingerprint(F.col(text_col)).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_docs") > 1)
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    hash_fn: str = "xxhash64",
    fused_shingles: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash banding.

    rows_per_band = num_hashes / bands; two docs collide if any band of
    their signatures is identical. Pairs are emitted as (id_a < id_b),
    deduplicated across bands. Shuffles: one groupBy-free map to build
    signatures, one self-join keyed on (band, band_hash) - at scale the
    join key is high-cardinality so skew is limited to genuinely hot
    buckets (AQE skew-join splits those).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    # Materialize shingles once (a projection boundary, so the 64 min-hash
    # transforms share one computed array), and DROP docs with no shingles:
    # texts shorter than shingle_len tokens would get all-null signatures,
    # every such doc would share identical band hashes, and one giant
    # candidate bucket would go quadratic on a real corpus. Short docs are
    # routed to exact dedup instead (md5 of the whole normalized text is
    # the right key when there aren't even shingle_len tokens).
    # fused_shingles=True (round-15): skip the shingle-string
    # array<string> materialization entirely and hash each shingle as a
    # per-element temporary inside ONE transform over the token array
    # (functions/text.fused_shingle_hashes_*). The md5/xxhash INPUT
    # bytes are identical (the same array_join(slice(...)) expression
    # word_ngrams_of evaluates); the short-doc filter becomes
    # size(toks) >= shingle_len, the same predicate (sh nonempty <=>
    # at least shingle_len tokens; NULL text -> NULL/-1 size, dropped
    # by either form).
    if fused_shingles:
        toksed = docs.select(
            F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_t")
        ).filter(F.size("_t") >= shingle_len)
        fused_fn = (
            fused_shingle_hashes_md5
            if hash_fn == "md5"
            else fused_shingle_hashes_xx
        )
        hashed = toksed.select(
            "doc_id", fused_fn(F.col("_t"), shingle_len).alias("hv")
        )
    else:
        shingled = (
            docs.select(
                F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_t")
            )
            .select(
                "doc_id", word_ngrams_of(F.col("_t"), shingle_len).alias("sh")
            )
            .filter(F.size("sh") > 0)
        )
    # Hash the shingle strings ONCE (its own projection boundary, so the
    # per-family passes rehash fixed-width longs, not strings).
    # hash_fn="md5": cross-engine-reproducible base hash + affine
    # families + CONCATENATED band values (no band re-hash at all, so
    # the band key is collision-free and trivially oracle-matched).
    if hash_fn == "md5":
        if not fused_shingles:
            hashed = shingled.select(
                "doc_id", shingle_hashes_md5(F.col("sh")).alias("hv")
            )
        sig = hashed.select(
            "doc_id", minhash_signature_md5(F.col("hv"), num_hashes).alias("sig")
        )
        band_val = lambda b: F.concat_ws(  # noqa: E731
            ",",
            *[
                F.col("sig")[b * rows_per_band + r].cast("string")
                for r in range(rows_per_band)
            ],
        )
    elif hash_fn == "xxhash64":
        if not fused_shingles:
            hashed = shingled.select(
                "doc_id", shingle_hashes(F.col("sh")).alias("hv")
            )
        sig = hashed.select(
            "doc_id", minhash_signature(F.col("hv"), num_hashes).alias("sig")
        )
        band_val = lambda b: F.xxhash64(  # noqa: E731
            *[
                F.col("sig")[b * rows_per_band + r]
                for r in range(rows_per_band)
            ]
        )
    else:
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        band_val(b).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_hash")
    # shuffle_hash (not broadcast) on purpose, twice over: (1) a broadcast
    # self-join materializes the build side SEPARATELY, so the whole
    # signature/banding pipeline above would compute twice per run
    # (measured ~2x the signature cost at sf0.1); a shuffled self-join's
    # two sides canonicalize to the same exchange and compute once.
    # (2) the banded frame is corpus x bands rows - never broadcastable
    # at real scale; the hint pins the plan shape that survives 100 TB.
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )


def minhash_lsh_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.7,
    hash_fn: str = "xxhash64",
    fused_shingles: bool = False,
) -> DataFrame:
    """LSH candidates verified by exact shingle-set Jaccard.

    The verify stage shingles ONLY candidate docs: the candidate pairs
    (persisted - a bounded, output-sized frame) are exploded to their
    distinct doc ids, the corpus is semi-joined down to those ids, and
    ``word_ngrams`` runs over that candidate-sized subset. Round 3
    re-shingled the FULL corpus twice here (once per side of the verify
    join) after the candidate stage had already shingled it - two
    redundant passes over the text at scale. Measured honestly: at
    sf0.1 (60k small docs) this restructure is ~par, because the
    re-shingle passes it removes cost ~0.3s there while the added
    persist/semi-join stages cost about the same - the win grows with
    corpus text volume (at 100 TB each removed pass is a full-corpus
    read). Jaccard compare is integer cross-multiplied (no FP
    division).

    CALLER CONTRACT (cache lifetime): two intermediates (the candidate
    pairs and the candidate-sized shingle frame) are persisted so the
    verify join's two sides share one computation; a lazy return value
    cannot unpersist them itself. Long-lived sessions that call this
    repeatedly should ``spark.catalog.clearCache()`` (or track and
    unpersist) after materializing the result - otherwise cached blocks
    accumulate until executor storage evicts them (bench.py does exactly
    this between registry queries).
    """
    cands = minhash_lsh_candidates(
        docs,
        id_col,
        text_col,
        shingle_len,
        num_hashes,
        bands,
        hash_fn=hash_fn,
        fused_shingles=fused_shingles,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cand_ids = (
        cands.select(F.explode(F.array("id_a", "id_b")).alias("_cid")).distinct()
    )
    # No explicit broadcast hint: candidate-pair volume is bounded by
    # bucket sizes but NOT by a constant - a duplicate-heavy corpus can
    # produce near-corpus-scale candidate sets, and a forced broadcast of
    # that would blow the driver at 100 TB. cand_ids derives from the
    # persisted cands, so AQE sees its ACTUAL runtime size and picks the
    # broadcast semi-join exactly when it fits the threshold, falling
    # back to a shuffled semi-join when it doesn't.
    relevant = docs.join(
        cand_ids, on=F.col(id_col) == F.col("_cid"), how="semi"
    )
    shingle_sets = (
        relevant.select(
            F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_t")
        )
        .select(
            "doc_id",
            F.array_distinct(word_ngrams_of(F.col("_t"), shingle_len)).alias("sh"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    num = int(round(jaccard_threshold * 100))
    return (
        cands.join(
            shingle_sets.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                "sh", "sh_a"
            ),
            on="id_a",
        )
        .join(
            shingle_sets.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "sh", "sh_b"
            ),
            on="id_b",
        )
        .withColumn("inter_size", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("union_size", F.size(F.array_union("sh_a", "sh_b")))
        # union_size > 0 guards the vacuous pass (0 >= 0) for any pair of
        # empty shingle sets that slips past the candidate-stage filter.
        .filter(
            (F.col("union_size") > 0)
            & (F.col("inter_size") * 100 >= F.col("union_size") * num)
        )
        .select("id_a", "id_b", "inter_size", "union_size")
    )


def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """``nbits``-bit SimHash per document.

    explode(tokens) -> nbits conditional sums -> pack sign bits. One
    shuffle (groupBy doc id); the aggregates are a single hash-agg pass.
    The sign convention is sum > 0 => bit set; with the default 64 bits
    the packed value is a signed long (bit 63 contributes the sign).

    ``hash_fn="md5"`` (requires nbits <= 60) derives the per-token hash
    from the signed-BIGINT-safe md5 prefix instead of xxhash64 - same
    trick as kmv_hash/cms_sketch - making every signature an integer
    any md5-capable engine computes identically, so the WHOLE near-dup
    pipeline (signatures, banding, Hamming verify) becomes value-hash
    oracle-checkable instead of rows-only.
    """
    if hash_fn == "xxhash64":
        h = F.xxhash64("tok")
    elif hash_fn == "md5":
        if nbits > 60:
            raise ValueError("md5 hash family supports at most 60 bits")
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", h)
    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(nbits)
        ]
    )
    packed = F.lit(0).cast("long")
    for i in range(nbits):
        bit_val = F.lit(-(2**63)).cast("long") if i == 63 else F.lit(2**i).cast("long")
        packed = packed + F.when(F.col(f"b{i}") > 0, bit_val).otherwise(F.lit(0).cast("long"))
    return sums.select("doc_id", packed.alias("simhash"))


def recommended_band_bits(
    corpus_rows: int, target_occupancy: int = 8, nbits: int = 64
) -> int:
    """Occupancy-scaled SimHash band width: 2^band_bits buckets per band
    sized so the expected bucket holds ~``target_occupancy`` docs (the
    same law as similarity.recommended_n_planes - within-bucket pairing
    grows ~occupancy^2; the sf10 sweep measured 12.4x for 10x data at
    fixed 16-bit bands). Wider bands trade recall: the pigeonhole
    guarantee covers hamming < nbits/band_bits, so callers choosing
    width for scale should re-check their radius. Clamped so at least
    two bands remain."""
    import math

    if corpus_rows <= 0:
        # same lower clamp as the general case (and as
        # similarity.recommended_n_planes's degenerate return)
        return 4
    want = math.ceil(math.log2(max(corpus_rows / target_occupancy, 2)))
    return max(4, min(nbits // 2, want))


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    band_bits: int = 16,
    nbits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs: candidates share at least one exact
    band (pigeonhole: any pair within hamming < n_bands must
    match somewhere; wider radii trade recall), verified by bit_count."""
    sigs = simhash_signatures(docs, id_col, text_col, nbits=nbits, hash_fn=hash_fn)
    n_bands = nbits // band_bits
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.band_val")
    # shuffle_hash (not broadcast) on purpose, twice over: (1) a broadcast
    # self-join materializes the build side SEPARATELY, so the whole
    # signature/banding pipeline above would compute twice per run
    # (measured ~2x the signature cost at sf0.1); a shuffled self-join's
    # two sides canonicalize to the same exchange and compute once.
    # (2) the banded frame is corpus x bands rows - never broadcastable
    # at real scale; the hint pins the plan shape that survives 100 TB.
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_expr=None,
    threshold_pct: int = 70,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Exact token-set Jaccard over candidate buckets (default: same
    first token). Integer cross-multiplied threshold - SQL-expressible,
    serves as the oracle-checkable baseline for the LSH variants.

    SCALE NOTE: first-token bucketing is an *oracle baseline*, not a
    production path - on real text the most common first token ("the")
    buckets a large corpus fraction and the within-bucket self-join goes
    quadratic. At scale use ``minhash_lsh_near_duplicates`` (bounded
    band buckets), or pass ``max_bucket_size`` to hard-cap the blow-up
    (buckets above the cap are dropped, trading recall for a bounded
    join; the cap is applied via a pre-aggregated bucket-count
    broadcast, one extra cheap shuffle)."""
    toks = F.col("_toks")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        distinct_tokens(F.col(text_col)).alias("_toks"),
        (bucket_expr if bucket_expr is not None else tokens(F.col(text_col))[0]).alias(
            "bucket"
        ),
    )
    if max_bucket_size is not None:
        small_buckets = (
            d.groupBy("bucket")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("bucket")
        )
        d = d.join(F.broadcast(small_buckets), on="bucket", how="left_semi")
    # shuffle_hash: same self-join rule as the LSH band joins - broadcast
    # would tokenize the corpus twice (separate build side) and could
    # never hold the bucketed corpus at real scale.
    a, b = d.alias("a"), d.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.size(F.array_intersect(F.col("a._toks"), F.col("b._toks"))).alias(
                "inter_size"
            ),
            F.size(F.array_union(F.col("a._toks"), F.col("b._toks"))).alias(
                "union_size"
            ),
        )
        .filter(F.col("inter_size") * 100 >= F.col("union_size") * threshold_pct)
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate pairs: every doc in a
    duplicate cluster gets the cluster's minimum doc id as ``cluster_id``
    (the canonical keeper). The step after pairwise candidate
    generation in every real dedup pipeline - pairs alone can't answer
    "keep one per group" when duplicates chain (a~b, b~c but not a~c).

    Iterative min-label propagation: each round every node adopts the
    minimum label among itself and its neighbors; converged when no
    label changes. Rounds needed = graph diameter (tiny for near-dup
    clusters; ``max_iterations`` caps pathological chains). Each round
    is one join + one aggregate on the edge list - all distributed, and
    ``localCheckpoint`` cuts the growing lineage so round N's plan does
    not replay rounds 0..N-1.

    Raises ``RuntimeError`` if labels are still changing when
    ``max_iterations`` runs out - a partially-merged labeling would
    silently report one duplicate cluster as several. The loop runs up
    to ``max_iterations + 1`` rounds: a graph whose diameter equals
    ``max_iterations`` makes its last label change ON the final allowed
    round, and proving convergence needs one extra no-op round - without
    it, that legitimate case raised a spurious non-convergence error.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        # A pair with a NULL side carries no linkage evidence (its joins
        # below are null-rejecting anyway), and an unattributable NULL
        # node must not surface as a (NULL, NULL) "cluster member" row -
        # same PK semantics as the state stores' NULL-key exclusion.
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    changed = 0
    # +1: the last round may be the convergence-PROVING no-op round for a
    # graph whose diameter is exactly max_iterations.
    for _ in range(max_iterations + 1):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iterations} "
            "iterations (component diameter exceeds the cap); raise "
            "max_iterations"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def canonical_docs(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """One keeper per duplicate cluster: the largest document by
    ``size_col``, ties broken by lowest id - the selection step that
    turns ``duplicate_clusters`` output into an actual "which rows do I
    delete" decision. Returns ``(cluster_id, canonical_doc_id,
    n_members, total_chars)``.

    Single hash aggregate, no window: the keeper is ``max(struct(size,
    -id))`` - struct comparison is lexicographic, so max size wins and
    among equals max(-id) = min id. Partial aggregation runs map-side,
    so the one shuffle carries just one candidate struct per
    (partition, cluster) - at 100 TB this is O(clusters), while a
    row_number window would sort every member of every cluster.
    """
    j = clusters.join(
        docs.select(F.col(id_col), F.col(size_col)), on=id_col
    )
    return j.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.sum(size_col).cast("long").alias("total_chars"),
        F.max(
            F.struct(
                F.col(size_col).alias("s"), (-F.col(id_col)).alias("neg_id")
            )
        ).alias("_best"),
    ).select(
        "cluster_id",
        (-F.col("_best.neg_id")).cast("long").alias("canonical_doc_id"),
        "n_members",
        "total_chars",
    )


def dedup_against_corpus(
    new_docs: DataFrame,
    corpus_fingerprints: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Incremental exact dedup: drop rows of ``new_docs`` whose
    normalized-text fingerprint already exists in
    ``corpus_fingerprints`` - the "dedup the new crawl against the
    existing corpus index" step of an incremental ingestion pipeline,
    plus WITHIN-batch exact dedup (keep min id per fingerprint) so the
    surviving set is internally unique too.

    One anti join keyed on the fingerprint (both sides hashable on the
    same key; at 100 TB the corpus index is a fingerprint-only column -
    store it partitioned by fingerprint prefix and the join is
    co-located) and one groupBy on the same key. New-batch text is
    fingerprinted here; the corpus side arrives pre-fingerprinted
    because re-reading corpus text per batch is exactly what the index
    exists to avoid.

    NULL text passes through UN-deduped: its fingerprint is NULL, which
    (a) never equals a corpus fingerprint, so the anti join keeps the
    row, and (b) must not collapse with OTHER null-text rows in the
    within-batch keeper step - two failed loads are missing data, not
    duplicates of each other, and the pre-fix window deleted all but
    one of them. The keeper window therefore partitions on
    coalesce(fingerprint, 'null:'||id) - per-row-unique for NULLs (so
    each survives with rank 1, and a null-heavy batch doesn't funnel
    into ONE window partition), collision-free against real md5 hex
    (32 hex chars never start with 'null:').
    """
    fp = new_docs.withColumn(fingerprint_col, md5_fingerprint(F.col(text_col)))
    fresh = fp.join(
        corpus_fingerprints.select(fingerprint_col),
        on=fingerprint_col,
        how="left_anti",
    )
    part_key = F.coalesce(
        F.col(fingerprint_col),
        F.concat(F.lit("null:"), F.col(id_col).cast("string")),
    )
    keeper = F.row_number().over(
        Window.partitionBy(part_key).orderBy(F.col(id_col).asc())
    )
    return fresh.withColumn("_rn", keeper).filter(F.col("_rn") == 1).drop("_rn")


def contamination_screen(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination screen: per training document, how many
    of its DISTINCT n-token shingles also occur anywhere in the eval
    corpus - the n-gram-overlap test training pipelines run against
    held-out benchmarks before training (the GPT-3/PaLM appendix
    methodology). Returns ``(doc_id, n_shingles, n_contaminated)`` for
    every training doc with at least one shingle (docs shorter than
    ``n`` tokens have nothing to test and drop out).

    Scale shape: the eval shingle set is benchmark-sized (thousands of
    docs, not the corpus), so it DISTINCTs small and broadcasts; the
    training side is one explode + one left broadcast join + one
    groupBy(doc_id) shuffle. Nothing quadratic, nothing driver-side,
    and the corpus is scanned once. Integer outputs only, so the
    DuckDB oracle hash-matches exactly.
    """
    eval_shingles = (
        eval_docs.select(tokens(F.col(text_col)).alias("_t"))
        .select(F.explode(word_ngrams_of(F.col("_t"), n)).alias("shingle"))
        .distinct()
        .withColumn("_hit", F.lit(1).cast("long"))
    )
    train_shingles = train_docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).select(
        id_col,
        F.explode(F.array_distinct(word_ngrams_of(F.col("_t"), n))).alias(
            "shingle"
        ),
    )
    return (
        train_shingles.join(F.broadcast(eval_shingles), on="shingle", how="left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
        )
    )


def boilerplate_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 3,
) -> DataFrame:
    """Cross-document boilerplate detection: n-token shingles occurring
    in >= ``min_docs`` DISTINCT documents (headers, footers, license
    blocks, navigation chrome), counted per document - the cross-doc
    complement of the WITHIN-doc Gopher repetition signals
    (``textstats.repetition_stats``), and the detection half of
    C4-style repeated-span removal. Returns ``(doc_id, n_shingles,
    n_boilerplate)`` for every doc with at least one shingle.

    One pass over the exploded shingle table (round-14 plan change,
    guide §2.3/§2.4): the old shape computed the shingle subtree TWICE
    (once under groupBy(shingle) for the hot set, once as the join's
    probe side - two full tokenize+explode passes over the corpus) and
    shuffled the exploded table twice (groupBy + join). A count(*)
    window partitioned by shingle needs ONE tokenize pass and ONE
    shuffle; the per-doc distinct count per shingle is unchanged (the
    input is already distinct per doc, so count(*) == count of distinct
    docs either way), then groupBy(doc) folds the hot flag exactly as
    the join did. The n >= min_docs comparison moves from a post-agg
    filter to a per-row flag - same integer, same boundary.
    """
    sh = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).select(
        id_col,
        F.explode(F.array_distinct(word_ngrams_of(F.col("_t"), n))).alias(
            "shingle"
        ),
    )
    n_docs = F.count("*").over(Window.partitionBy("shingle"))
    return (
        sh.withColumn("_hot", (n_docs >= min_docs).cast("long"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum("_hot").cast("long").alias("n_boilerplate"),
        )
    )
