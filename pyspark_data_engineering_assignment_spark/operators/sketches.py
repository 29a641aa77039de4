"""Distinct-count sketching with a cross-engine-deterministic KMV.

``approx_count_distinct`` (HyperLogLog) is the stock answer, but its
estimate depends on Spark's private hash and register layout - no
external engine can reproduce it, so correctness testing degrades to
tolerance assertions. This KMV (k-minimum-values) sketch is built the
other way around: every ingredient is available and bit-identical in
both Spark and DuckDB, so even the *estimate* is oracle-checkable
exactly:

  * element hash = leading hex chars of md5 -> uniform integer
    (md5 is the one hash function both engines share);
  * sketch = the k smallest distinct hashes per group (one hash-agg
    shuffle, carrying at most k values per group);
  * estimator = (k-1) * |hash space| / h_k, the classic KMV/bottom-k
    estimate (Bar-Yossef et al.); floor'd to BIGINT in both engines.

Standard error ~ 1/sqrt(k-2): k=256 gives ~6%. That bound assumes a
collision-free hash, so the hash WIDTH is the sketch's real capacity
knob:

  * ``hex_chars=8`` (32-bit domain): birthday collisions appear around
    2^16 distinct values per group and bias the estimate low; above
    2^32 the sketch cannot distinguish cardinalities at all. Kept only
    for the width-bias regression test (tests/test_sketches.py).
  * ``hex_chars=15`` (60-bit domain, the default): the widest md5
    prefix whose value fits a SIGNED 64-bit integer in BOTH engines
    (16 hex chars can set the sign bit: Spark's conv()->long overflows
    to null past 2^63, DuckDB's ::BIGINT raises). Collision floor moves
    to ~2^30 distinct per group - beyond any per-group cardinality the
    k=256 error bound is useful for anyway.

At 100 TB the sketch is mergeable (union the bottom-k sets, keep the k
smallest), and the shuffle carries O(groups x k), independent of row
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Default hash width: 15 hex chars = 60 bits, the widest md5 prefix that
# stays non-negative in a signed BIGINT in both Spark and DuckDB.
HEX_CHARS = 15


def hash_space(hex_chars: int = HEX_CHARS) -> int:
    return 1 << (4 * hex_chars)


def kmv_hash(col, hex_chars: int = HEX_CHARS) -> "F.Column":
    """Uniform integer hash in 1..16^hex_chars, reproducible in any
    engine with md5: the first ``hex_chars`` hex chars parsed as an
    integer, plus one. The +1 keeps the hash strictly positive so the
    k-th minimum can never be 0 (KMV's estimator divides by it).
    ``hex_chars`` must be <= 15: the 16th char can set bit 63, and the
    signed-BIGINT parse overflows differently per engine."""
    if not 1 <= hex_chars <= 15:
        raise ValueError("hex_chars must be in 1..15 (signed-BIGINT safe)")
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, hex_chars), 16, 10).cast(
            "long"
        )
        + 1
    )


def kmv_distinct_estimate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
    hex_chars: int = HEX_CHARS,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Output: group cols + ``distinct_est`` (BIGINT). Groups with fewer
    than k distinct hashes get the EXACT distinct count (their bottom-k
    set is the full set - the standard KMV small-range fix).

    Plan shape: distinct (hash agg) -> per-group window rank on the hash
    (spill-safe per-group sort) -> filter rank <= k -> final agg. No
    stage ever carries more than k rows per group out of the rank
    filter; never an unbounded collect_set.

    Cross-engine determinism of the estimate: (k-1) * hash_space is
    EXACTLY representable in double (255 * 2^60 is 8 significant bits
    times a power of two); the one lossy step is casting ``kth`` - a
    60-bit BIGINT beyond double's 53-bit mantissa - to double for the
    division, which IEEE-754 round-to-nearest performs identically in
    Spark and DuckDB, so the floor'd BIGINT stays oracle-exact.
    """
    # COUNT(DISTINCT x) never counts NULL; neither does the sketch.
    # Unfiltered, a NULL value hashes to a NULL h that sorts FIRST
    # (asc nulls first), stealing a bottom-k slot AND inflating the
    # small-range exact count by one.
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, kmv_hash(F.col(value_col), hex_chars).alias("h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    topk = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(F.count("*").alias("n_topk"), F.max("h").alias("kth"))
    )
    est = F.when(F.col("n_topk") < k, F.col("n_topk").cast("long")).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(float(hash_space(hex_chars))) / F.col("kth")
        ).cast("long")
    )
    return topk.select(*group_cols, est.alias("distinct_est"))


def kmv_set_cardinality(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
    hex_chars: int = HEX_CHARS,
    max_groups: int = 256,
) -> DataFrame:
    """Distinct-count set algebra across group pairs from MERGED sketches:
    for every unordered pair (a, b) of ``group_col`` values, estimate
    |A|, |B|, |A union B| and |A intersect B| without ever touching the
    raw sets a second time.

    The KMV property doing the work: bottom-k(A union B) over the FULL
    sets equals bottom-k(sketch(A) union sketch(B)) - the k smallest of
    a union can only come from the k smallest of each side. So the
    union estimate needs only the two k-row sketches, and intersection
    follows by inclusion-exclusion (clamped at 0; like every KMV
    estimate it inherits ~1/sqrt(k-2) relative error, amplified for
    small intersections of large sets).

    Scale: the per-group sketch build is the same O(groups x k) shuffle
    as kmv_distinct_estimate; the pairing stage operates on sketches
    only - O(pairs x k) rows, independent of raw cardinality. **The
    pairwise output is inherently O(G^2) in the number of groups G**
    (G(G-1)/2 pairs x up to 2k sketch rows each): right for enum-like
    group columns (the use case), wrong for an unbounded group domain.
    The ``max_groups`` guard (default 256 -> <= 32,640 pairs) makes
    that bound LOUD: the sketch build counts its groups (O(G) rows,
    already materialized for the pairing stage) and raises ValueError
    instead of silently planning a quadratic join - callers with a
    larger legitimate enum raise the cap consciously; callers with an
    id-like group column get an error, not a 10^12-pair plan.

    Groups with fewer than k distinct hashes carry their exact set, so
    small-range pairs degrade gracefully to near-exact answers (same
    small-range fix as kmv_distinct_estimate).

    CALLER CONTRACT (cache lifetime): the per-group sketch is persisted
    - the downstream DAG references it from four subtrees (pair
    enumeration, both per-group stats joins, the merged-union stack),
    and without the persist each reference would re-scan and re-shuffle
    the RAW table (observed: 10 parquet scans in one plan). The sketch
    is O(groups x k) rows, trivially cacheable at any corpus size. A
    long-lived session should ``spark.catalog.clearCache()`` (or
    unpersist) after materializing the result, as bench.py does.
    """
    from pyspark import StorageLevel

    # same NULL exclusion as kmv_distinct_estimate: distinct-count
    # semantics never count NULL
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        group_col, kmv_hash(F.col(value_col), hex_chars).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    sketch = (
        hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    ).select(group_col, "h").persist(StorageLevel.MEMORY_AND_DISK)

    def estimate(n_topk, kth):
        return F.when(n_topk < k, n_topk.cast("long")).otherwise(
            F.floor(
                F.lit(float(k - 1))
                * F.lit(float(hash_space(hex_chars)))
                / kth
            ).cast("long")
        )

    per_group = sketch.groupBy(group_col).agg(
        F.count("*").alias("n_topk"), F.max("h").alias("kth")
    )
    n_groups = per_group.count()  # sketch is persisted; O(G) rows
    if n_groups > max_groups:
        sketch.unpersist()
        raise ValueError(
            f"kmv_set_cardinality: {n_groups} groups would produce "
            f"{n_groups * (n_groups - 1) // 2} pairs (O(G^2)); the "
            f"pairwise-set-algebra output is only meaningful for "
            f"enum-like group columns. Raise max_groups (={max_groups}) "
            f"explicitly if the domain is genuinely this large."
        )
    groups = per_group.select(F.col(group_col).alias("g"))
    pairs = (
        groups.alias("a")
        .crossJoin(groups.alias("b"))
        .filter(F.col("a.g") < F.col("b.g"))
        .select(F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b"))
    )
    # Merged sketch per pair: distinct union of the two member sketches,
    # re-ranked to bottom-k. Explode each pair into (pair, member) rows
    # so the membership join is an EQUI join (hash join) rather than an
    # OR-condition nested-loop; sketch rows are tiny (pairs x 2k max).
    pair_members = pairs.select(
        "group_a",
        "group_b",
        F.explode(F.array("group_a", "group_b")).alias("_m"),
    )
    stacked = (
        pair_members.join(sketch.withColumnRenamed(group_col, "_m"), "_m")
        .select("group_a", "group_b", "h")
        .distinct()
    )
    wu = Window.partitionBy("group_a", "group_b").orderBy("h")
    union_stats = (
        stacked.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= k)
        .groupBy("group_a", "group_b")
        .agg(F.count("*").alias("u_topk"), F.max("h").alias("u_kth"))
    )
    a_stats = per_group.select(
        F.col(group_col).alias("group_a"),
        F.col("n_topk").alias("a_topk"),
        F.col("kth").alias("a_kth"),
    )
    b_stats = per_group.select(
        F.col(group_col).alias("group_b"),
        F.col("n_topk").alias("b_topk"),
        F.col("kth").alias("b_kth"),
    )
    est_a = estimate(F.col("a_topk"), F.col("a_kth"))
    est_b = estimate(F.col("b_topk"), F.col("b_kth"))
    est_u = estimate(F.col("u_topk"), F.col("u_kth"))
    return (
        union_stats.join(F.broadcast(a_stats), "group_a")
        .join(F.broadcast(b_stats), "group_b")
        .select(
            "group_a",
            "group_b",
            est_a.alias("est_a"),
            est_b.alias("est_b"),
            est_u.alias("est_union"),
            F.greatest(F.lit(0).cast("long"), est_a + est_b - est_u).alias(
                "est_intersection"
            ),
        )
    )


def _cms_bucket(j: int, col, width: int, hash_fn: str):
    """Bucket of ``col`` under hash family ``j``. ``xxhash64`` is the
    fast JVM default; ``md5`` is slower but reproducible in ANY engine
    with md5 (same trick as kmv_hash), which upgrades the whole sketch
    from rows-only to value-hash oracle-checkable - the counters are
    then deterministic integers both engines compute identically."""
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(j), col), F.lit(width))
    if hash_fn == "md5":
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), col.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(width))
    raise ValueError("hash_fn must be 'xxhash64' or 'md5'")


def cms_sketch(
    df: "DataFrame",
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
) -> "DataFrame":
    """Count-min sketch: ``depth x width`` counters, counter (j, b)
    holding how many rows hash to bucket b under hash family j. The
    classic frequency sketch for heavy-hitter detection at scale: state
    is ``depth*width`` integers REGARDLESS of item cardinality (a 100 TB
    stream of ids fits in a few KB of counters), it's mergeable
    (counters add), and estimates only ever OVER-count (min over rows
    bounds collisions). One explode(depth) + one groupBy shuffle whose
    output is sketch-sized, never corpus-sized.
    """
    # SQL count(item) never counts NULL, so neither may the sketch.
    # Unfiltered, the two hash paths also silently DIVERGE on NULLs:
    # xxhash64(seed, NULL) is the bare seed, so every NULL row lands in
    # a real per-family bucket (inflating whichever item collides there
    # and making NULL probe-able as a phantom heavy hitter), while the
    # md5 path's concat yields a NULL bucket row the estimate join then
    # drops.
    df = df.filter(F.col(item_col).isNotNull())
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(j, F.col(item_col), width, hash_fn).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jb")
    )
    return (
        rows.select("jb.j", "jb.bucket")
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    candidates: "DataFrame",
    sketch: "DataFrame",
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
) -> "DataFrame":
    """Frequency estimate per candidate item from a ``cms_sketch``:
    min over the ``depth`` hash families of that item's counter. The
    sketch (and the per-candidate probe set) broadcast - both are
    sketch/candidate-sized. Estimates satisfy ``est >= true`` always;
    the overshoot is bounded by collision mass (pinned in tests).

    A NULL candidate has no countable frequency (count(item) skips
    NULL) and is absent from the output - mirroring cms_sketch's
    NULL-item exclusion on both hash paths."""
    candidates = candidates.filter(F.col(item_col).isNotNull())
    probes = candidates.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(j, F.col(item_col), width, hash_fn).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jb"),
    ).select(item_col, "jb.j", "jb.bucket")
    return (
        probes.join(F.broadcast(sketch), on=["j", "bucket"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("freq_est"))
    )
