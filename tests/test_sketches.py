"""KMV sketch tests: exact on small groups, bounded relative error on
large ones, cross-engine estimate parity covered by the registry oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.operators.sketches import (
    kmv_distinct_estimate,
    kmv_set_cardinality,
)
import pytest


def test_kmv_exact_below_k(spark):
    df = spark.range(100).select(
        F.lit("g").alias("g"), (F.col("id") % 37).alias("v")
    )
    got = kmv_distinct_estimate(df, ["g"], "v", k=256).collect()[0]
    assert got["distinct_est"] == 37  # below k: exact by construction


def test_kmv_error_bounded_above_k(spark):
    # 50k distinct values, k=256 -> stderr ~ 1/sqrt(254) ~ 6.3%
    df = spark.range(50_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    got = kmv_distinct_estimate(df, ["g"], "v", k=256).collect()[0]
    rel_err = abs(got["distinct_est"] - 50_000) / 50_000
    assert rel_err < 0.2, f"estimate {got['distinct_est']} rel_err {rel_err:.3f}"


def test_kmv_insensitive_to_duplication(spark):
    # the sketch sees distinct hashes only: duplicating rows changes nothing
    base = spark.range(10_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    dup = base.union(base).union(base)
    a = kmv_distinct_estimate(base, ["g"], "v").collect()[0]["distinct_est"]
    b = kmv_distinct_estimate(dup, ["g"], "v").collect()[0]["distinct_est"]
    assert a == b


def test_kmv_hash_width_collision_floor(spark):
    """Demonstrate WHY the default hash widened from 8 to 15 hex chars:
    200k distinct values already collide in the 32-bit md5-prefix domain
    (deterministically - md5 of fixed strings - distinct hashes < n, so
    the sketch estimates distinct HASHES and biases low), while the
    60-bit domain is collision-free far beyond any group cardinality the
    k=256 error bound is useful for. Expected counts precomputed with
    hashlib: 199,996 distinct 8-char prefixes vs 200,000 15-char ones."""
    from pyspark_data_engineering_assignment_spark.operators.sketches import kmv_hash

    n = 200_000
    df = spark.range(n).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    d32 = df.select(kmv_hash(F.col("v"), hex_chars=8).alias("h")).distinct().count()
    d60 = df.select(kmv_hash(F.col("v"), hex_chars=15).alias("h")).distinct().count()
    assert d32 == 199_996, d32  # 4 birthday collisions at n^2/2^33 ~ 4.7
    assert d60 == n, d60


def test_kmv_widened_estimate_still_bounded(spark):
    # the 60-bit estimator keeps the k=256 error bound on a 50k-distinct group
    df = spark.range(50_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    got = kmv_distinct_estimate(df, ["g"], "v", k=256, hex_chars=15).collect()[0]
    rel_err = abs(got["distinct_est"] - 50_000) / 50_000
    assert rel_err < 0.2, f"estimate {got['distinct_est']} rel_err {rel_err:.3f}"


def test_kmv_setops_exact_below_k(spark):
    # A = {0..119}, B = {60..209}: groups AND their union stay below
    # k=256, so every figure degrades to the EXACT answer (small-range
    # fix) - union 210 < k, intersection 60 by inclusion-exclusion.
    df = spark.range(0, 120).select(F.lit("A").alias("g"), F.col("id").alias("v")).union(
        spark.range(60, 210).select(F.lit("B").alias("g"), F.col("id").alias("v"))
    )
    row = kmv_set_cardinality(df, "g", "v", k=256).collect()[0]
    assert (row.group_a, row.group_b) == ("A", "B")
    assert (row.est_a, row.est_b) == (120, 150)
    assert row.est_union == 210
    assert row.est_intersection == 60


def test_kmv_setops_estimates_above_k(spark):
    # |A| = 20k, |B| = 20k, overlap 10k -> union 30k. k=256 gives
    # ~6.3% relative sd; assert within 4 sigma.
    df = spark.range(0, 20_000).select(
        F.lit("A").alias("g"), F.col("id").alias("v")
    ).union(
        spark.range(10_000, 30_000).select(F.lit("B").alias("g"), F.col("id").alias("v"))
    )
    row = kmv_set_cardinality(df, "g", "v", k=256).collect()[0]
    assert abs(row.est_a - 20_000) < 0.25 * 20_000
    assert abs(row.est_b - 20_000) < 0.25 * 20_000
    assert abs(row.est_union - 30_000) < 0.25 * 30_000
    # intersection inherits the union's absolute error band
    assert abs(row.est_intersection - 10_000) < 0.25 * 30_000


def test_kmv_setops_all_pairs(spark):
    df = spark.range(0, 300).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v")
    )
    out = kmv_set_cardinality(df, "g", "v", k=256)
    rows = {(r.group_a, r.group_b): r for r in out.collect()}
    assert set(rows) == {("0", "1"), ("0", "2"), ("1", "2")}
    for r in rows.values():
        # residue classes are disjoint: union exact 200, intersection 0
        assert (r.est_a, r.est_b, r.est_union, r.est_intersection) == (
            100, 100, 200, 0,
        )


def test_hll_estimate_within_rsd_bound(spark):
    """user_reach_hll: HLL++ at rsd=0.02 must land within 3 standard
    errors (6%) of exact on every group - loose enough to be stable,
    tight enough that a broken sketch (or an accidental rsd change)
    fails loudly."""
    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    rows = QUERIES["user_reach_hll"].fn(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        err = abs(r["distinct_est"] - r["exact_distinct"]) / r["exact_distinct"]
        assert err <= 0.06, (r["event_type"], r["distinct_est"], r["exact_distinct"])


def test_cms_never_undercounts_and_bounds_overshoot(spark):
    """CMS guarantees on real data: est >= exact for every probed item
    (structural - min over counters that each include the item's own
    count), and the overshoot is bounded by expected collision mass
    (~N/width per counter; 5x slack keeps the pin stable)."""
    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["user_heavy_hitters_cms"].fn(spark, sf).collect()
    assert len(rows) == 20
    n_total = spark.read.parquet(f"{sf}/events.parquet").count()
    slack = 5 * n_total / 1024  # 5x expected per-counter collision mass
    for r in rows:
        assert r["freq_est"] >= r["exact_count"], r
        assert r["freq_est"] <= r["exact_count"] + slack, (r, slack)


def test_kmv_setops_group_domain_guard(spark):
    """The pairwise output is O(G^2) by construction; an id-like group
    column must raise loudly instead of planning a quadratic join."""
    import pytest

    df = spark.range(0, 40).select(
        F.col("id").cast("string").alias("g"), F.col("id").alias("v")
    )
    with pytest.raises(ValueError, match="O\\(G\\^2\\)"):
        kmv_set_cardinality(df, "g", "v", k=16, max_groups=10)
    # raising the cap consciously unblocks the same call
    assert kmv_set_cardinality(df, "g", "v", k=16, max_groups=64).count() == (
        40 * 39 // 2
    )


@pytest.mark.slow
def test_kmv_property_matches_md5_replay(spark):
    """Property (hypothesis): for ANY multiset of string values with
    NULLs and duplicates across two groups, kmv_distinct_estimate
    equals the plain-Python md5 bottom-k replay exactly - the sketch is
    a pure function of each group's distinct non-NULL set (duplication,
    row order and partitioning invisible), below-k groups are EXACT,
    NULLs never steal a bottom-k slot, and an all-NULL group is absent."""
    import hashlib
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_data_engineering_assignment_spark.operators.sketches import (
        HEX_CHARS,
        hash_space,
        kmv_distinct_estimate,
    )

    vals = st.none() | st.text(alphabet="abcdef", min_size=1, max_size=2)
    K = 4

    def py_hash(v: str) -> int:
        return int(hashlib.md5(v.encode()).hexdigest()[:HEX_CHARS], 16) + 1

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(st.sampled_from(["g", "h"]), vals), min_size=1, max_size=20
        )
    )
    def prop(rows):
        df = spark.createDataFrame(rows, "g string, v string")
        got = {
            r["g"]: r["distinct_est"]
            for r in kmv_distinct_estimate(df, ["g"], "v", k=K).collect()
        }
        expect = {}
        for grp in ("g", "h"):
            hs = sorted({py_hash(v) for g, v in rows if g == grp and v is not None})
            if not hs:
                continue  # all-NULL group absent
            if len(hs) < K:
                expect[grp] = len(hs)
            else:
                expect[grp] = math.floor(
                    float(K - 1) * float(hash_space()) / float(hs[K - 1])
                )
        assert got == expect, (rows, got, expect)

    prop()


@pytest.mark.slow
def test_cms_null_items_uncounted_on_both_hash_paths(spark):
    """count(item) never counts NULL, so neither may the sketch - and
    the two hash paths previously DIVERGED on NULLs (xxhash64 put every
    NULL row in a real seed bucket, probe-able as a phantom heavy
    hitter and inflating colliding items; md5 made a NULL bucket row).
    Both paths must now produce the identical sketch with or without
    NULL rows, and a NULL candidate gets no estimate row."""
    from pyspark_data_engineering_assignment_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    clean = spark.createDataFrame([("a",)] * 3, "item string")
    dirty = clean.unionByName(
        spark.createDataFrame([(None,)] * 5, "item string")
    )
    cand = spark.createDataFrame([("a",), (None,)], "item string")
    for hf in ("xxhash64", "md5"):
        s_clean = sorted(
            (r["j"], r["bucket"], r["cnt"])
            for r in cms_sketch(clean, "item", depth=2, width=8, hash_fn=hf).collect()
        )
        s_dirty = sorted(
            (r["j"], r["bucket"], r["cnt"])
            for r in cms_sketch(dirty, "item", depth=2, width=8, hash_fn=hf).collect()
        )
        assert s_clean == s_dirty, hf
        est = {
            r["item"]: r["freq_est"]
            for r in cms_estimate(
                cand,
                cms_sketch(dirty, "item", depth=2, width=8, hash_fn=hf),
                "item",
                depth=2,
                width=8,
                hash_fn=hf,
            ).collect()
        }
        assert est == {"a": 3}, (hf, est)


@pytest.mark.slow
def test_cms_property_never_undercounts_md5_replay(spark):
    """Property (hypothesis): for ANY multiset of items with NULLs
    mixed in, the md5-path CMS equals the plain-Python counter replay
    over non-NULL rows - so every candidate's estimate is exactly
    min over hash families of its bucket's counter, which can never
    undercount the item's true frequency."""
    import hashlib
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_data_engineering_assignment_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    DEPTH, WIDTH = 2, 4  # tiny on purpose: force collisions

    def py_bucket(j: int, v: str) -> int:
        return int(hashlib.md5(f"{j}:{v}".encode()).hexdigest()[:15], 16) % WIDTH

    vals = st.none() | st.text(alphabet="abc", min_size=1, max_size=2)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=st.lists(vals, min_size=1, max_size=15))
    def prop(rows):
        df = spark.createDataFrame([(v,) for v in rows], "item string")
        true = Counter(v for v in rows if v is not None)
        if not true:
            return  # all-NULL input: nothing to probe
        counters = Counter()
        for v, n in true.items():
            for j in range(DEPTH):
                counters[(j, py_bucket(j, v))] += n
        cand = spark.createDataFrame([(v,) for v in true], "item string")
        sketch = cms_sketch(df, "item", depth=DEPTH, width=WIDTH, hash_fn="md5")
        got = {
            r["item"]: r["freq_est"]
            for r in cms_estimate(
                cand, sketch, "item", depth=DEPTH, width=WIDTH, hash_fn="md5"
            ).collect()
        }
        expect = {
            v: min(counters[(j, py_bucket(j, v))] for j in range(DEPTH))
            for v in true
        }
        assert got == expect, (rows, got, expect)
        assert all(got[v] >= true[v] for v in true)

    prop()
