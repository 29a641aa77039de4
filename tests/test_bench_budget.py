"""In-round perf regression guard: every registry query must stay within
a generous wall-clock budget at sf0.01.

Bench regressions used to surface only at judging (round 4: an
unexplained 5.2x move on label_standardized_embeddings). This is the
cheap early warning: budgets are 2x the round-4 bench numbers - which
were measured at sf0.1, ten times this test's data - floored at 3s to
absorb JIT/first-run noise in the shared test session. A query that
blows a budget here has regressed by an order of magnitude, not by
timer jitter.

Marked ``slow`` (full-registry sweep, ~1 min); skippable via
``-m 'not slow'`` like the other driver-scale tests.
"""

from __future__ import annotations

import time

import pytest

from pyspark_data_engineering_assignment_spark.plans import QUERIES

pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.01"

# Worst of (cold, warm) bench seconds at sf0.1 from the round-6 final
# full bench (BENCH_DETAIL.json, codegen cache 5000, solo box): every
# query whose worst IN-BENCH run (cold or warm, 96x2-query session -
# includes session pressure; e.g. doc_contamination_screen measures
# 0.7s solo but 3.2s late in the bench sweep) was >= ~1s is listed,
# per the round-5 verdict's coverage mandate. The budget below triples
# them and floors at 3s, then runs at sf0.01 - an order of magnitude
# of headroom per query.
REFERENCE_SF01_SECONDS = {
    # iterative trainer: 8 sequential jobs of fixed overhead, not data
    # cost (2000 vectors) - see operators/clustering.py
    "embedding_kmeans_cells": 12.42,
    "minhash_lsh_neardup": 4.58,  # md5 audit mode: the oracle-exact config
    "flat_sales_export": 2.60,  # two countDistincts over the flat star
    "ann_ivf_topk": 3.99,
    "corpus_curation_funnel": 3.19,
    "doc_contamination_screen": 3.16,
    "conversion_lag_stats": 2.11,
    "doc_boilerplate_shingles": 2.04,
    "event_reach_setops_kmv": 1.69,
    "doc_repetition_stats": 1.69,
    "doc_tfidf_topterms": 1.62,
    "patid1_upgrade": 1.67,
    "ann_cosine_topk": 1.66,
    "sole_failing_suppliers": 1.77,
    "simhash_neardup": 1.55,
    "event_class_totals_salted": 1.49,
    "embedding_neardup": 1.26,
    "big_quantity_orders": 1.22,
    "doc_quality_features": 1.11,
    "revenue_by_nation": 1.08,
    "nations_above_revenue_share": 1.04,
    "brand_type_revenue": 1.02,
    "doc_incremental_dedup": 1.00,
    "events_props_json": 0.98,
    "small_quantity_part_revenue": 0.99,
}
DEFAULT_BUDGET = 3.0


def _budget(name: str) -> float:
    # 3x, not 2x: queries with fixed driver-side overhead (pyspark.ml
    # fits, multi-job plans) don't shrink with SF, so a 2x bound sits
    # within run-to-run noise of the sf0.1 reference numbers. This is
    # an order-of-magnitude tripwire; the per-round bench is the
    # precision instrument.
    return max(DEFAULT_BUDGET, 3.0 * REFERENCE_SF01_SECONDS.get(name, 0.0))


def _run(spark, spec) -> float:
    df = spec.fn(spark, SF)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    spark.catalog.clearCache()
    return elapsed


@pytest.mark.slow
def test_registry_queries_within_budget(spark):
    # The budgets derive from WARM bench numbers, but this file sorts
    # first in the suite, so the session may be stone-cold. Mirror
    # bench.py's warmup (parquet footer/JIT + Arrow worker-pool spawn),
    # and re-measure once before flagging a violation so one-time
    # whole-stage-codegen compilation of a deep plan can't masquerade
    # as a regression.
    spark.read.parquet(f"{SF}/lineitem.parquet").count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    over = []
    for name, spec in sorted(QUERIES.items()):
        elapsed = _run(spark, spec)
        if elapsed > _budget(name):
            elapsed = min(elapsed, _run(spark, spec))
        if elapsed > _budget(name):
            over.append((name, round(elapsed, 2), _budget(name)))
    assert not over, f"queries over budget (name, seconds, budget): {over}"


@pytest.mark.slow
def test_pricing_summary_scan_rate_floor(spark):
    """The simplest scan-agg query's throughput is the canary for
    session-wide decay (it went 1.17M -> 735k -> 610k rows/s over
    rounds 3-5 before the codegen-cache root cause was found). Pin the
    round-6 committed value as a floor: >= 850k lineitem rows/s at
    sf0.1, min-of-3 JIT-warm runs (min, because this suite shares a
    session with 120 other plans and GC/compilation of a NEIGHBOR must
    not fail the canary - sustained capability is what is pinned)."""
    sf01 = "/root/testdata/sf0.1"
    spec = QUERIES["pricing_summary"]
    rows = spark.read.parquet(f"{sf01}/lineitem.parquet").count()
    df = spec.fn(spark, sf01)
    df.write.format("noop").mode("overwrite").save()  # JIT warm
    best = min(
        _timed_noop(df) for _ in range(3)
    )
    rate = rows / best
    assert rate >= 850_000, (
        f"pricing_summary scan rate {rate:,.0f} rows/s < 850k floor "
        f"(best warm {best:.3f}s over {rows:,} rows)"
    )


def _timed_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
