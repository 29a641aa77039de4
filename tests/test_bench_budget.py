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

SF = "/root/testdata/sf0.01"

# Worst observed cold bench seconds at sf0.1 across rounds 4-5 (BENCH_r04
# + round-5 in-session runs); the budget below triples them and floors at
# 3s, then runs at sf0.01 - an order of magnitude of headroom per query.
REFERENCE_SF01_SECONDS = {
    "minhash_lsh_neardup": 4.44,
    "embedding_neardup": 3.16,
    "ann_ivf_topk": 2.66,
    "event_reach_setops_kmv": 2.62,
    "ann_cosine_topk": 2.30,
    "patid1_upgrade": 2.18,
    "simhash_neardup": 2.08,
    "corpus_curation_funnel": 2.06,
    "doc_winnowing": 1.86,
    "label_standardized_embeddings": 1.80,
    "nations_above_revenue_share": 1.65,
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
