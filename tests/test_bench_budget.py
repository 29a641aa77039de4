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

# Round-4 bench seconds at sf0.1 (BENCH_r04); the budget below doubles
# them and floors at 3s, then runs at sf0.01 - an order of magnitude of
# headroom for every query.
R4_SF01_SECONDS = {
    "minhash_lsh_neardup": 4.44,
    "ann_ivf_topk": 2.37,
    "ann_cosine_topk": 2.30,
    "corpus_curation_funnel": 2.06,
    "patid1_upgrade": 1.94,
    "doc_winnowing": 1.86,
    "label_standardized_embeddings": 1.80,
    "embedding_neardup": 1.52,
}
DEFAULT_BUDGET = 3.0


def _budget(name: str) -> float:
    return max(DEFAULT_BUDGET, 2.0 * R4_SF01_SECONDS.get(name, 0.0))


@pytest.mark.slow
def test_registry_queries_within_budget(spark):
    over = []
    for name, spec in sorted(QUERIES.items()):
        df = spec.fn(spark, SF)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        spark.catalog.clearCache()
        if elapsed > _budget(name):
            over.append((name, round(elapsed, 2), _budget(name)))
    assert not over, f"queries over budget (name, seconds, budget): {over}"
