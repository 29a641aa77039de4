"""Scaling-ratio tripwire: run sentinel queries a DECADE beyond the
bench sf and fail if wall-time grows super-linearly.

Round 7's sf10 smoke caught four real scale bugs (a 1008s fixed-plane
LSH occupancy blow-up, a 131s uncapped pair generator, an inverted
contamination broadcast, merchant-keyed aggregate hints) precisely
because it ran 10-100x past the gate volume - correctness tests at
sf0.001 can't see occupancy laws. This automates that guard at the
first decade: sentinel queries (one per hazard family) run warm at
sf0.1 and at the 10x scale-up built by ``tools/scaleup.py``, and the
wall-time ratio must stay <= TRIP (12 = 10x data x 1.2 slack; every
healthy query measured 1.1-3.3x in the r7 sweep because fixed
per-query overhead amortizes, while the two known blow-ups measured
12.38x and >60x). A floor absorbs noise on sub-second sentinels.

Slow-marked: first run builds ~1.2 GB of scaled parquet under
``.scratch/sf1.0`` (idempotent - later runs reuse it).
"""

from __future__ import annotations

import time

import pytest

from pyspark_data_engineering_assignment_spark.plans import QUERIES

pytestmark = pytest.mark.slow

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/sf1.0"
TRIP = 12.0  # 10x data x 1.2 slack
FLOOR_S = 3.0  # absorb noise when the sf0.1 side is sub-second

# One sentinel per scale-hazard family.
SENTINELS = [
    "minhash_lsh_neardup",  # banded LSH self-join (band occupancy)
    "simhash_neardup_scaled",  # occupancy-scaled LSH (the r8 twin)
    "embedding_kmeans_cells",  # iterative clustering (per-round passes)
    "flat_sales_export",  # fact-fact shuffle join (AQE-sized dims)
    "patid1_upgrade",  # reference pattern (percentile + 3 joins)
    # round-11 full-registry exponent sweep (EXPONENTS_r11.json) adds:
    "embedding_neardup",  # occupancy-scaled by default since round 12
    #   (the fixed-plane plan it replaced was the ONE superlinear query,
    #   e=1.565 at r11 close, now the unregistered test-only baseline
    #   embedding_neardup_fixedplane); this pins that the SHIPPED
    #   scale path stays sub-linear
    "small_quantity_part_revenue",  # worst measured sub-linear exponent
    #   (0.805) among relational plans - the earliest query to trip if a
    #   join/agg shape regresses super-linear
]


@pytest.fixture(scope="module")
def scaled_dir(spark):
    from pyspark_data_engineering_assignment_spark.tools.scaleup import (
        build_scaled_dir,
    )

    build_scaled_dir(spark, SRC, DST, 10)
    return DST


def _warm_time(spark, name: str, sf_dir: str) -> float:
    """Noop-sink time of a JIT-warm run, INCLUDING plan construction:
    the timed second pass re-invokes ``fn`` so eager build-time work is
    measured too — the k-means sentinel runs all its Lloyd rounds
    inside ``fn`` (per-round aggregates), and timing only the final
    assignment pass would let the exact iterative-training hazard this
    sentinel exists for blow up untimed. For the other sentinels
    ``fn`` is pure plan construction (ms), so this matches
    tools/scaling_sweep.py's warm-second-run protocol."""
    df = QUERIES[name].fn(spark, sf_dir)  # run 1: warm JIT (build + plan)
    df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df2 = QUERIES[name].fn(spark, sf_dir)  # timed: eager build included
    df2.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    spark.catalog.clearCache()
    return elapsed


@pytest.mark.slow
@pytest.mark.parametrize("name", SENTINELS)
def test_sentinel_scales_linearly(spark, scaled_dir, name):
    t_small = _warm_time(spark, name, SRC)
    t_big = _warm_time(spark, name, scaled_dir)
    budget = max(TRIP * t_small, FLOOR_S)
    assert t_big <= budget, (
        f"{name}: {t_small:.2f}s at sf0.1 -> {t_big:.2f}s at 10x "
        f"(ratio {t_big / max(t_small, 1e-9):.1f}x > {TRIP}x trip) - "
        "super-linear growth; find the occupancy/broadcast/pair-cap "
        "regression before it lands at 100 TB"
    )
