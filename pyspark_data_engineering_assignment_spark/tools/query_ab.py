"""Interleaved A/B harness for query-plan variants (round-14 protocol).

Runs baseline and variant plan builders interleaved (b,v,b,v,b,v) with a
noop-sink warm timer per execution, keeping min-of-N per arm per scale
dir - the protocol BENCH_AB_r14.json established: warm noop time has a
hard floor, host stalls only inflate, so the min is the comparable
figure. One idle session per scale set.

Library use (drive from a small script):

    from pyspark_data_engineering_assignment_spark.tools.query_ab import ab
    result = ab(spark, {"sf0.1": dir1, "sf10": dir2},
                baseline=lambda spark, d: old_plan(spark, d),
                variant=lambda spark, d: new_plan(spark, d), reps=3)
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _run_once(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab(
    spark: SparkSession,
    sf_dirs: dict[str, str],
    baseline: Callable[[SparkSession, str], DataFrame],
    variant: Callable[[SparkSession, str], DataFrame],
    reps: int = 3,
) -> dict:
    """Interleaved min-of-``reps`` A/B; returns a JSON-ready dict."""
    out: dict = {}
    for label, d in sf_dirs.items():
        b_df = baseline(spark, d)
        v_df = variant(spark, d)
        # one untimed warmup each: JIT/codegen compile is one-time cost,
        # not the steady-state figure a plan comparison should score
        _run_once(b_df)
        spark.catalog.clearCache()
        _run_once(v_df)
        spark.catalog.clearCache()
        b_times, v_times = [], []
        for _ in range(reps):
            b_times.append(round(_run_once(b_df), 3))
            spark.catalog.clearCache()
            v_times.append(round(_run_once(v_df), 3))
            spark.catalog.clearCache()
        out[label] = {
            "baseline": b_times,
            "variant": v_times,
            "baseline_min": min(b_times),
            "variant_min": min(v_times),
        }
    return out
