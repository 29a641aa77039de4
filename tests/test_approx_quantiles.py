"""Error bound for the sketched percentile path: percentile_approx
(value_quantiles_approx, the plan that ships at 100 TB) must land
within 1% relative error of the exact rank-based answer
(value_quantiles_by_type, the oracle-checked baseline) on the real
events table."""

from __future__ import annotations

from pyspark_data_engineering_assignment_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def test_approx_quantiles_error_bound(spark):
    exact = {
        r["event_type"]: (r["median_cents"], r["p90_cents"])
        for r in QUERIES["value_quantiles_by_type"].fn(spark, SF).collect()
    }
    approx = {
        r["event_type"]: (r["median_cents_approx"], r["p90_cents_approx"])
        for r in QUERIES["value_quantiles_approx"].fn(spark, SF).collect()
    }
    assert set(exact) == set(approx)
    for et in exact:
        for e, a in zip(exact[et], approx[et]):
            assert abs(a - e) <= max(0.01 * abs(e), 1.0), (
                f"{et}: approx {a} vs exact {e} exceeds 1% relative error"
            )
