"""sf0.1 -> sf1.0 scaling sweep (SCALING.md evidence).

Runs the most expensive registry queries at the bench sf AND at a 10x
scale-up built by ``tools/scaleup.py``, reporting warm wall-time ratios.
A linear-scaling operator on fixed cores should ratio <= ~10x; at sf0.1
many plans are overhead-dominated (fixed per-query costs: planning, task
launch, exchange setup), so healthy ratios land well UNDER 10. Anything
materially over ~12x is flagged as super-linear and must be explained.

Usage::

    python -m pyspark_data_engineering_assignment_spark.tools.scaling_sweep \
        [--build] [--queries name1,name2,...]

``--build`` materializes the scaled dir first (idempotent).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark_data_engineering_assignment_spark.plans import QUERIES
from pyspark_data_engineering_assignment_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/sf1.0"

# The bench's most expensive queries (BENCH_DETAIL.json warm order) plus
# every query whose broadcast-hint removal round 7 must smoke out, plus
# the exact-baseline ANN (documented quadratic) as a known-shape control.
DEFAULT_QUERIES = [
    "minhash_lsh_neardup",
    "flat_sales_export",
    "sole_failing_suppliers",
    "doc_boilerplate_shingles",
    "rollup_lineitem_status",
    "patid1_upgrade",
    "simhash_neardup",
    "doc_contamination_screen",
    "embedding_kmeans_cells",
    "revenue_by_nation",
    "ann_ivf_topk",
    "nations_above_revenue_share",
    "nation_region_revenue_share",
    "big_quantity_orders",
    "pricing_summary",
    "small_quantity_part_revenue",
    "nation_pair_trade_volume",
    "brand_type_revenue",
    "ann_cosine_topk",
    "events_props_json",
]


def _warm_time(spark, name: str, sf_dir: str) -> float:
    """Noop-sink execution time of the JIT-warm second run (same protocol
    as bench.py's warm column)."""
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    spark.catalog.clearCache()
    return round(elapsed, 3)


def exponent_sweep(spark, names, sf_dirs: dict[str, str]) -> list[dict]:
    """Round-11 scale-exponent table: warm time per query at each sf in
    ``sf_dirs`` ({label: dir}, ascending scale), plus the fitted
    per-decade scaling exponent  e = log10(t_hi / t_lo) / decades.
    On fixed cores a perfectly linear operator has e = 1.0; at small sf
    fixed overheads (planning, task launch, exchange setup) amortize, so
    healthy queries land well under 1. e > 1 means super-linear growth
    and must be explained by the operator's documented shape (e.g. the
    brute-force ANN baseline is O(corpus) per query by DESIGN).

    Host-stall hardening (round-12 verdict task #3): a single degraded
    host window once logged ann_ivf_probe_topk at 60.08s on sf1 vs 3.34s
    on sf10 - a physically impossible curve. Warm noop time has a hard
    floor (the true plan cost) and stalls only INFLATE, so min-of-reruns
    is the correct combiner. Two targeted repairs, both recorded in the
    row under "remeasured" so the artifact shows its work:

    * non-monotonic drop: a point > 3x its larger-scale neighbor (and
      > 0.5s, below which 3x is timer jitter) is re-measured, min kept;
    * near-superlinear endpoints: an exponent > 0.9 re-measures both
      endpoints once before the verdict stands - a stall on the hi
      point is exactly what fakes a superlinear alarm.

    Residual one-sided bias (round-13 advice, accepted + documented in
    SCALING.md): repair triggers only on verdicts that ALARM (exponent
    > 0.9, non-monotonic drop), and min-keeping can only lower points.
    Consequences: (a) a stall on the LO point deflates the exponent
    (reads too flat) and is never re-examined - in the worst case a
    genuinely superlinear curve could hide behind a lo-point stall for
    one round; (b) a chain of 3+ stalls can outlast the 2-iteration
    repair loop. Both are bounded by the ROUND cadence, not by this
    sweep: the sweep reruns every round on a freshly measured lo point,
    so a stall-masked exponent re-surfaces next round (a real
    superlinear curve alarms every clean round; a stall is transient).
    Full min-of-2 on every point would remove the bias but doubles a
    40-90 min sweep for a one-round detection latency win - not paid.
    """
    import math

    labels = list(sf_dirs)
    lo, hi = labels[0], labels[-1]
    decades = math.log10(float(hi.lstrip("sf")) / float(lo.lstrip("sf")))

    def fitted_exponent(times: dict) -> float:
        return round(
            math.log10(max(times[hi], 1e-3) / times[lo]) / decades, 3
        )

    rows = []
    for name in names:
        times = {}
        remeasured: dict[str, list[float]] = {}
        err = None

        def remeasure(label: str) -> None:
            new = _warm_time(spark, name, sf_dirs[label])
            remeasured.setdefault(label, [times[label]]).append(new)
            times[label] = min(times[label], new)

        for label, d in sf_dirs.items():
            try:
                times[label] = _warm_time(spark, name, d)
            except Exception as exc:  # keep sweeping; record the failure
                err = f"{label}: {type(exc).__name__}: {exc}"[:200]
                break
        if not err:
            got = [l for l in labels if l in times]
            for _ in range(2):  # a repaired point can expose a second stall
                bad = [
                    got[i]
                    for i in range(len(got) - 1)
                    if times[got[i]] > 3 * times[got[i + 1]]
                    and times[got[i]] > 0.5
                ]
                if not bad:
                    break
                for label in bad:
                    remeasure(label)
            if times[lo] > 0 and fitted_exponent(times) > 0.9:
                for label in (lo, hi):
                    remeasure(label)
        row = {"query": name, **times}
        if remeasured:
            row["remeasured"] = remeasured
        if err:
            row["err"] = err
        elif times[lo] > 0:
            row["exponent"] = fitted_exponent(times)
        rows.append(row)
        print(json.dumps(row, separators=(",", ":")), flush=True)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--dst", default=DST)
    ap.add_argument(
        "--exponents",
        action="store_true",
        help="full-registry three-point (sf0.1/sf1/sf10) exponent table",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="scaling_sweep")
    if args.build:
        from pyspark_data_engineering_assignment_spark.tools.scaleup import (
            build_scaled_dir,
        )

        build_scaled_dir(spark, args.src, args.dst, 10)

    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES
    # JVM + Arrow worker warmup (same as bench.py)
    spark.read.parquet(f"{args.src}/lineitem.parquet").count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    if args.exponents:
        all_names = args.queries.split(",") if args.queries else sorted(QUERIES)
        rows = exponent_sweep(
            spark,
            all_names,
            {
                "sf0.1": args.src,
                "sf1": "/root/repo/.scratch/sf1.0",
                "sf10": "/root/repo/.scratch/sf10",
            },
        )
        print(json.dumps({"exponents": rows}, separators=(",", ":")))
        return

    rows = []
    for name in names:
        t_small = _warm_time(spark, name, args.src)
        t_big = _warm_time(spark, name, args.dst)
        ratio = round(t_big / t_small, 2) if t_small > 0 else float("inf")
        rows.append(
            {"query": name, "src_s": t_small, "dst_s": t_big, "ratio": ratio}
        )
        print(json.dumps(rows[-1], separators=(",", ":")), flush=True)
    print(json.dumps({"sweep": rows}, separators=(",", ":")))


if __name__ == "__main__":
    main()
