#!/usr/bin/env python
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Execution is measured with the noop sink so the full plan runs (scan ->
shuffle -> agg/join) without collect() or file-write overhead skewing the
numbers. One warmup action amortizes JVM/codegen startup.

Also measures the BASELINE.md binding number: end-to-end streaming
throughput of the full detection pipeline (feeder -> file stream -> state
merges -> enrich -> detect -> 50-row sink) against the reference's
>=10,000 rows/s offered load. Reported under "streaming" without touching
the registry totals.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark_data_engineering_assignment_spark.plans import QUERIES
from pyspark_data_engineering_assignment_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# 200k rows: large enough that the ~4s fixed streaming-query startup
# doesn't dominate the sustained-throughput figure
STREAM_ROWS = int(os.environ.get("SPARK_GRAFT_STREAM_ROWS", "200000"))
# Every streaming section runs N times and commits {median, min, max,
# runs:[...]} (round-12 verdict task #1): the host noise band is
# ±20-37%, so a single sample in a degraded window once recorded a
# below-gate 5.3k rows/s headline for a tree that reads 21-22.5k idle.
# The feed is built once per section; only the drain repeats.
STREAM_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_STREAM_RUNS_N", "3")))


def bench_streaming(spark) -> dict:
    """End-to-end pipeline throughput on a synthetic BankSim-shaped feed
    (deterministic, seed 42). The trigger drains the whole backlog per
    micro-batch (maxFilesPerTrigger=None): per-batch overhead is fixed,
    so sustained throughput is set by batch size - the tuning a real
    deployment makes against a 10k rows/s offered load."""
    import numpy as np
    import pandas as pd

    from pyspark_data_engineering_assignment_spark.config import EngineConfig
    from pyspark_data_engineering_assignment_spark.patterns.detect import FixedClock
    from pyspark_data_engineering_assignment_spark.sources.readers import read_importance
    from pyspark_data_engineering_assignment_spark.state.store import ParquetStateStore
    from pyspark_data_engineering_assignment_spark.streaming.pipeline import (
        DetectionPipeline,
    )
    from pyspark_data_engineering_assignment_spark.tools.feeder import feed_chunks

    n = STREAM_ROWS
    rng = np.random.default_rng(42)
    tx = pd.DataFrame(
        {
            "step": np.repeat(np.arange(max(1, n // 10_000)), 10_000)[:n],
            "customer": [f"C{i}" for i in rng.integers(0, 2000, n)],
            "age": rng.integers(1, 7, n).astype(str),
            "gender": rng.choice(["M", "F"], n, p=[0.55, 0.45]),
            "zipcodeOri": "28007",
            "merchant": [f"M{i}" for i in rng.integers(0, 100, n)],
            "zipMerchant": "28007",
            "category": rng.choice(["es_a", "es_b", "es_c"], n),
            "amount": np.round(rng.exponential(35.0, n), 2),
            "fraud": 0,
        }
    )
    imp = pd.DataFrame(
        {
            "Source": [f"C{i}" for i in range(2000)],
            "Target": [f"M{i % 100}" for i in range(2000)],
            "Weight": np.round(rng.uniform(0.1, 9.9, 2000), 2),
            "typeTrans": [["es_a", "es_b", "es_c"][i % 3] for i in range(2000)],
            "fraud": 0,
        }
    )
    tmp = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        src = os.path.join(tmp, "tx.csv")
        tx.to_csv(src, index=False)
        impp = os.path.join(tmp, "imp.csv")
        imp.to_csv(impp, index=False)
        indir = os.path.join(tmp, "incoming")
        feed_chunks(src, indir, chunk_rows=10_000)  # reference chunk size

        importance = read_importance(spark, impp)

        # Warmup pass: drain a 10k-row feed through a throwaway pipeline
        # first so the streaming plans' whole-stage codegen is JIT-compiled
        # before the measurement - the registry queries warmed the JVM but
        # never these plan shapes, and a single cold batch otherwise bills
        # one-time compilation to the sustained-throughput figure
        # (measured: 200k rows drain in ~12s cold vs ~7s warm).
        warm_src = os.path.join(tmp, "warm.csv")
        tx.head(10_000).to_csv(warm_src, index=False)
        warm_in = os.path.join(tmp, "warm_incoming")
        feed_chunks(warm_src, warm_in, chunk_rows=10_000)
        warm_pipe = DetectionPipeline(
            spark,
            ParquetStateStore(spark, os.path.join(tmp, "warm_state")),
            importance,
            os.path.join(tmp, "warm_detections"),
            config=EngineConfig(max_files_per_trigger=None),
            clock=FixedClock(),
        )
        warm_pipe.run_stream(
            warm_in, os.path.join(tmp, "warm_checkpoint")
        ).awaitTermination()

        from pyspark_data_engineering_assignment_spark.streaming.pipeline import (
            progress_latency_stats,
        )
        from pyspark_data_engineering_assignment_spark.tools.events_feed import (
            aggregate_stream_runs,
        )

        # Measured drains: same backlog, fresh state/checkpoint per run;
        # median-of-N is the committed figure (host-noise shield).
        results = []
        for i in range(STREAM_RUNS):
            sub = os.path.join(tmp, f"run{i}")
            store = ParquetStateStore(spark, os.path.join(sub, "state"))
            pipe = DetectionPipeline(
                spark,
                store,
                importance,
                os.path.join(sub, "detections"),
                config=EngineConfig(max_files_per_trigger=None),
                clock=FixedClock(),
            )
            t0 = time.perf_counter()
            q = pipe.run_stream(indir, os.path.join(sub, "checkpoint"))
            q.awaitTermination()
            elapsed = time.perf_counter() - t0
            results.append(
                {
                    "rows": n,
                    "seconds": round(elapsed, 3),
                    "rows_per_sec": round(n / elapsed),
                    "chunk_rows": 10_000,
                    "baseline_offered_rows_per_sec": 10_000,
                    "latency": progress_latency_stats(q),
                }
            )
        out = aggregate_stream_runs(results)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_STREAM_FACT_KEYS = (
    "rows",
    "seconds",
    "seconds_median",
    "rows_per_sec",
    "rows_per_sec_median",
    "rows_per_sec_min",
    "rows_per_sec_max",
    "n_runs",
    "runs",
    "chunk_rows",
    "latency",
)


def _stream_facts(run: dict) -> dict:
    """Strip run-internal handles (store objects, chunk paths) down to
    the JSON-serializable facts the bench artifact records."""
    return {k: run[k] for k in _STREAM_FACT_KEYS if k in run}


def bench_streaming_sf(spark) -> dict:
    """Streaming flagship at the bench SF: the driver's events table
    mapped onto the transaction feed (same mapping as the registry's
    pattern queries) and drained through the full pipeline. The state
    tables this produces are oracle-checked against DuckDB in
    tests/test_streaming_e2e.py::test_streaming_flagship_sf_state_oracle;
    here we report its throughput at sf0.1 scale."""
    from pyspark_data_engineering_assignment_spark.tools.events_feed import (
        run_events_flagship,
    )

    tmp = tempfile.mkdtemp(prefix="stream_sf_bench_")
    try:
        run = run_events_flagship(spark, SF_DIR, tmp, runs=STREAM_RUNS)
        return _stream_facts(run)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_streaming_sf1(spark) -> dict:
    """The SAME flagship drain at sf1 (1M events): ~10x the sf0.1 feed,
    so the ~2.4s fixed per-batch cost amortizes and the figure reflects
    sustained throughput instead of startup noise - SCALING.md's
    34k -> 84k -> 179k rows/s curve, now recorded by the driver every
    round (round-11 verdict task: decouple "streaming regressed" from
    10s-run noise at sf0.1). Uses the scaled events table built by
    tools/scaleup.py under .scratch/sf1.0 (env-overridable); when the
    directory is absent (fresh clone) the section records the reason
    instead of silently vanishing."""
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scratch", "sf1.0"),
    )
    if not os.path.isdir(sf1_dir):
        return {"skipped": f"sf1 dir absent: {sf1_dir}"}
    from pyspark_data_engineering_assignment_spark.tools.events_feed import (
        run_events_flagship,
    )

    tmp = tempfile.mkdtemp(prefix="stream_sf1_bench_")
    try:
        run = run_events_flagship(spark, sf1_dir, tmp, runs=STREAM_RUNS)
        return _stream_facts(run)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_streaming_latency(spark) -> dict:
    """Per-trigger commit-latency percentiles (round-12 verdict task #6):
    the throughput sections above drain their whole backlog in ONE
    availableNow batch, so a stalled trigger would hide inside the
    average. This probe re-drains the same feeds capped at
    maxFilesPerTrigger so the run is genuinely multi-batch - sf0.1 at 1
    file (10k rows)/trigger = the reference feeder's offered cadence,
    sf1 at 10 files (100k rows)/trigger - and reports nearest-rank
    p50/p95/max of durationMs.triggerExecution per non-empty batch
    (streaming/pipeline.py:progress_latency_stats)."""
    import statistics

    from pyspark_data_engineering_assignment_spark.tools.events_feed import (
        run_events_flagship,
    )

    def median_latency(run: dict, mfpt: int) -> dict:
        # element-wise median across the N drains (p50-of-p50s etc.);
        # max_ms keeps the worst trigger of ANY run - the stall signal
        # this section exists to surface must not be median-ed away
        lats = [
            r["latency"]
            for r in run.get("runs", [{"latency": run["latency"]}])
            if r.get("latency") and r["latency"].get("n_batches")
        ]
        if not lats:
            lat = dict(run["latency"])
        else:
            lat = {
                "n_batches": lats[0]["n_batches"],
                "p50_ms": round(statistics.median(l["p50_ms"] for l in lats)),
                "p95_ms": round(statistics.median(l["p95_ms"] for l in lats)),
                "max_ms": max(l["max_ms"] for l in lats),
                "n_runs": len(lats),
                "runs": lats,
            }
        return dict(
            lat,
            rows=run["rows"],
            seconds=run["seconds"],
            max_files_per_trigger=mfpt,
        )

    out: dict[str, dict] = {}
    sf_label = "sf" + SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    tmp = tempfile.mkdtemp(prefix="stream_lat_sf01_")
    try:
        run = run_events_flagship(
            spark, SF_DIR, tmp, max_files_per_trigger=1, runs=STREAM_RUNS
        )
        out[sf_label] = median_latency(run, 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scratch", "sf1.0"),
    )
    if not os.path.isdir(sf1_dir):
        out["sf1"] = {"skipped": f"sf1 dir absent: {sf1_dir}"}
        return out
    tmp = tempfile.mkdtemp(prefix="stream_lat_sf1_")
    try:
        run = run_events_flagship(
            spark, sf1_dir, tmp, max_files_per_trigger=10, runs=STREAM_RUNS
        )
        out["sf1"] = median_latency(run, 10)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _solo_converged_warm(name: str, runs: int = 4) -> float | None:
    """Re-measure one query's warm time in a FRESH interpreter.

    After ~120 heterogeneous plans the shared JVM's JIT profiles are
    polluted enough that the deepest plan's in-session warm time is
    BIMODAL across bench runs (minhash_lsh_neardup: 2.2s vs 3.3-3.6s as
    best-of-3 at the SAME 24g heap — heap size ruled out by direct A/B).
    A fresh interpreter converges to the same figure every time, so for
    queries whose in-session warm exceeds the solo threshold the
    committed warm column comes from here: it is the number a dedicated
    job would pay and the only one stable enough for round-over-round
    diffs. Costs one JVM start + ``runs`` executions per deep query
    (only ~1 query qualifies at sf0.1)."""
    code = (
        "import json, time\n"
        "from pyspark_data_engineering_assignment_spark.session import get_spark\n"
        "from pyspark_data_engineering_assignment_spark.plans import QUERIES\n"
        "spark = get_spark(app_name='bench_solo')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"fn = QUERIES[{name!r}].fn\n"
        "best = None\n"
        f"for _ in range({runs}):\n"
        f"    df = fn(spark, {SF_DIR!r})\n"
        "    t0 = time.perf_counter()\n"
        "    df.write.format('noop').mode('overwrite').save()\n"
        "    dt = time.perf_counter() - t0\n"
        "    best = dt if best is None else min(best, dt)\n"
        "    spark.catalog.clearCache()\n"
        "print('SOLO_WARM', json.dumps(best))\n"
    )
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith("SOLO_WARM"):
                return float(json.loads(line.split(None, 1)[1]))
        # No result line: surface why, loudly — a silent fallback would
        # quietly re-admit the unstable in-session figure.
        print(
            f"SOLO-WARM FAILED for {name}: exit={out.returncode} "
            f"stderr tail: {out.stderr[-500:]!r}",
            file=sys.stderr,
        )
    except Exception as exc:  # timeout, spawn failure
        print(f"SOLO-WARM FAILED for {name}: {exc!r}", file=sys.stderr)
    return None


# In-session warm above this re-measures in a fresh interpreter (see
# _solo_converged_warm); bounded to the slowest few so a pathological
# session can't turn the bench into 123 JVM starts.
SOLO_WARM_THRESHOLD_S = 2.0
SOLO_WARM_MAX_QUERIES = 3


def main() -> None:
    # Generous driver==executor heap: not the fix for the warm-time
    # bimodality (see _solo_converged_warm) but it removes GC headroom
    # as a variable on a 128 GiB host; env override wins on small hosts.
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(app_name="bench")
    # warmup: trigger JVM init + parquet footer reads
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    # warmup 2: spawn the Arrow/Python worker pool (fork + pandas/pyarrow
    # import per worker, ~2.5s for 32) so the alphabetically-first
    # Python-executing query isn't billed the one-time startup cost.
    # Root cause of r04's "5.2x label_standardized_embeddings regression":
    # conversion_lag_stats moved to the JVM as-of path, making
    # label_standardized_embeddings the first Arrow query in bench order
    # (3.1s cold vs 0.59s warm, measured).
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    times_warm: dict[str, float] = {}
    times_build: dict[str, float] = {}
    for name, spec in sorted(QUERIES.items()):
        # Plan construction is timed SEPARATELY (round 7, queries_build):
        # queries with eager stages (duplicate_clusters' label-propagation
        # localCheckpoints, the KMV group-count guard, IVF index build)
        # do real work inside fn(), which the save-only headline timer
        # misses - but folding it into "queries" would also bill every
        # lazy query's py4j plan-building (~0.25s each, +50% on the
        # total) and break cross-round comparability of the headline.
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        times_build[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        # Queries that persist intermediates (minhash verify) document a
        # caller contract: clear their cached blocks after materializing,
        # so a 69-query session neither accumulates storage nor lets a
        # later query silently reuse an earlier query's cache.
        spark.catalog.clearCache()
        # Second, cache-cold but JIT-warm run of the identical plan: the
        # cold/warm gap is one-time whole-stage-codegen compilation, not
        # steady-state cost. Single-run cold numbers moved +-1-3s round
        # to round purely from alphabetical insertion of new queries
        # re-billing who pays the JIT for a shared plan shape; the warm
        # column is the run-to-run-stable throughput figure (what
        # amortized execution at scale actually costs). The headline
        # total stays the cold sum for cross-round comparability.
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        spark.catalog.clearCache()
        # CONVERGED warm for the deep plans (round 8): run 2 can still
        # pay residual JIT on the deepest plan shapes (r7's committed
        # minhash warm read 3.42s vs 2.5-2.8s solo-converged), which
        # poisons round-over-round warm diffs. For queries whose run-2
        # exceeds 1s, warm = BEST of runs 2..4 - the extra runs cost
        # ~2x the slow tail only; fast queries keep the single run-2
        # figure. Methodology noted in COVERAGE.md.
        if warm > 1.0:
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                warm = min(warm, time.perf_counter() - t0)
                spark.catalog.clearCache()
        times_warm[name] = round(warm, 3)

    # Fresh-interpreter convergence for the deepest plans (bounded).
    solo_warm: dict[str, dict[str, float]] = {}
    deep = sorted(
        (n for n, w in times_warm.items() if w > SOLO_WARM_THRESHOLD_S),
        key=lambda n: -times_warm[n],
    )[:SOLO_WARM_MAX_QUERIES]
    for name in deep:
        solo = _solo_converged_warm(name)
        if solo is not None:
            solo_warm[name] = {
                "insession": times_warm[name],
                "solo": round(solo, 3),
            }
            # Commit the SOLO figure, not min(insession, solo): the
            # polluted JVM's lucky mode can dip below solo, and taking
            # the min would re-admit exactly the run-to-run noise the
            # subprocess re-measurement exists to remove.
            times_warm[name] = round(solo, 3)

    total = round(sum(times.values()), 3)
    lineitem_rows = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    streaming = bench_streaming(spark)
    streaming_sf = bench_streaming_sf(spark)
    streaming_sf1 = bench_streaming_sf1(spark)
    streaming_latency = bench_streaming_latency(spark)
    # The driver captures only the last ~2000 chars of stdout and parses the
    # final line as the headline JSON.  r04's single combined line outgrew
    # that window (parsed: null), and r05's stdout detail line outgrew it
    # too (cold per-query dict truncated, killing round-over-round diffs).
    # So: the FULL detail goes to a committed file next to this script;
    # stdout gets the detail (best-effort) plus a short summary final line.
    detail = {
        "queries": times,
        "queries_warm": times_warm,
        "queries_warm_solo": solo_warm,
        "queries_build": times_build,
        "total": total,
        "total_warm": round(sum(times_warm.values()), 3),
        "lineitem_rows": lineitem_rows,
        "sf": float(sf),
        "rows_per_sec_pricing_summary": (
            round(lineitem_rows / times["pricing_summary"]) if times.get("pricing_summary") else None
        ),
        "streaming": streaming,
        "streaming_sf": streaming_sf,
        "streaming_sf1": streaming_sf1,
        "streaming_latency": streaming_latency,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(detail, separators=(",", ":")))
    def compact(obj):
        # The driver parses only the LAST ~2000 stdout chars: the summary
        # keeps the medians/min/max but drops the per-run lists (those
        # live in BENCH_DETAIL.json and the detail stdout line).
        if isinstance(obj, dict):
            return {k: compact(v) for k, v in obj.items() if k != "runs"}
        return obj

    summary = {
        "metric": "registry_queries_total_time",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "n_queries": len(times),
        # Round-15 (verdict task #2, additions-only, no timed action
        # changed): the driver's PERF comparison needs per-query seconds
        # in the PARSED final line - r14 came back per_query={} /
        # n_common=0 / null geomean because only the total was visible.
        # "queries" is the cold lane (the lane the headline total sums),
        # "queries_warm" the JIT-warm lane (solo-converged for the
        # deepest plans). Size note: 123 query names alone are ~2.4 KB,
        # so this line now exceeds the ~2000-char stdout window the
        # r04-era driver exposed (see the comment above); the current
        # driver contract explicitly specifies the queries map inside
        # the one printed JSON line, so the contract wins. The full
        # detail (runs, build lane, solo lane) stays in
        # BENCH_DETAIL.json either way.
        "queries": times,
        "queries_warm": times_warm,
        "streaming_rows_per_sec": streaming["rows_per_sec"],
        "streaming_rows_per_sec_median": streaming.get("rows_per_sec_median"),
        "streaming_rows_per_sec_min": streaming.get("rows_per_sec_min"),
        "streaming_n_runs": streaming.get("n_runs"),
        "streaming_sf": compact(streaming_sf),
        "streaming_sf1": compact(streaming_sf1),
        "streaming_latency": compact(streaming_latency),
    }
    print(json.dumps(summary, separators=(",", ":")))


if __name__ == "__main__":
    sys.exit(main())
