"""Round-14 hazard axis: parquet row-group/page statistics vs predicate
pushdown on degenerate values.

The extreme-doubles axis (round 12) planted NaN/Inf/-0.0 in the DATA
and pinned value semantics; this axis probes the STATISTICS layer those
values poison. Predicate pushdown prunes row groups (and, with column
indexes, pages) from min/max stats - and IEEE floats break min/max:
NaN compares false to everything (a naive writer records garbage stats
or none), -0.0 == 0.0 but has a different sign bit (PARQUET-1222: a
writer recording max=-0.0 would wrongly prune ``>= 0.0`` readers that
interpret it as < +0.0), and string stats are TRUNCATED (a 64-byte cap
means the recorded max is a prefix - pruning must treat it as a bound,
not a value). A pruning bug is the worst failure class: silently
missing rows, only on files whose layout happens to isolate the
degenerate values in their own row group.

Pinned contract, for every degenerate layout: scan-with-pushdown ==
scan-without-pushdown == DuckDB on the same file, row-for-row. Each
parquet is written with tiny row groups so the degenerate values sit in
PRUNABLE groups (verified via pyarrow metadata) - a layout where a
wrong prune is guaranteed visible.

First-run findings:

* **Finding 76 (REAL, pinned below): Spark loses -0.0 rows to its own
  pushdown.** A row group holding only -0.0 gets stats min=max=-0.0
  (Spark's own parquet writer emits exactly that - verified), the
  engine's comparison says ``-0.0 >= 0.0`` is TRUE (pushdown-disabled
  scan and DuckDB both return the rows), but the pushdown stats check
  uses total-order compare (-0.0 < +0.0) and PRUNES the group - the
  rows silently vanish. Spark round-trips its own data wrongly. The
  parquet spec's guidance (write min=-0.0/max=+0.0 defensively,
  PARQUET-1222) is not applied by the writer. Pinned as the BUGGY
  behavior on purpose: a Spark upgrade that fixes either side trips
  the pin and we re-adjudicate. Engine exposure audit: zero registry
  queries push a 0.0-boundary double predicate to a scan (the
  0.0-boundary comparisons all sit on computed columns, which cannot
  be pushed), and state-store columns are decimal/long - but any USER
  filter like ``value >= 0.0`` over a parquet lake containing -0.0 is
  exposed. Mitigation for pipelines: normalize ``-0.0`` at write time
  (``F.when(col == 0, F.lit(0.0))``) or filter with ``> -1e-300``.
* NaN: NOT the IEEE hazard - both engines use SQL NaN-largest
  semantics (NaN > 100 is TRUE) and pushdown agrees, because writers
  omit NaN from min/max so NaN-bearing groups are never pruned.
* Truncated string stats and ±Inf endpoints prune exactly; all-NULL
  groups prune correctly from null_count.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.axis


def _write(tmp_path, name, ids, vals, typ=pa.float64(), row_group_size=4):
    t = pa.table({"id": pa.array(ids, pa.int64()), "v": pa.array(vals, typ)})
    p = str(tmp_path / name)
    pq.write_table(t, p, row_group_size=row_group_size)
    return p


def _three_way(spark, path, cond_spark, cond_sql):
    """ids surviving: pushdown scan, pushdown-disabled scan, DuckDB."""
    pushed = {
        r["id"] for r in spark.read.parquet(path).filter(cond_spark).collect()
    }
    spark.conf.set("spark.sql.parquet.filterPushdown", "false")
    try:
        unpushed = {
            r["id"]
            for r in spark.read.parquet(path).filter(cond_spark).collect()
        }
    finally:
        spark.conf.set("spark.sql.parquet.filterPushdown", "true")
    duck = {
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT id FROM read_parquet('{path}') WHERE {cond_sql}")
        .fetchall()
    }
    return pushed, unpushed, duck


def test_nan_isolated_row_group_never_leaks_or_hides_rows(spark, tmp_path):
    # group 0: all-NaN; group 1: small values; group 2: large values -
    # a writer recording NaN-poisoned min/max for group 0 would either
    # wrongly keep it for v > 100 (leak) or wrongly drop a mixed group
    ids = list(range(12))
    vals = [float("nan")] * 4 + [1.0, 2.0, 3.0, 4.0] + [100.0, 200.0, 300.0, 400.0]
    p = _write(tmp_path, "nan_groups.parquet", ids, vals)
    md = pq.ParquetFile(p).metadata
    assert md.num_row_groups == 3  # layout really isolates the NaNs
    for cond_s, cond_d, want in [
        # SQL semantics, NOT IEEE: both engines treat NaN as LARGER
        # than every value (greater than +Inf), so NaN rows satisfy
        # v > 100 - and pushdown agrees because writers omit NaN from
        # min/max, so the NaN group is never pruned. (First draft of
        # this test assumed IEEE "NaN satisfies nothing" and failed on
        # all three paths EQUALLY - the engines are consistent.)
        (F.col("v") > 100.0, "v > 100", {0, 1, 2, 3, 9, 10, 11}),
        (F.col("v") <= 4.0, "v <= 4", {4, 5, 6, 7}),  # NaN not <= anything
        (F.isnan("v"), "isnan(v)", {0, 1, 2, 3}),
    ]:
        pushed, unpushed, duck = _three_way(spark, p, cond_s, cond_d)
        assert pushed == unpushed == duck == want, (cond_d, pushed, unpushed, duck)


def test_negative_zero_pushdown_loses_rows_finding_76(spark, tmp_path):
    """FINDING 76 - pinned as the buggy behavior so a Spark fix trips
    this test and forces re-adjudication. -0.0 isolated in its own
    row group (stats min=max=-0.0): the ENGINE says -0.0 >= 0.0 is
    true (pushdown-off scan and DuckDB both keep the rows), but the
    stats pruning compares in total order (-0.0 < +0.0) and silently
    drops the whole group. Verified to reproduce with Spark's OWN
    writer too (it emits min=max=-0.0, no PARQUET-1222 sanitation),
    so Spark round-trips its own -0.0 data wrongly on a >= 0.0
    filter."""
    ids = list(range(12))
    vals = [-0.0] * 4 + [0.0] * 4 + [1.0] * 4
    p = _write(tmp_path, "negzero.parquet", ids, vals)

    # the hazard: pushdown DISAGREES with the engine's own semantics
    pushed, unpushed, duck = _three_way(
        spark, p, F.col("v") >= 0.0, "v >= 0"
    )
    assert unpushed == duck == set(range(12))  # -0.0 qualifies: >= is true
    assert pushed == set(range(4, 12))  # THE BUG: -0.0 group pruned away

    # neighboring predicates are consistent (the bug is the >= 0.0
    # boundary against a -0.0-only group, not zero handling generally)
    for cond_s, cond_d, want in [
        (F.col("v") <= 0.0, "v <= 0", set(range(8))),
        (F.col("v") < 0.0, "v < 0", set()),  # NO zero is negative, even -0.0
    ]:
        pushed, unpushed, duck = _three_way(spark, p, cond_s, cond_d)
        assert pushed == unpushed == duck == want, (cond_d, pushed, unpushed, duck)

    # the documented mitigation really works: normalize -0.0 at write
    norm = (
        spark.read.parquet(p)
        .withColumn("v", F.when(F.col("v") == 0.0, F.lit(0.0)).otherwise(F.col("v")))
    )
    p2 = str(tmp_path / "negzero_normalized")
    norm.write.mode("overwrite").parquet(p2)
    kept = {
        r["id"]
        for r in spark.read.parquet(p2).filter(F.col("v") >= 0.0).collect()
    }
    assert kept == set(range(12))


def test_truncated_string_stats_never_over_prune(spark, tmp_path):
    # 100-char strings differing only after the 64-byte stats
    # truncation point: the recorded max for group 0 is a PREFIX bound.
    # A reader treating the truncated max as an exact value would prune
    # the group for predicates its real rows satisfy.
    base = "k" * 80
    ids = list(range(8))
    vals = [base + "aaaa", base + "aaab", base + "aaac", base + "aaad",
            base + "zzzz", base + "zzzy", base + "zzzx", base + "zzzw"]
    p = _write(tmp_path, "longstr.parquet", ids, vals, typ=pa.string())
    probe = base + "aaac"
    for cond_s, cond_d, want in [
        (F.col("v") > probe, f"v > '{probe}'", {3, 4, 5, 6, 7}),
        (F.col("v") == base + "aaab", f"v = '{base}aaab'", {1}),
        (F.col("v") >= base + "zzzw", f"v >= '{base}zzzw'", {4, 5, 6, 7}),
    ]:
        pushed, unpushed, duck = _three_way(spark, p, cond_s, cond_d)
        assert pushed == unpushed == duck == want, (cond_d, pushed, unpushed, duck)


def test_infinity_stat_endpoints_prune_exactly(spark, tmp_path):
    # +-Inf as genuine row-group min/max endpoints: finite-range
    # predicates must still keep/drop exactly the right groups.
    ids = list(range(12))
    vals = [float("-inf")] * 4 + [5.0] * 4 + [float("inf")] * 4
    p = _write(tmp_path, "inf.parquet", ids, vals)
    for cond_s, cond_d, want in [
        (F.col("v") > 5.0, "v > 5", {8, 9, 10, 11}),
        (F.col("v") < 5.0, "v < 5", {0, 1, 2, 3}),
        (F.col("v").between(0.0, 10.0), "v BETWEEN 0 AND 10", {4, 5, 6, 7}),
    ]:
        pushed, unpushed, duck = _three_way(spark, p, cond_s, cond_d)
        assert pushed == unpushed == duck == want, (cond_d, pushed, unpushed, duck)


def test_all_null_group_and_null_count_stats(spark, tmp_path):
    # an all-NULL row group is prunable purely from null_count stats;
    # IS NOT NULL / IS NULL and value predicates must all agree.
    ids = list(range(8))
    vals = [None] * 4 + [7.0] * 4
    p = _write(tmp_path, "nulls.parquet", ids, vals)
    for cond_s, cond_d, want in [
        (F.col("v").isNull(), "v IS NULL", {0, 1, 2, 3}),
        (F.col("v").isNotNull(), "v IS NOT NULL", {4, 5, 6, 7}),
        (F.col("v") == 7.0, "v = 7", {4, 5, 6, 7}),  # NULL group pruned
    ]:
        pushed, unpushed, duck = _three_way(spark, p, cond_s, cond_d)
        assert pushed == unpushed == duck == want, (cond_d, pushed, unpushed, duck)
