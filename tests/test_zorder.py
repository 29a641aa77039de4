"""Z-order clustering: key correctness vs a pure-Python Morton
reference, and the layout property the key exists for - row groups
stay tight on BOTH dimensions, so min/max pruning works for filters
on either column."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.functions.zorder import (
    write_zordered,
    zorder_key,
)
from pyspark_data_engineering_assignment_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _morton_ref(a: int, b: int) -> int:
    out = 0
    for i in range(31):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_reference(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (3, 5), (12345, 67890),
             ((1 << 31) - 1, (1 << 31) - 1), (2**40, 7)]  # >31 bits masked
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == _morton_ref(a & ((1 << 31) - 1), b & ((1 << 31) - 1))


def _rowgroup_ranges(path: str, col: str) -> list[int]:
    import glob

    import pyarrow.parquet as pq

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    ranges.append(int(c.statistics.max) - int(c.statistics.min))
    return ranges


def test_zordered_layout_tightens_both_dimensions(spark, tmp_path):
    """vs a single-column sort: sorting by user_id alone leaves cents
    scattered (each row group spans ~the full cents range); the Morton
    layout must cut the summed cents range across row groups while
    keeping user_id ranges bounded - the measurable form of 'filters on
    EITHER column can prune'."""
    e = load_table(spark, SF, "events").select(
        "user_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
    (
        e.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(plain)
    )
    write_zordered(e, zord, ("user_id", "cents"), num_files=16)

    plain_cents = sum(_rowgroup_ranges(plain, "cents"))
    z_cents = sum(_rowgroup_ranges(zord, "cents"))
    assert z_cents < 0.8 * plain_cents, (z_cents, plain_cents)
    # and the z-layout must not degenerate to a cents-only sort either:
    # user_id row-group ranges stay bounded below the full-span-everywhere
    # worst case
    uid_span = e.agg(F.max("user_id") - F.min("user_id")).collect()[0][0]
    z_uid = _rowgroup_ranges(zord, "user_id")
    assert sum(z_uid) < 0.8 * uid_span * len(z_uid), (sum(z_uid), uid_span, len(z_uid))
