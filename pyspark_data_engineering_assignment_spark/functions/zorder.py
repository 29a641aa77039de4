"""Z-order (Morton) keys for multi-column data clustering.

Why: parquet/ORC data skipping prunes row groups by per-column min/max
stats, but a layout sorted on column A scatters column B - filters on B
skip nothing. Interleaving the bits of both columns and sorting on THAT
key keeps row groups tight on BOTH dimensions simultaneously (each row
group covers a small hyper-rectangle of the key space) - the layout
trick behind Delta/Iceberg Z-ORDER clustering, here as a plain column
expression plus a writer discipline.

The interleave is the classic "spread bits" shift-mask ladder - pure
integer expressions (whole-stage codegen, zero Python), identical in any
engine with 64-bit integer ops, so z-key queries are value-hash
oracle-checkable like every other integer expression in this repo.

Scale: computing the key is per-row map work; the clustering cost is the
sort itself (`repartitionByRange` + `sortWithinPartitions` on the key -
one range-partitioned shuffle, the same price as any global layout
rewrite, paid once at write time and amortized over every pruned scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shift/mask ladder spreading the low 31 bits of x to even bit positions
_SPREAD_STEPS: list[tuple[int, int]] = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def spread_bits(col: Column) -> Column:
    """Spread the low 31 bits of a non-negative long to the even bit
    positions (bit i -> bit 2i): the Morton-interleave half-step."""
    x = col.cast("long").bitwiseAND(F.lit((1 << 31) - 1))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """62-bit Morton key interleaving two non-negative integer columns
    (a in even bits, b in odd bits). Monotone in each input when the
    other is fixed; nearby (a, b) pairs get nearby keys, which is the
    clustering property row-group pruning feeds on. Negative or >31-bit
    inputs are masked to their low 31 bits - pre-scale real-valued
    columns into that domain (e.g. fixed-point cents bucketed)."""
    return spread_bits(a).bitwiseOR(F.shiftleft(spread_bits(b), 1))


def scale_to_bits(col: Column, lo: int, hi: int, bits: int = 16) -> Column:
    """Linearly rescale an integer column from [lo, hi] to [0, 2^bits-1].

    Morton interleaving only clusters well when both inputs occupy
    comparable bit widths - interleave a 4-bit id with a 16-bit amount
    raw and the key ordering is dominated by the wide column's high
    bits (a de-facto single-column sort). Production Z-ORDER
    implementations normalize to ranks or range-ids first; min/max
    linear scaling is the cheap variant that needs only a 1-row bounds
    aggregate."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    return F.floor(
        (col.cast("long") - F.lit(lo)) * F.lit(top) / F.lit(hi - lo)
    ).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: tuple[str, str],
    num_files: int = 8,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the Morton key of ``zcols``: both
    columns are min/max-scaled to 16 bits (see ``scale_to_bits`` - raw
    asymmetric domains degrade Morton to a single-column sort), then one
    range-partitioned shuffle on the interleaved key, sorted within
    partitions, so every row group covers a tight hyper-rectangle in
    (a, b) space and min/max stats prune scans filtered on EITHER
    column. The bounds aggregate is one driver-side row - metadata, not
    data."""
    a, b = zcols
    bounds = df.agg(
        F.min(a).alias("alo"),
        F.max(a).alias("ahi"),
        F.min(b).alias("blo"),
        F.max(b).alias("bhi"),
    ).collect()[0]
    # An empty frame (or an all-NULL z-column) has no bounds: min/max
    # return NULL and int(None) crashed the write. A column with no
    # bounds cannot cluster anything - degrade that axis to the
    # scale_to_bits lo==hi constant (key contribution 0) and still write
    # the rows: an empty date partition is routine, not an error.
    alo, ahi = bounds["alo"], bounds["ahi"]
    blo, bhi = bounds["blo"], bounds["bhi"]
    alo, ahi = (0, 0) if alo is None or ahi is None else (int(alo), int(ahi))
    blo, bhi = (0, 0) if blo is None or bhi is None else (int(blo), int(bhi))
    keyed = df.withColumn(
        "_zkey",
        zorder_key(
            scale_to_bits(F.col(a), alo, ahi),
            scale_to_bits(F.col(b), blo, bhi),
        ),
    )
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .parquet(path)
    )
