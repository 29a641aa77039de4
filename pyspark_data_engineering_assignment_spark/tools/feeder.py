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


def _default_name(part: int) -> str:
    # transactions_chunk_{ts}_{uuid8}_part{n}.csv  (mechanism_x.py:80-82)
    ts = time.strftime("%Y%m%d%H%M%S")
    return f"transactions_chunk_{ts}_{uuid.uuid4().hex[:8]}_part{part}.csv"


def iter_chunks(src_csv: str, chunk_rows: int = DEFAULT_CHUNK_ROWS) -> Iterator[pd.DataFrame]:
    """S1: chunked CSV scan (``pd.read_csv(chunksize=...)``,
    ``mechanism_x.py:71``). Header preserved per chunk by ``to_csv`` below."""
    yield from pd.read_csv(src_csv, chunksize=chunk_rows, dtype=str)


def feed_chunks(
    src_csv: str,
    out_dir: str,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    interval_s: float = 0.0,
    name_fn=None,
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
    written: list[str] = []
    base_mtime = time.time()
    for part, chunk in enumerate(iter_chunks(src_csv, chunk_rows)):
        final_path = os.path.join(out_dir, name_fn(part))
        fd, tmp = tempfile.mkstemp(dir=staging, suffix=".tmp")
        os.close(fd)
        chunk.to_csv(tmp, index=False, header=True)  # header per chunk (mechanism_x.py:89)
        # strictly increasing mtimes: the stream source sorts backlog by mtime
        mtime = base_mtime + part
        os.utime(tmp, (mtime, mtime))
        os.replace(tmp, final_path)  # atomic: watcher never sees partial file
        written.append(final_path)
        if interval_s:
            time.sleep(interval_s)
    return written
