"""Multi-PROCESS state-store concurrency pins (round-12 verdict task #3).

Round 11 pinned the ParquetStateStore's concurrency contracts against
driver THREADS (tests/test_state_concurrency.py). The remaining axis is
separate OS processes - two independent Python/Spark drivers sharing one
store directory, the way two jobs on a cluster share one lakehouse
table:

* merges to DIFFERENT tables from two processes, with the parent
  process polling ``read_state`` and vacuuming throughout - every
  observed snapshot must be a committed batch prefix (the pointer swap
  is ``os.replace``, atomic across processes on POSIX, not just across
  threads)
* SIGKILL of a writer at arbitrary points (including between the data
  write and the pointer swap, and mid-``mkstemp``): the store must
  remain readable, the pointer must equal a committed prefix, a fresh
  process must resume merging from ``last_batch_id + 1``, and vacuum
  must reclaim whatever the crash orphaned without touching live state
* deterministic crash artifacts (stray pointer temp file, orphan
  version dir, vacuum tombstone) - each exact on-disk state a SIGKILL
  can leave, reconstructed byte-for-byte and fed to reader/merge/vacuum

The single-writer-per-table contract is unchanged: no test here runs
two writers against ONE table (that is the documented non-goal, same as
every pointer-swap store without a lock service; Delta needs its
transaction log for that).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pyspark_data_engineering_assignment_spark.state.store import (
    CUSTOMER_MERCHANT_SUMMARY,
    MERCHANT_SUMMARY,
    ParquetStateStore,
)

pytestmark = pytest.mark.slow

NOW = "2024-01-01 00:00:00"
KEYS = ["M0", "M1", "M2", "M3"]

MERCHANT_AGG_SCHEMA = StructType(
    [
        StructField("merchant_id", StringType(), False),
        StructField("total_transactions", LongType(), True),
    ]
)

# Writer subprocess: its OWN SparkSession + ParquetStateStore on the
# shared root. Merges +1 per key per batch (merchant table) or one
# C1/M1 row (customer_merchant table), printing MERGED <b> after each
# committed batch so the parent can synchronize/kill deterministically.
_WRITER = r"""
import sys, time
root, table, n_batches, sleep_s = sys.argv[1], sys.argv[2], int(sys.argv[3]), float(sys.argv[4])
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from pyspark_data_engineering_assignment_spark.state.store import (
    CUSTOMER_MERCHANT_SUMMARY, MERCHANT_SUMMARY, ParquetStateStore)
store = ParquetStateStore(spark, root, n_buckets=4)
if table == "merchant":
    spec = MERCHANT_SUMMARY
    sch = StructType([StructField("merchant_id", StringType(), False),
                      StructField("total_transactions", LongType(), True)])
    rows = [(f"M{k}", 1) for k in range(4)]
    mk = lambda b: spark.createDataFrame(rows, sch)
else:
    spec = CUSTOMER_MERCHANT_SUMMARY
    sch = StructType([StructField("customer_id", StringType(), False),
                      StructField("merchant_id", StringType(), False),
                      StructField("transaction_count", LongType(), True),
                      StructField("total_amount_sum", StringType(), True)])
    mk = lambda b: (spark.createDataFrame([("C1", "M1", 1, "10.00")], sch)
                    .withColumn("total_amount_sum",
                                F.col("total_amount_sum").cast("decimal(18,2)")))
start = store.last_batch_id(spec) + 1
print(f"START {start}", flush=True)
for b in range(start, n_batches):
    store.merge_batch(spec, mk(b), batch_id=b, now="2024-01-01 00:00:00")
    print(f"MERGED {b}", flush=True)
    if sleep_s:
        time.sleep(sleep_s)
print("DONE", flush=True)
"""


def _spawn_writer(root: str, table: str, n_batches: int, sleep_s: float):
    err = open(os.path.join(root, f"writer_{table}.stderr"), "w")
    proc = subprocess.Popen(
        [sys.executable, "-c", _WRITER, root, table, str(n_batches), str(sleep_s)],
        stdout=subprocess.PIPE,
        stderr=err,
        text=True,
        cwd="/root/repo",
    )
    proc._stderr_path = err.name
    return proc


def _stderr_tail(proc) -> str:
    with open(proc._stderr_path) as f:
        return f.read()[-3000:]


def _merchant_totals(store) -> dict[str, int]:
    return {
        r["merchant_id"]: r["total_transactions"]
        for r in store.read_state(MERCHANT_SUMMARY).collect()
    }


def _wait_for_merges(proc, n: int, timeout_s: float = 180.0) -> int:
    """Block until the writer has printed ``n`` MERGED lines; return the
    last batch id seen."""
    deadline = time.monotonic() + timeout_s
    seen = -1
    count = 0
    while count < n:
        assert time.monotonic() < deadline, "writer produced no progress"
        line = proc.stdout.readline()
        assert line, f"writer exited early (rc={proc.poll()})"
        if line.startswith("MERGED"):
            seen = int(line.split()[1])
            count += 1
    return seen


@pytest.mark.slow
def test_two_processes_merge_different_tables_parent_polls_and_vacuums(
    spark, tmp_path
):
    """Two independent Spark drivers merge to different tables of one
    store root while THIS process polls both tables and vacuums with a
    retention window. Cross-process analog of
    test_concurrent_merges_to_different_tables +
    test_polling_reader_sees_only_committed_prefixes: every polled
    merchant snapshot must be all-equal across the 4 keys (each batch
    adds +1 to every key and the pointer swap is atomic, so a torn read
    would show unequal values), and final totals are exact."""
    root = str(tmp_path)
    n_batches = 5
    store = ParquetStateStore(spark, root, n_buckets=4)

    w1 = _spawn_writer(root, "merchant", n_batches, 0.3)
    w2 = _spawn_writer(root, "cm", n_batches, 0.3)
    observed: set[int] = set()
    try:
        while w1.poll() is None or w2.poll() is None:
            totals = _merchant_totals(store)
            if totals:
                vals = set(totals.values())
                assert len(vals) == 1 and set(totals) == set(KEYS), (
                    f"torn snapshot: {totals}"
                )
                observed.add(vals.pop())
            # reader-side vacuum with a retention window is always safe
            store.vacuum(MERCHANT_SUMMARY, retention_seconds=3600.0)
            store.vacuum(CUSTOMER_MERCHANT_SUMMARY, retention_seconds=3600.0)
        w1.wait(timeout=60)
        w2.wait(timeout=60)
    finally:
        for w in (w1, w2):
            if w.poll() is None:
                w.kill()
    assert w1.returncode == 0 and w2.returncode == 0, (
        f"merchant rc={w1.returncode}:\n{_stderr_tail(w1)}\n"
        f"cm rc={w2.returncode}:\n{_stderr_tail(w2)}"
    )
    assert observed <= set(range(n_batches + 1)), observed

    assert _merchant_totals(store) == {k: n_batches for k in KEYS}
    cm = {
        (r["customer_id"], r["merchant_id"]): (
            r["transaction_count"],
            str(r["total_amount_sum"]),
        )
        for r in store.read_state(CUSTOMER_MERCHANT_SUMMARY).collect()
    }
    assert cm == {("C1", "M1"): (n_batches, f"{n_batches * 10}.00")}
    # now-unreferenced snapshots reclaim cleanly after the writers exit
    store.vacuum(MERCHANT_SUMMARY)
    store.vacuum(CUSTOMER_MERCHANT_SUMMARY)
    assert _merchant_totals(store) == {k: n_batches for k in KEYS}


@pytest.mark.slow
@pytest.mark.parametrize("extra_delay_s", [0.0, 0.12])
def test_sigkill_writer_leaves_committed_prefix_and_resumable_store(
    spark, tmp_path, extra_delay_s
):
    """SIGKILL a writer process mid-stream (two delays: immediately
    after a commit line, and mid-way through the next merge - the
    latter lands inside the data-write/pointer-swap window on most
    runs). Invariants: the pointer parses, totals equal EXACTLY
    last_batch_id + 1 (the committed prefix - never the half-merged
    batch), a fresh store handle resumes from last_batch_id + 1 to the
    target, and vacuum reclaims the crash's orphaned snapshot dirs
    without disturbing live state."""
    root = str(tmp_path)
    target = 6
    w = _spawn_writer(root, "merchant", 50, 0.0)
    try:
        _wait_for_merges(w, 2)
        if extra_delay_s:
            time.sleep(extra_delay_s)
        os.kill(w.pid, signal.SIGKILL)
        w.wait(timeout=60)
    finally:
        if w.poll() is None:
            w.kill()

    # pointer must be a committed prefix - json.load of a torn pointer
    # would throw (os.replace is atomic, mkstemp leftovers are ignored)
    with open(os.path.join(root, MERCHANT_SUMMARY.name, "_LATEST.json")) as f:
        pointer = json.load(f)
    committed = pointer["last_batch_id"] + 1
    assert committed >= 2

    store = ParquetStateStore(spark, root, n_buckets=4)
    assert store.last_batch_id(MERCHANT_SUMMARY) == committed - 1
    assert _merchant_totals(store) == {k: committed for k in KEYS}

    # fresh-process resume: merge the remaining batches idempotently
    for b in range(committed, target):
        batch = spark.createDataFrame([(k, 1) for k in KEYS], MERCHANT_AGG_SCHEMA)
        store.merge_batch(MERCHANT_SUMMARY, batch, batch_id=b, now=NOW)
    # replay of an already-committed batch stays a no-op after the crash
    store.merge_batch(
        MERCHANT_SUMMARY,
        spark.createDataFrame([(k, 1) for k in KEYS], MERCHANT_AGG_SCHEMA),
        batch_id=0,
        now=NOW,
    )
    assert _merchant_totals(store) == {k: target for k in KEYS}

    # vacuum reclaims the orphans (possibly 0 if the kill landed clean)
    removed = store.vacuum(MERCHANT_SUMMARY)
    assert removed >= 0
    assert _merchant_totals(store) == {k: target for k in KEYS}


def test_crash_artifacts_are_tolerated_and_reclaimed(spark, tmp_path):
    """The three exact on-disk states a SIGKILL can leave, reconstructed
    deterministically (no timing dependence):

    (a) stray pointer TEMP file (killed between ``mkstemp`` and
        ``os.replace``) - readers and writers ignore it
    (b) orphan snapshot version dir (killed between the parquet write
        and the pointer swap) - invisible to readers, reclaimed by
        vacuum, counted exactly once
    (c) vacuum TOMBSTONE dir (killed between the claim rename and the
        rmtree) - never in the live set, reclaimed by any later vacuum,
        after which the emptied version dir is swept too
    """
    root = str(tmp_path)
    store = ParquetStateStore(spark, root, n_buckets=4)
    for b in range(2):
        batch = spark.createDataFrame([(k, 1) for k in KEYS], MERCHANT_AGG_SCHEMA)
        store.merge_batch(MERCHANT_SUMMARY, batch, batch_id=b, now=NOW)
    store.vacuum(MERCHANT_SUMMARY)  # start clean
    tdir = os.path.join(root, MERCHANT_SUMMARY.name)

    # (a) stray mkstemp leftover beside the pointer
    stray = os.path.join(tdir, "tmpdeadbeef")
    with open(stray, "w") as f:
        f.write('{"versions": "TORN')  # even torn JSON must be ignored
    assert _merchant_totals(store) == {k: 2 for k in KEYS}
    store.merge_batch(
        MERCHANT_SUMMARY,
        spark.createDataFrame([(k, 1) for k in KEYS], MERCHANT_AGG_SCHEMA),
        batch_id=2,
        now=NOW,
    )
    assert _merchant_totals(store) == {k: 3 for k in KEYS}
    assert os.path.exists(stray)  # not vacuum's to delete (outside v=*)
    store.vacuum(MERCHANT_SUMMARY)  # clear batch 2's superseded snapshots

    # (b) orphan version dir, as a crashed merge leaves it: buckets
    # written, pointer never swapped
    orphan = os.path.join(tdir, "v=999", "_bucket=0")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000.parquet"), "wb") as f:
        f.write(b"not really parquet")
    os.utime(orphan, (0, 0))  # old enough to clear any retention cutoff
    assert _merchant_totals(store) == {k: 3 for k in KEYS}  # invisible
    assert store.vacuum(MERCHANT_SUMMARY) == 1
    assert not os.path.exists(os.path.join(tdir, "v=999"))
    assert _merchant_totals(store) == {k: 3 for k in KEYS}

    # (c) tombstone orphaned by a crash mid-delete
    tomb = os.path.join(tdir, "v=998", "_bucket=1.vacuum.12345.67890")
    os.makedirs(tomb)
    os.utime(tomb, (0, 0))
    assert store.vacuum(MERCHANT_SUMMARY) == 1
    assert not os.path.exists(os.path.join(tdir, "v=998"))
    assert _merchant_totals(store) == {k: 3 for k in KEYS}


def test_corrupted_bucket_file_fails_reads_loudly(spark, tmp_path):
    """Bit-rot / torn-write pin (round-12): a truncated parquet file
    inside a LIVE bucket snapshot must make read_state raise - never
    silently return partial state (silent state loss is the worst
    failure a cumulative store can have; Spark's default
    ignoreCorruptFiles=false is load-bearing and this pins it)."""
    store = ParquetStateStore(spark, str(tmp_path), n_buckets=4)
    for bid in range(2):
        store.merge_batch(
            MERCHANT_SUMMARY,
            spark.createDataFrame([(k, 1) for k in KEYS], MERCHANT_AGG_SCHEMA),
            batch_id=bid,
            now=NOW,
        )
    assert _merchant_totals(store) == {k: 2 for k in KEYS}

    import glob

    ptr = json.load(
        open(os.path.join(str(tmp_path), MERCHANT_SUMMARY.name, "_LATEST.json"))
    )
    b, v = next(iter(ptr["versions"].items()))
    live = glob.glob(
        os.path.join(
            str(tmp_path), MERCHANT_SUMMARY.name, f"v={v}", f"_bucket={b}",
            "*.parquet",
        )
    )
    assert live
    data = open(live[0], "rb").read()
    with open(live[0], "wb") as f:
        f.write(data[: max(8, len(data) // 2)])  # torn mid-file

    with pytest.raises(Exception, match="(?i)parquet|corrupt|magic|EOF"):
        store.read_state(MERCHANT_SUMMARY).collect()


def _live_bucket_file(tmp_path) -> str:
    import glob

    ptr = json.load(
        open(os.path.join(str(tmp_path), MERCHANT_SUMMARY.name, "_LATEST.json"))
    )
    b, v = next(iter(ptr["versions"].items()))
    live = glob.glob(
        os.path.join(
            str(tmp_path), MERCHANT_SUMMARY.name, f"v={v}", f"_bucket={b}",
            "*.parquet",
        )
    )
    assert live
    return live[0]


def test_corrupted_parquet_footer_variants_fail_loudly(spark, tmp_path):
    """Round-13 axis: footer-targeted corruption, extending round-12's
    torn-mid-file pin (which removes the footer entirely). Three exact
    shapes a failing disk / torn object-store PUT leaves, each with the
    file LENGTH and trailing structure plausible enough to fool a naive
    reader:

    (a) footer THRIFT METADATA corrupted, trailing length+magic intact;
    (b) trailing magic truncated (file ends mid-footer-length);
    (c) bit-rot inside a DATA PAGE, footer fully intact (the sneakiest:
        metadata validates, only decompression/decoding can notice).

    All three must make read_state raise - never return partial or
    garbage state. (c) is caught by snappy framing today; a single
    flipped byte that happens to keep the stream valid-snappy is NOT
    guaranteed caught without parquet.page.verify-checksum.enabled -
    documented in SCALING.md, round-13.)"""
    store = ParquetStateStore(spark, str(tmp_path), n_buckets=4)
    for bid in range(2):
        store.merge_batch(
            MERCHANT_SUMMARY,
            spark.createDataFrame([(k, 1) for k in KEYS], MERCHANT_AGG_SCHEMA),
            batch_id=bid,
            now=NOW,
        )
    assert _merchant_totals(store) == {k: 2 for k in KEYS}
    f = _live_bucket_file(tmp_path)
    orig = open(f, "rb").read()
    flen = int.from_bytes(orig[-8:-4], "little")
    assert 0 < flen < len(orig)

    # (a) footer metadata flipped, length+magic intact
    data = bytearray(orig)
    for i in range(len(data) - 8 - flen, len(data) - 8, 7):
        data[i] ^= 0xFF
    open(f, "wb").write(bytes(data))
    with pytest.raises(Exception, match="(?i)parquet|corrupt|footer|thrift|magic"):
        store.read_state(MERCHANT_SUMMARY).collect()

    # (b) trailing magic gone
    open(f, "wb").write(orig[:-4])
    with pytest.raises(Exception, match="(?i)parquet|corrupt|footer|magic|expected"):
        store.read_state(MERCHANT_SUMMARY).collect()

    # (c) data-page bit-rot, footer intact
    data = bytearray(orig)
    mid = (len(orig) - 8 - flen) // 2
    for i in range(mid, min(mid + 64, len(orig) - 8 - flen)):
        data[i] ^= 0xFF
    open(f, "wb").write(bytes(data))
    with pytest.raises(Exception):
        store.read_state(MERCHANT_SUMMARY).collect()

    # restore: the same handle reads correct totals again (corruption
    # was in the file, not the pointer protocol)
    open(f, "wb").write(orig)
    assert _merchant_totals(store) == {k: 2 for k in KEYS}


def test_page_crc_verification_catches_valid_stream_bitrot(spark, tmp_path):
    """Round-13 finding #71: a flipped byte that keeps the page a VALID
    stream (PLAIN int64 value byte) decodes with zero errors - the
    baseline read returns state that is silently WRONG BY ONE. parquet
    writers emit page CRCs by default but readers skip verification
    (PARQUET-1580), so read_state now opts in. This test constructs the
    exact silent-wrong file (pyarrow rewrite of a live bucket:
    uncompressed, PLAIN, checksummed; one count's low byte flipped
    2 -> 3) and pins that:

      * a default parquet read returns the wrong total silently (the
        hazard is real, not hypothetical);
      * the store's CRC-verifying read_state raises instead.
    """
    import struct

    import pyarrow.parquet as pq_

    store = ParquetStateStore(spark, str(tmp_path), n_buckets=4)
    for bid in range(2):
        store.merge_batch(
            MERCHANT_SUMMARY,
            spark.createDataFrame([(k, 1) for k in KEYS], MERCHANT_AGG_SCHEMA),
            batch_id=bid,
            now=NOW,
        )
    assert _merchant_totals(store) == {k: 2 for k in KEYS}
    f = _live_bucket_file(tmp_path)

    # rewrite the live bucket uncompressed/PLAIN with page checksums
    table = pq_.read_table(f)
    pq_.write_table(
        table, f, compression="none", use_dictionary=False,
        write_page_checksum=True, coerce_timestamps="us",
    )
    # drop Hadoop's LOCAL-FS whole-file .crc sidecar: it exists only on
    # file:// (ChecksumFileSystem) and would mask the parquet-level
    # behavior under test - object stores (the production substrate)
    # have no sidecar, so parquet page CRCs are the only line of defense
    sidecar = os.path.join(os.path.dirname(f), "." + os.path.basename(f) + ".crc")
    if os.path.exists(sidecar):
        os.remove(sidecar)
    data = bytearray(open(f, "rb").read())
    meta = pq_.ParquetFile(f).metadata.row_group(0)
    col_idx = [
        i for i in range(meta.num_columns)
        if meta.column(i).path_in_schema == "total_transactions"
    ][0]
    col = meta.column(col_idx)
    start = col.data_page_offset
    end = start + col.total_compressed_size
    # rfind: the page HEADER also encodes min/max statistics (= 2),
    # which precede the data; the actual value bytes sit at the page's
    # end, so the LAST pattern occurrence is the value itself
    idx = data.rfind(struct.pack("<q", 2), start, end)
    assert idx != -1
    data[idx] ^= 0x01  # 2 -> 3, page still a perfectly valid stream
    open(f, "wb").write(bytes(data))

    # default read: silently wrong by one (sum 8 -> 9), zero errors
    naive = {
        r["merchant_id"]: r["total_transactions"]
        for r in spark.read.schema(MERCHANT_SUMMARY.schema).parquet(
            os.path.dirname(f)
        ).collect()
    }
    # exactly one count read back wrong by one, silently
    # (the bucket may hold any subset of KEYS; compare per-key)
    bumped = [k for k, v in naive.items() if v == 3]
    assert len(bumped) == 1 and all(
        v in (2, 3) for v in naive.values()
    ), naive

    # the store's verifying read refuses
    with pytest.raises(Exception, match="(?i)crc|checksum|corrupt|parquet"):
        store.read_state(MERCHANT_SUMMARY).collect()


@pytest.mark.slow
def test_two_writers_same_table_serialize_exactly_once(spark, tmp_path):
    """Round-13 verdict task #4: two concurrent writers on ONE table.

    Two independent Spark drivers race the SAME batch-id sequence into
    the merchant table - the realistic shape is a failover double-run
    (a zombie replica still replaying the ids the new primary writes).
    Pre-fix this was a silent-loss / double-apply race: both writers
    read the same pointer, both wrote v=next_version, the second
    pointer swap clobbered the first writer's versions map, and the
    replay check was TOCTOU. The per-table ``_table_write_lock``
    (flock: crash-released, cross-process, cross-fd) serializes the
    whole merge, and the in-lock replay check makes every batch id
    EXACTLY-ONCE across both writers: final totals are exact, with
    both processes exiting clean."""
    root = str(tmp_path)
    n = 8
    w1 = _spawn_writer(root, "merchant", n, 0.0)
    w2 = _spawn_writer(root, "merchant", n, 0.0)
    for w in (w1, w2):
        out, _ = w.communicate(timeout=300)
        assert w.returncode == 0, _stderr_tail(w)
        assert out.strip().endswith("DONE"), out[-300:]
    store = ParquetStateStore(spark, root, n_buckets=4)
    assert _merchant_totals(store) == {f"M{k}": n for k in range(4)}
    assert store.last_batch_id(MERCHANT_SUMMARY) == n - 1
