"""Engine configuration.

Every magic constant the reference hard-codes becomes a parameter here
(pattern thresholds ``Mechanism Y.py:224-227``, chunk sizing
``mechanism_x.py:17-18``, detection file granularity ``Mechanism Y.py:116``,
trigger cadence ``Mechanism Y.py:309``). The reference README notes the
shipped values are "TEST Thresholds" with production values much larger
(``README.md:220``) - hence config, not constants.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PatternThresholds:
    """Thresholds for the three detection patterns (reference test values)."""

    # PatId1 "UPGRADE" (``Mechanism Y.py:225``)
    merchant_total_txns: int = 5
    customer_merchant_txns: int = 2
    # PatId1 fallback when percentile table is unavailable (``Mechanism Y.py:236-237``)
    fallback_weight: float = 2.0
    # weight percentile defining "low importance" (``Mechanism Y.py:86``)
    weight_percentile: float = 0.01
    # PatId2 "CHILD" (``Mechanism Y.py:226``)
    child_min_txns: int = 3
    child_max_avg_amount: float = 23.0
    # PatId3 "DEI-NEEDED" (``Mechanism Y.py:227``)
    dei_min_female: int = 2


@dataclass(frozen=True)
class EngineConfig:
    thresholds: PatternThresholds = field(default_factory=PatternThresholds)
    # feeder (Mechanism X parity: ``mechanism_x.py:17-18``)
    feeder_chunk_rows: int = 10_000
    feeder_interval_s: float = 1.0
    # detection sink granularity (``Mechanism Y.py:116``)
    detection_file_rows: int = 50
    # streaming (``Mechanism Y.py:104``, ``:309``)
    max_files_per_trigger: int = 1
    trigger: str | None = None  # None => availableNow in tests
    # T6: post-processing disposition of consumed source files. The
    # reference attempted and disabled this (``Mechanism Y.py:106-107``);
    # here it is a working knob: None/"off" (default), "archive" (move
    # committed files to ``source_archive_dir``), or "delete". Archival
    # is asynchronous - Spark moves a file when the batch that read it
    # is committed, i.e. as a later batch starts.
    clean_source: str | None = None
    source_archive_dir: str | None = None
    # RFC-4180 embedded newlines in quoted CSV fields. False (default)
    # keeps the fast line-split streaming parse; the feeder then
    # REFUSES newline-bearing cells at produce time (loud, not silent
    # shredding). True opts the stream into Spark's multiLine parse -
    # measured 5.8x slower on the sf1 flagship drain (readers.py).
    csv_multi_line: bool = False
    # Quarantine channel (round 11). None (default): schema-failing
    # rows under a correct header PERMISSIVE-null through, the
    # pre-round-11 behavior. A directory path: such rows are captured
    # WHOLE (raw line) via a declared corrupt-record column, written to
    # quarantine_dir/batch_id=N/ as parquet (idempotent overwrite per
    # batch, like the detection sink), and EXCLUDED from state and
    # detections - repair-and-refeed is the operator's call, silent
    # partial parsing never is.
    quarantine_dir: str | None = None
    # vacuum unreferenced state-store snapshot versions every N committed
    # batches (0 disables). Long-running streams otherwise accumulate one
    # snapshot dir per touched bucket per batch.
    vacuum_every_n_batches: int = 0
    # when True, PatId2/PatId3 re-emit every batch while the condition holds
    # (reference parity, survey §2.12); False dedups against prior detections.
    refire_stateful_patterns: bool = True
