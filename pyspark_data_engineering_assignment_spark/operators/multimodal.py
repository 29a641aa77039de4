"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic fake (or NotImplementedError for real
codecs) - but everything Spark-side is real and tested: schema, Arrow
batch shape, ``mapInPandas`` signature, partitioning behavior.

At 100 TB the pattern is: keep payload bytes in their own column so
column pruning skips them unless the operator needs them; decode /
feature-extract inside ``mapInPandas`` (one Arrow batch at a time, no
per-row Python); emit fixed-width feature columns for downstream
relational ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

HISTOGRAM_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("counts", ArrayType(LongType()), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Materialize a media table from documents: utf-8 payload bytes +
    metadata. Stands in for image/audio ingestion; the binary column
    semantics (opaque payload, sha256 identity, byte length) are real."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.filter(
        # MEDIA_SCHEMA declares media_id non-nullable - an id-less doc
        # is unattributable media, and letting it through crashed the
        # first Arrow batch of every downstream mapInPandas against the
        # declared schema (round-10 corrupt-docs NULL-PK probe)
        F.col("doc_id").isNotNull()
    ).select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


# Codec registry: media_type -> decode(payload bytes) -> raw bytes.
# "text" is the one codec this container genuinely has (identity). A
# deployment registers real decoders by PASSING a dict to the operators
# below (``decoders={"jpeg": pil_decode, ...}``) rather than mutating
# module state: the dict travels to executors BY VALUE inside the
# cloudpickled closure, whereas a module-level registration made at
# driver runtime would silently not exist on the re-imported module in
# the Python workers.
DEFAULT_DECODERS = {"text": bytes}


def decode_payload(payload: bytes, media_type: str, decoders=None) -> bytes:
    """Decode via the registry; for media types with no registered
    codec, fail LOUDLY rather than fake silently (round-11 pinned
    contract: an undeclared codec is a job error naming the type, not a
    quietly-wrong histogram)."""
    decoders = DEFAULT_DECODERS if decoders is None else decoders
    fn = decoders.get(media_type)
    if fn is None:
        raise NotImplementedError(
            f"no codec registered for media_type={media_type!r} "
            f"(have: {sorted(decoders)}); pass decoders={{...}} with a "
            "real decoder (PIL/torchaudio/ffmpeg) on a cluster that has one"
        )
    return fn(payload)


def _payload_histogram(payload, media_type: str, dim: int, decoders=None) -> np.ndarray:
    """Byte histogram folded to ``dim`` buckets, numpy-vectorized: the
    per-byte work is ``np.frombuffer`` + ``np.bincount`` (no Python loop
    over bytes - that would defeat the Arrow batching)."""
    raw = decode_payload(bytes(payload), media_type, decoders)
    arr = np.frombuffer(raw, dtype=np.uint8)
    return np.bincount(arr % dim, minlength=dim).astype(np.int64)


def byte_histogram(media: DataFrame, dim: int = 16, decoders=None) -> DataFrame:
    """Exact byte-bucket counts per payload via ``mapInPandas`` - the
    integer-domain core of ``extract_features``, exposed separately so the
    DuckDB oracle can check it exactly (integer counts are hash-stable
    across engines; normalized floats are not).
    """

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # a NULL payload is missing media, not content: bytes(None)
            # would crash the whole Arrow batch on one corrupt row
            pdf = pdf[pdf["payload"].notna()].reset_index(drop=True)
            if pdf.empty:
                # an all-filtered batch must yield NOTHING: an empty
                # pandas frame types "counts" as float64, which Arrow
                # cannot cast to list<int64>
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "counts": [
                        _payload_histogram(p, m, dim, decoders)
                        for p, m in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )

    return media.select("media_id", "media_type", "n_bytes", "payload").mapInPandas(
        hist, schema=HISTOGRAM_SCHEMA
    )


def extract_features(media: DataFrame, feature_dim: int = 16, decoders=None) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``.

    The feature itself is a deterministic stand-in (normalized byte
    histogram folded to ``feature_dim`` buckets) - the plumbing is the
    production shape: Arrow batches in, Arrow batches out, payload
    column pruned after use, one output row per input row.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # missing media: no feature row (reset_index keeps the
            # positional feats list aligned with the surviving rows)
            pdf = pdf[pdf["payload"].notna()].reset_index(drop=True)
            if pdf.empty:
                continue  # same Arrow empty-frame typing trap as above
            feats = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                counts = _payload_histogram(payload, mtype, feature_dim, decoders)
                total = counts.sum() or 1
                feats.append((counts / total).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return media.select("media_id", "media_type", "n_bytes", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


def byte_histogram_arrow(media: DataFrame, dim: int = 16, decoders=None) -> DataFrame:
    """``byte_histogram`` implemented over ``mapInArrow`` - the fifth and
    last Python batch API, the right entry point for big BINARY columns.

    Why it exists: mapInPandas converts the whole Arrow batch to a
    pandas DataFrame first, materializing every payload into the pandas
    object-array representation before the operator sees it; mapInArrow
    hands over the RecordBatch itself, so an operator can slice payload
    buffers selectively (or, as here, iterate them without paying the
    pandas Block consolidation). On multi-MB payloads (real
    images/video) skipping the pandas hop cuts peak per-batch memory in
    the Python worker. Semantics are identical to ``byte_histogram``
    (pinned by test_multimodal equality).
    """
    import pyarrow as pa

    def hist(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            tbl = batch.to_pydict()
            keep = [i for i, p in enumerate(tbl["payload"]) if p is not None]
            counts = [
                _payload_histogram(tbl["payload"][i], tbl["media_type"][i], dim, decoders).tolist()
                for i in keep
            ]
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": [tbl["media_id"][i] for i in keep],
                    "media_type": [tbl["media_type"][i] for i in keep],
                    "n_bytes": [tbl["n_bytes"][i] for i in keep],
                    "counts": counts,
                }
            )

    return media.select("media_id", "media_type", "n_bytes", "payload").mapInArrow(
        hist, schema=HISTOGRAM_SCHEMA
    )


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every_k: int = 4
) -> DataFrame:
    """Deterministic frame sampling over opaque binary payloads: split
    each payload into fixed-size byte frames and keep every ``every_k``-th
    - the video/audio "sample n frames per clip" step, with the codec
    replaced by fixed-width byte windows (real decoders are unavailable
    here; the Spark-side plumbing - explode shape, binary slicing,
    per-frame identity - is the part that carries to production).

    Pure JVM expressions, no Python: one ``explode`` of the kept frame
    indices, ``substring`` on the binary column, sha256 per frame. Row
    blow-up is n_bytes/(frame_bytes*every_k) per payload - the sampling
    rate bounds the output, and column pruning means payloads are only
    read where this operator actually runs. Returns
    ``(media_id, frame_idx, frame_len, frame_sha256)``.
    """
    if frame_bytes <= 0 or every_k <= 0:
        raise ValueError(
            f"frame_bytes and every_k must be positive, got {frame_bytes}, {every_k}"
        )
    # frame count derives from the PAYLOAD, never the n_bytes metadata
    # column: corrupt metadata claiming 10^12 bytes would size the
    # sequence() blow-up before substring could bound it (the same
    # generator hazard as an inverted range-join interval). The payload's
    # own length cannot lie; a NULL payload has no frames.
    true_len = F.octet_length(F.col("payload")).cast("long")
    n_frames = F.ceil(true_len / F.lit(float(frame_bytes))).cast("long")
    kept = F.filter(
        F.sequence(F.lit(0).cast("long"), n_frames - 1),
        lambda i: i % every_k == 0,
    )
    frame = F.expr(f"substring(payload, frame_idx * {int(frame_bytes)} + 1, {int(frame_bytes)})")
    return (
        media.filter(true_len > 0)
        .select("media_id", "payload", F.explode(kept).alias("frame_idx"))
        .select(
            "media_id",
            "frame_idx",
            F.octet_length(frame).cast("long").alias("frame_len"),
            F.sha2(frame, 256).alias("frame_sha256"),
        )
    )
