"""Multimodal plumbing tests: Arrow batch shape, numpy-vectorized byte
histogram, normalized feature derivation, and the loud codec boundary."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.operators.multimodal import (
    byte_histogram,
    decode_payload,
    documents_as_media,
    extract_features,
)

DOCS = [
    (1, "hello world"),
    (2, ""),
    (3, "abc " * 50),
    (4, "émoji ünïcode bytes"),  # multi-byte utf-8
]


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return documents_as_media(docs)


def _expected_hist(text: str, dim: int = 16) -> list[int]:
    raw = text.encode("utf-8")
    hist = [0] * dim
    for b in raw:
        hist[b % dim] += 1
    return hist


def test_byte_histogram_matches_pure_python(spark, media):
    got = {r["media_id"]: list(r["counts"]) for r in byte_histogram(media).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == _expected_hist(text), doc_id
    # n_bytes consistency: histogram mass == payload byte length
    for r in byte_histogram(media).collect():
        assert sum(r["counts"]) == r["n_bytes"]


def test_extract_features_is_normalized_histogram(spark, media):
    feats = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    for doc_id, text in DOCS:
        hist = _expected_hist(text)
        total = sum(hist) or 1
        want = np.array(hist, dtype=np.float64) / total
        got = np.array(feats[doc_id], dtype=np.float64)
        assert got == pytest.approx(want, abs=1e-6), doc_id
    # empty payload: all-zero feature, not NaN
    assert all(v == 0.0 for v in feats[2])


def test_decode_payload_fails_loudly_for_unknown_codec():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x00", "image")


def test_payload_column_pruned_when_unused(spark, media):
    """Scale guard: a metadata-only projection must not read the payload
    bytes (column pruning reaches the scan)."""
    meta_only = media.select("media_id", "n_bytes")
    assert "payload" not in meta_only.schema.fieldNames()


def test_byte_histogram_arrow_equals_pandas(spark):
    from pyspark_data_engineering_assignment_spark.operators.multimodal import (
        byte_histogram,
        byte_histogram_arrow,
        documents_as_media,
    )
    from pyspark_data_engineering_assignment_spark.sources.tables import load_table

    media = documents_as_media(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    a = {
        r.media_id: (r.n_bytes, list(r.counts))
        for r in byte_histogram(media, dim=16).collect()
    }
    b = {
        r.media_id: (r.n_bytes, list(r.counts))
        for r in byte_histogram_arrow(media, dim=16).collect()
    }
    assert a == b and len(a) == 500


def test_sample_frames_byte_semantics(spark):
    """Frames are BYTE windows, not character windows: a 2-byte utf-8
    char on a frame boundary is split between frames."""
    import hashlib

    from pyspark_data_engineering_assignment_spark.operators.multimodal import (
        sample_frames,
    )

    payload = ("a" * 7 + "é").encode()  # 7 ascii + 2-byte e-acute = 9 bytes
    df = spark.createDataFrame(
        [(1, "text", bytearray(payload), len(payload), "x")],
        "media_id long, media_type string, payload binary, n_bytes long, sha256 string",
    )
    rows = {
        r["frame_idx"]: (r["frame_len"], r["frame_sha256"])
        for r in sample_frames(df, frame_bytes=4, every_k=1).collect()
    }
    # 9 bytes / 4 -> frames of 4, 4, 1; the e-acute spans frames 1|2
    assert {i: fl for i, (fl, _) in rows.items()} == {0: 4, 1: 4, 2: 1}
    for i in range(3):
        assert rows[i][1] == hashlib.sha256(payload[i * 4:(i + 1) * 4]).hexdigest()


def test_sample_frames_validation(spark):
    import pytest as _pytest

    from pyspark_data_engineering_assignment_spark.operators.multimodal import (
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, "text", bytearray(b"abc"), 3, "x")],
        "media_id long, media_type string, payload binary, n_bytes long, sha256 string",
    )
    with _pytest.raises(ValueError):
        sample_frames(df, frame_bytes=0)


# --- round-11: NON-TEXT binary fixture + registered-decoder parity ---------
#
# Until now every media test fed text-as-bytes payloads through the one
# real codec ("text" = identity). This block feeds genuinely non-text
# byte patterns with a DECLARED fake media_type and pins both halves of
# the codec contract (round-11 verdict task #5):
#   (a) an undeclared codec fails the JOB loudly, naming the type - no
#       quietly-wrong histogram rows for payloads we cannot decode;
#   (b) with a decoder REGISTERED (passed by value into the closure so
#       it reaches executors), histogram and feature outputs match a
#       pure-python replay of decode+count exactly, across both the
#       pandas and Arrow implementations.


def _synthetic_binary_media(spark, media_type="synthwave"):
    """Deterministic non-text payloads: byte i of payload k is
    (k*37 + i*11) % 251 - full 0..250 byte range, nothing utf-8."""
    rows = []
    for k in range(1, 6):
        payload = bytes((k * 37 + i * 11) % 251 for i in range(64 * k))
        rows.append((k, media_type, payload, len(payload)))
    return spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, n_bytes long"
    )


def _make_xor5a():
    """The registered fake codec: XOR every byte with 0x5A. Stands in
    for a real decode (output differs from the raw payload, so a test
    passing proves the decoder RAN, not that it was skipped). Built as
    a NESTED function: cloudpickle ships nested functions by VALUE,
    while a test-module-level function pickles by reference and the
    executors cannot import the test module."""

    def xor5a(payload: bytes) -> bytes:
        return bytes(b ^ 0x5A for b in payload)

    return xor5a


def test_undeclared_codec_fails_job_loudly(spark):
    media = _synthetic_binary_media(spark, media_type="undeclared_codec")
    with pytest.raises(Exception, match="undeclared_codec"):
        byte_histogram(media).collect()


def test_registered_decoder_histogram_parity(spark):
    """Histogram over DECODED bytes == pure-python replay, for both the
    mapInPandas and mapInArrow implementations."""
    from pyspark_data_engineering_assignment_spark.operators.multimodal import (
        byte_histogram_arrow,
    )

    xor5a = _make_xor5a()
    decoders = {"synthwave": xor5a}
    media = _synthetic_binary_media(spark)

    def expected(k: int, dim: int = 16) -> list[int]:
        payload = bytes((k * 37 + i * 11) % 251 for i in range(64 * k))
        hist = [0] * dim
        for b in xor5a(payload):
            hist[b % dim] += 1
        return hist

    for impl in (byte_histogram, byte_histogram_arrow):
        got = {
            r["media_id"]: list(r["counts"])
            for r in impl(media, decoders=decoders).collect()
        }
        assert got == {k: expected(k) for k in range(1, 6)}, impl.__name__


def test_registered_decoder_feature_parity(spark):
    xor5a = _make_xor5a()
    decoders = {"synthwave": xor5a}
    media = _synthetic_binary_media(spark)
    feats = {
        r["media_id"]: np.array(r["feature"], dtype=np.float64)
        for r in extract_features(media, decoders=decoders).collect()
    }
    for k in range(1, 6):
        payload = bytes((k * 37 + i * 11) % 251 for i in range(64 * k))
        hist = np.zeros(16)
        for b in xor5a(payload):
            hist[b % 16] += 1
        assert feats[k] == pytest.approx(hist / hist.sum(), abs=1e-6), k


def test_mixed_types_one_decoded_one_loud(spark):
    """A corpus mixing a decodable type with an undecodable one: the
    job must FAIL (loud contract) rather than emit partial results -
    partial-and-silent is the failure mode that poisons a 100 TB
    curation run."""
    rows = [
        (1, "text", b"hello", 5),
        (2, "video", b"\x00\x01\x02", 3),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, n_bytes long"
    )
    with pytest.raises(Exception, match="video"):
        byte_histogram(media).collect()
