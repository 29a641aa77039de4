"""int8 scalar quantization: error bounds, clamp range, zero-vector."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.functions.vectors import (
    int8_recon_err2_e12,
    int8_scale,
    quantize_int8,
)


def _df(spark, vecs):
    return spark.createDataFrame([Row(v=[float(x) for x in vec]) for vec in vecs])


def test_quantized_values_are_int8_range(spark):
    df = _df(spark, [[0.5, -1.0, 0.25, 0.999], [3.0, -3.0, 1.5, 0.0]])
    rows = df.select(
        quantize_int8(F.col("v"), int8_scale(F.col("v"))).alias("q")
    ).collect()
    for r in rows:
        assert all(-127.0 <= q <= 127.0 and q == int(q) for q in r.q)
        # symmetric scheme maps the max-|x| element to +/-127
        assert max(abs(q) for q in r.q) == 127.0


def test_reconstruction_error_bound(spark):
    # |err| <= 0.5/scale per element => err^2*1e12 <= (0.5/scale)^2 * 1e12
    vecs = [[0.1, -0.9, 0.33, 0.71], [5.0, 2.5, -4.999, 1.0]]
    df = _df(spark, vecs)
    rows = df.select(
        "v",
        int8_scale(F.col("v")).alias("s"),
        int8_recon_err2_e12(F.col("v"), int8_scale(F.col("v"))).alias("e"),
    ).collect()
    for r in rows:
        bound = (0.5 / r.s) ** 2 * 1e12
        assert all(e <= math.ceil(bound) for e in r.e)


def test_zero_vector_is_exact(spark):
    df = _df(spark, [[0.0, 0.0, 0.0]])
    r = df.select(
        int8_scale(F.col("v")).alias("s"),
        quantize_int8(F.col("v"), int8_scale(F.col("v"))).alias("q"),
        int8_recon_err2_e12(F.col("v"), int8_scale(F.col("v"))).alias("e"),
    ).collect()[0]
    assert r.s == 0.0
    assert list(r.q) == [0.0, 0.0, 0.0]
    assert list(r.e) == [0, 0, 0]


def test_quantization_roundtrip_close(spark):
    vec = [0.123, -0.456, 0.789, -0.001]
    df = _df(spark, [vec])
    r = df.select(
        int8_scale(F.col("v")).alias("s"),
        quantize_int8(F.col("v"), int8_scale(F.col("v"))).alias("q"),
    ).collect()[0]
    recon = [q / r.s for q in r.q]
    step = 1.0 / r.s
    assert all(abs(a - b) <= 0.5 * step + 1e-12 for a, b in zip(vec, recon))


def test_int8_topk_recall_vs_float_baseline(spark):
    """Quantized retrieval must agree with the exact float baseline on
    nearly all of the top-5: int8 cosine error is O(quantization step),
    far below typical neighbor gaps. Measured on the real sf0.001
    embeddings: recall@5 = 1.0; pinned at >= 0.9 to absorb future
    fixture regeneration."""
    from pyspark_data_engineering_assignment_spark.operators.similarity import (
        brute_force_topk,
        int8_topk,
    )
    from pyspark_data_engineering_assignment_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in int8_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, f"int8 recall@5 {recall:.2f} vs float baseline"
