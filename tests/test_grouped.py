"""Grouped-map applyInPandas tests: per-label standardization equals a
pure-numpy reimplementation; output has zero mean / unit variance per
(label, dimension)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql.types import ArrayType, FloatType, LongType, StringType, StructField, StructType

from pyspark_data_engineering_assignment_spark.operators.grouped import (
    standardize_embeddings_by_label,
)

SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("label", StringType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def _data():
    rng = np.random.default_rng(3)
    rows = []
    for i in range(120):
        label = f"L{i % 3}"
        rows.append((i, label, [float(x) for x in rng.normal(i % 3, 2.0, 8)]))
    return rows


def test_standardization_matches_numpy(spark):
    rows = _data()
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["vec_id"]: (r["label"], np.asarray(r["embedding_std"], dtype=np.float64))
        for r in standardize_embeddings_by_label(df).collect()
    }
    assert len(got) == 120

    by_label = {}
    for i, label, v in rows:
        by_label.setdefault(label, []).append(
            (i, np.asarray(v, dtype=np.float32).astype(np.float64))
        )
    for label, members in by_label.items():
        mat = np.stack([v for _, v in members])
        mu, sd = mat.mean(axis=0), mat.std(axis=0)
        for i, v in members:
            want = (v - mu) / (sd + 1e-8)
            assert got[i][0] == label
            assert got[i][1] == pytest.approx(want, abs=1e-5), i

    # per-(label, dim) moments of the OUTPUT: ~0 mean, ~1 std
    for label in by_label:
        out = np.stack([vec for lab, vec in got.values() if lab == label])
        assert np.abs(out.mean(axis=0)).max() < 1e-5
        assert np.abs(out.std(axis=0) - 1.0).max() < 1e-3


def test_conversion_lag_cogroup(spark):
    """Cogrouped applyInPandas: per-user purchase-to-latest-prior-click
    lags, hand-checked."""
    import datetime as dt

    from pyspark_data_engineering_assignment_spark.operators.grouped import (
        conversion_lag_stats,
    )

    def ts(s):
        return dt.datetime.fromisoformat(s)

    purchases = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:30:00")),  # 30 min after u1's 10:00 click
            (1, ts("2024-01-01 12:00:00")),  # 60 min after u1's 11:00 click
            (2, ts("2024-01-01 09:00:00")),  # before any u2 click -> unattributed
            (3, ts("2024-01-01 09:00:00")),  # u3 has no clicks at all
        ],
        ["user_id", "ts"],
    )
    clicks = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00")),
            (1, ts("2024-01-01 11:00:00")),
            (2, ts("2024-01-01 10:00:00")),
        ],
        ["user_id", "ts"],
    )
    got = {r["user_id"]: r for r in conversion_lag_stats(purchases, clicks).collect()}
    assert got[1]["n_purchases"] == 2 and got[1]["n_attributed"] == 2
    assert got[1]["median_lag_seconds"] == pytest.approx(2700.0)  # (1800+3600)/2
    assert got[2]["n_attributed"] == 0 and got[2]["median_lag_seconds"] is None
    assert got[3]["n_attributed"] == 0


def test_conversion_lag_cogroup_same_source(spark):
    """Regression: when both cogroup sides derive from the SAME scan,
    their identically-named columns share an attribute id and Catalyst
    prunes the right side's copy - the operator must rename internally.
    (Crafted independent frames never trigger this; a shared parent
    does.)"""
    import datetime as dt

    from pyspark_data_engineering_assignment_spark.operators.grouped import (
        conversion_lag_stats,
    )

    events = spark.createDataFrame(
        [
            (1, "purchase", dt.datetime.fromisoformat("2024-01-01 10:30:00")),
            (1, "click", dt.datetime.fromisoformat("2024-01-01 10:00:00")),
        ],
        ["user_id", "event_type", "ts"],
    )
    purchases = events.filter("event_type = 'purchase'")
    clicks = events.filter("event_type = 'click'")
    got = conversion_lag_stats(purchases, clicks).collect()
    assert len(got) == 1
    assert got[0]["n_attributed"] == 1
    assert got[0]["median_lag_seconds"] == 1800.0


def test_standardization_invariant_to_partitioning(spark):
    """Round-9 upgrade of the weakest rows-only query: numpy's pairwise
    mean/std sums depend on row order, and a pandas group's arrival
    order depends on the shuffle - so label_standardized_embeddings
    could differ in the last ulp between partitionings. The UDF now
    sorts by id first, making the output a bit-exact pure function of
    the group's content regardless of how the input was partitioned."""
    from pyspark_data_engineering_assignment_spark.operators.grouped import (
        standardize_embeddings_by_label,
    )
    from pyspark_data_engineering_assignment_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    def run(df):
        return sorted(
            (r["vec_id"], tuple(r["embedding_std"]))
            for r in standardize_embeddings_by_label(df).collect()
        )

    a = run(emb.repartition(3, "vec_id"))
    b = run(emb.repartition(17, "label"))
    c = run(emb.coalesce(1))
    assert a == b == c, "standardization depends on partitioning"


def test_standardization_honors_custom_column_names(spark):
    """The output schema and the pandas frame the UDF builds must both
    use the CALLER's id/label names - hard-coded 'vec_id'/'label' keys
    would mismatch the declared applyInPandas schema for any
    non-default names (round-9 ADVICE low)."""
    rows = [(i, i % 2, [float(i), float(2 * i)]) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, bucket long, vec array<float>")
    out = standardize_embeddings_by_label(
        df, id_col="doc_id", label_col="bucket", vec_col="vec"
    )
    assert out.columns == ["doc_id", "bucket", "embedding_std"]
    got = out.collect()
    assert len(got) == 8
    assert {r["bucket"] for r in got} == {0, 1}


def test_label_standardized_embeddings_bitexact_python_oracle(spark):
    """Value-hash-grade parity for the one remaining float query: the
    registered ``label_standardized_embeddings`` plan must equal a
    pure-numpy replay of its contract BIT-FOR-BIT on the real sf0.01
    table (round-10 verdict task: the round-9 in-UDF sort made the
    output a pure function of group content, so the historical
    rows-only justification - last-ulp drift - no longer applies; this
    is the python-oracle equivalent of the SQL value-hash gate DuckDB
    cannot run on float32 z-scores).

    The replay shares NO code with the implementation: pyarrow read,
    plain-python grouping, the same publicly-documented recipe
    (float64 stack in vec_id order -> mean/std -> (x-mu)/(sd+1e-8) ->
    float32). Bitwise equality, not approx."""
    import pyarrow.parquet as pq

    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    got = {
        (r["vec_id"], r["dim"]): (r["label"], r["value_std"])
        for r in QUERIES["label_standardized_embeddings"].fn(spark, sf).collect()
    }

    tab = pq.read_table(f"{sf}/embeddings.parquet").to_pylist()
    by_label: dict = {}
    for row in tab:
        v = row["embedding"]
        if v is None or any(x is None for x in v) or any(
            x is not None and np.isnan(x) for x in v
        ):
            continue  # the valid_vector contract: corrupt vectors get no z-score
        by_label.setdefault(row["label"], []).append((row["vec_id"], v))

    want = {}
    for label, members in by_label.items():
        members.sort(key=lambda t: t[0])
        mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in members])
        out = ((mat - mat.mean(axis=0)) / (mat.std(axis=0) + 1e-8)).astype(
            np.float32
        )
        for (vid, _), vec in zip(members, out):
            for d, x in enumerate(vec):
                want[(vid, d)] = (label, x)

    assert len(got) == len(want)
    mismatches = [
        k for k in want
        if got[k][0] != want[k][0]
        or np.float32(got[k][1]).tobytes() != want[k][1].tobytes()
    ]
    assert not mismatches, f"bit-exact mismatch at {mismatches[:5]}"
