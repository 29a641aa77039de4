"""Sequence packing (operators/packing): concat-and-chunk assignment
must be a deterministic pure function of (shard, id order, token
counts) - verified against a plain-Python replay - and long documents
must spill forward without reordering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.operators.packing import (
    pack_concat_chunks,
    pack_summary,
)


def _python_packing(rows, budget):
    """Reference replay: per shard, docs in id order, pack = chunk of
    the concatenated token stream holding the doc's first token."""
    out = {}
    by_shard = {}
    for doc_id, shard, tokens in sorted(rows):
        by_shard.setdefault(shard, []).append((doc_id, tokens))
    for shard, docs in by_shard.items():
        offset = 0
        for doc_id, tokens in docs:
            out[doc_id] = (shard, offset // budget, offset)
            offset += tokens
    return out


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        # shard 0: exact boundary fill, then spill
        (0, 0, 100),
        (2, 0, 28),
        (4, 0, 500),  # longer than budget: own start, spills forward
        (6, 0, 1),
        # shard 1: single tiny doc
        (1, 1, 7),
        # shard 2: many small docs crossing one boundary
        (3, 2, 60),
        (5, 2, 60),
        (7, 2, 60),
        (9, 2, 60),
    ]
    df = spark.createDataFrame(rows, "doc_id long, shard long, tokens long")
    return rows, df


def test_assignment_matches_python_replay(spark, sample):
    rows, df = sample
    budget = 128
    got = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["start_offset"])
        for r in pack_concat_chunks(
            df, "doc_id", "tokens", "shard", budget=budget
        ).collect()
    }
    assert got == _python_packing(rows, budget)


def test_repartitioning_does_not_move_documents(spark, sample):
    rows, df = sample
    a = pack_concat_chunks(df, "doc_id", "tokens", "shard", budget=64)
    b = pack_concat_chunks(
        df.repartition(7, "doc_id"), "doc_id", "tokens", "shard", budget=64
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_summary_conserves_tokens_and_docs(spark, sample):
    rows, df = sample
    packed = pack_concat_chunks(df, "doc_id", "tokens", "shard", budget=128)
    summ = pack_summary(packed, "shard", "tokens").collect()
    assert sum(r["n_docs"] for r in summ) == len(rows)
    assert sum(r["pack_tokens"] for r in summ) == sum(t for _, _, t in rows)
    # shard 2: 4 docs of 60 tokens, budget 128 -> starts 0,60,120,180
    # -> packs 0,0,0,1
    s2 = {r["pack_id"]: r["n_docs"] for r in summ if r["shard"] == 2}
    assert s2 == {0: 3, 1: 1}


def test_budget_must_be_positive(spark, sample):
    _, df = sample
    with pytest.raises(ValueError):
        pack_concat_chunks(df, "doc_id", "tokens", "shard", budget=0)


def test_packing_property_matches_python_replay(spark):
    """Property (hypothesis): for ANY (unique doc_id, shard, tokens)
    rows - zero-token docs and longer-than-budget docs included - the
    distributed assignment equals the plain-Python concat-and-chunk
    replay for any budget, and per-shard token totals are conserved."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),   # shard
                st.integers(min_value=0, max_value=300), # tokens
            ),
            min_size=1,
            max_size=12,
        ),
        budget=st.sampled_from([1, 64, 128]),
    )
    def prop(docs, budget):
        rows = [(i, shard, tokens) for i, (shard, tokens) in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, shard long, tokens long")
        got = {
            r["doc_id"]: (r["shard"], r["pack_id"], r["start_offset"])
            for r in pack_concat_chunks(
                df, "doc_id", "tokens", "shard", budget=budget
            ).collect()
        }
        assert got == _python_packing(rows, budget), (rows, budget, got)

    prop()
