"""Edge cases for repetition_stats (operators/textstats) that the
corpus-wide oracle parity can't guarantee to cover: single-token and
fully-repeated documents, where the sequence()/array guards matter."""

from __future__ import annotations

from pyspark_data_engineering_assignment_spark.operators.textstats import (
    repetition_stats,
)


def test_repetition_stats_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, "only"),                      # 1 token: no bigrams
            (2, "spam spam spam spam"),       # all-duplicate bigrams
            (3, "a b a b a"),                 # alternation: 4 bigrams, 2 distinct
            (4, "w x y z"),                   # no repetition at all
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1] == {
        "doc_id": 1, "n_tokens": 1, "n_bigrams": 0,
        "n_distinct_bigrams": 0, "top_token_count": 1,
    }
    assert got[2] == {
        "doc_id": 2, "n_tokens": 4, "n_bigrams": 3,
        "n_distinct_bigrams": 1, "top_token_count": 4,
    }
    assert got[3] == {
        "doc_id": 3, "n_tokens": 5, "n_bigrams": 4,
        "n_distinct_bigrams": 2, "top_token_count": 3,
    }
    assert got[4] == {
        "doc_id": 4, "n_tokens": 4, "n_bigrams": 3,
        "n_distinct_bigrams": 3, "top_token_count": 1,
    }
