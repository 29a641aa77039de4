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


def test_unigram_surprisal_uniform_and_skewed(spark):
    import math

    from pyspark_data_engineering_assignment_spark.operators.textstats import (
        unigram_surprisal,
    )

    # corpus: 8 tokens total; "a" appears 4x (p=1/2), b/c/d/e once each
    # (p=1/8). Per-token surprisal is floor(-ln(p)*1e6) - integer-exact,
    # so the doc totals are hand-computable.
    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "b c d e")], ["doc_id", "text"]
    )
    s_half = math.floor(-math.log(4 / 8) * 1e6)   # 693147
    s_eighth = math.floor(-math.log(1 / 8) * 1e6)  # 2079441
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_e6"])
        for r in unigram_surprisal(docs).collect()
    }
    assert got == {1: (4, 4 * s_half), 2: (4, 4 * s_eighth)}
    # the skewed doc is the more "surprising" one
    assert got[2][1] > got[1][1]


def test_chunk_tokens_coverage_properties_exhaustive(spark):
    """Every token count 1..100: the overlap chunker must tile the doc -
    chunk i holds exactly min(W, n - i*S) tokens, the chunk count is
    ceil(max(n-W,0)/S)+1, and the tail is covered (no token beyond the
    last chunk). Exhaustive over n, not sampled."""
    from pyspark_data_engineering_assignment_spark.operators.textstats import (
        chunk_tokens,
    )

    W, S = 32, 24
    rows = [(n, " ".join(f"t{i}" for i in range(n))) for n in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): r["n_chunk_tokens"]
        for r in chunk_tokens(df, width=W, stride=S).collect()
    }
    for n in range(1, 101):
        expected_chunks = (max(n - W, 0) + S - 1) // S + 1
        idxs = sorted(i for (d, i) in got if d == n)
        assert idxs == list(range(expected_chunks)), (n, idxs)
        for i in idxs:
            assert got[(n, i)] == min(W, n - i * S), (n, i, got[(n, i)])
        # tail covered: last chunk reaches the final token
        assert (expected_chunks - 1) * S + got[(n, expected_chunks - 1)] == n
