"""Big-single-document sweep (round-11, the size axis).

Web-scale corpora contain individual multi-hundred-KB documents, and
the text operators' per-ROW costs (shingle arrays, winnowing windows,
64-family minhash transforms) are all O(tokens) per row - a blow-up
or a cross-engine drift would surface exactly there.

Two layers, split by what the ORACLE can afford: DuckDB's list
lambdas are single-threaded, so the full rows+schema+value-hash gate
runs with a 30k-token (~200 KB) document (measured ~5 min for all
documents queries; at 150k tokens the oracle side alone is 400+ s per
heavy query), and a Spark-ONLY invariant layer covers the true
megadoc (150k tokens, ~1 MB) - the engine must process it without
error and with exactly predictable token/shingle/chunk structure.

Tokens repeat on a 1009-cycle so dedup/shingle structures stay
realistic (many repeated shingles, non-trivial distinct sets).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_harness import oracle_queries_reading_only, run_parity_gate

pytestmark = pytest.mark.axis

SF = "/root/testdata/sf0.001"
CYCLE = 1009


def _big_text(n_tokens: int) -> str:
    return " ".join(f"tok{i % CYCLE}" for i in range(n_tokens))


def _corpus_dir(tmp_path_factory, n_tokens: int):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/documents.parquet")
    rows = src.slice(0, 20).to_pylist()
    nxt = max(r["doc_id"] for r in rows) + 1
    text = _big_text(n_tokens)
    rows.append(
        dict(doc_id=nxt, text=text, lang="en",
             source=f"big_{n_tokens}", n_chars=len(text))
    )
    sf = tmp_path_factory.mktemp(f"bigdoc_{n_tokens}")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=src.schema),
        str(sf / "documents.parquet"),
    )
    return str(sf), nxt


def test_every_documents_oracle_agrees_with_200kb_doc(
    spark, tmp_path_factory
):
    sf, _ = _corpus_dir(tmp_path_factory, 30_000)
    names = oracle_queries_reading_only({"documents"})
    assert len(names) >= 30, f"query discovery collapsed: {names}"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    try:
        fails = run_parity_gate(spark, con, names, sf)
        assert not fails, "big-doc oracle drift:\n" + "\n".join(
            f"  {n}: {m}" for n, m in fails
        )
    finally:
        con.close()


def test_megadoc_spark_side_invariants(spark, tmp_path_factory):
    from pyspark_data_engineering_assignment_spark.functions.text import (
        kgram_hashes_of,
        tokens,
        winnow_minima,
    )
    from pyspark_data_engineering_assignment_spark.operators.textstats import (
        chunk_tokens,
    )

    n = 150_000
    sf, big_id = _corpus_dir(tmp_path_factory, n)
    d = spark.read.parquet(f"{sf}/documents.parquet")
    big = d.filter(F.col("doc_id") == big_id)

    toks = big.select(tokens(F.col("text")).alias("t"))
    r = toks.select(
        F.size("t").alias("n"),
        F.size(F.array_distinct("t")).alias("nd"),
    ).collect()[0]
    assert (r["n"], r["nd"]) == (n, CYCLE)

    # winnowing over 150k grams: bounded output (distinct minima),
    # sorted ascending - the O(tokens) window pass completes per-row
    w = (
        toks.select(kgram_hashes_of(F.col("t"), 3).alias("h"))
        .select(winnow_minima(F.col("h"), 4).alias("w"))
        .select(
            F.size("w").alias("nw"),
            (F.col("w") == F.array_sort("w")).alias("sorted_ok"),
        )
        .collect()[0]
    )
    assert 0 < w["nw"] <= CYCLE and w["sorted_ok"]

    # chunking covers every token exactly once at stride == width
    chunks = chunk_tokens(big, width=512, stride=512)
    agg = chunks.agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("tok_sum"),
    ).collect()[0]
    assert agg["n_chunks"] == -(-n // 512)
    assert agg["tok_sum"] == n
