"""Corrupt-documents oracle parity (round-9; text twin of the
corrupt-vector gate in test_clustering.py).

Round 8's degenerate sweep probed the text OPERATORS with NULL/empty
inputs; this file closes the remaining seam - the ORACLES. Every
documents-only oracle-bearing registry query runs on a corpus that
contains every corruption shape at once (NULL text, empty text,
whitespace-only, punctuation-only, single token, NULL lang/source,
lying n_chars metadata, and an exact duplicate of a clean doc) through
the same strict rows+schema+value-hash compare the driver gate
applies. Any Spark-vs-DuckDB convention drift on corrupt text reds
this file deterministically instead of waiting for dirty real data.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_harness import oracle_queries_reading_only, run_parity_gate

pytestmark = pytest.mark.axis

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corrupt_docs_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/documents.parquet")
    rows = src.slice(0, 40).to_pylist()
    nxt = max(r["doc_id"] for r in rows) + 1
    dup_of = rows[0]
    rows += [
        # NULL text: missing data, not content (must not dedup-collapse)
        dict(doc_id=nxt, text=None, lang="en", source="srcX", n_chars=0),
        dict(doc_id=nxt + 1, text=None, lang="en", source="srcX", n_chars=0),
        # empty and whitespace-only text
        dict(doc_id=nxt + 2, text="", lang="en", source="srcX", n_chars=0),
        dict(doc_id=nxt + 3, text="   ", lang="en", source="srcX", n_chars=3),
        # punctuation-only and single-token text
        dict(doc_id=nxt + 4, text="!!! ... ???", lang="en", source="srcX",
             n_chars=11),
        dict(doc_id=nxt + 5, text="x", lang="en", source="srcX", n_chars=1),
        # NULL lang / NULL source (grouping keys)
        dict(doc_id=nxt + 6, text="plain words here", lang=None,
             source="srcX", n_chars=16),
        dict(doc_id=nxt + 7, text="plain words there", lang="en",
             source=None, n_chars=17),
        # lying n_chars metadata (text is real, length metadata is not)
        dict(doc_id=nxt + 8, text="short text", lang="en", source="srcX",
             n_chars=10_000_000),
        dict(doc_id=nxt + 9, text="negative meta", lang="en", source="srcX",
             n_chars=-5),
        # exact duplicate of a clean doc under a new id
        dict(doc_id=nxt + 10, text=dup_of["text"], lang=dup_of["lang"],
             source=dup_of["source"], n_chars=dup_of["n_chars"]),
        # round-10 tie probe: a NULL PRIMARY key whose text exactly
        # duplicates a clean doc - doc_id is the tie-break of every
        # ordered documents window (canonical keeper's n_chars tie,
        # incremental dedup's id order, packing's per-shard order,
        # stratified take's md5 rank) and the member id of the dedup
        # cluster queries; Spark sorts the NULL tie-break FIRST,
        # DuckDB LAST, so this row diverges any ordered query that
        # does not exclude unplaceable rows on both sides
        dict(doc_id=None, text=dup_of["text"], lang=dup_of["lang"],
             source=dup_of["source"], n_chars=dup_of["n_chars"]),
        # and one NULL-id row with unique text (no tie: exercises the
        # NULL id alone through tokenize/quality/langid groupings)
        dict(doc_id=None, text="solitary null keyed document words",
             lang="en", source="srcX", n_chars=34),
        # a 600-token NULL-id doc: with the rows above there are now
        # multiple NULL-id docs whose RELATIVE order in any doc_id-
        # ordered window is undefined (equal NULL keys), and their
        # combined token mass straddles the 512-token packing cut -
        # if packing/chunking assigns them order-dependently the gate
        # reds; green means id-less docs are excluded or order-free
        dict(doc_id=None,
             text=" ".join(f"w{k % 29}" for k in range(600)),
             lang="en", source="srcB",
             n_chars=len(" ".join(f"w{k % 29}" for k in range(600)))),
    ]
    # exact token-count boundary shapes: the packing cut (512/513), the
    # chunk width (32/33) and the chunk stride (24/25) - off-by-one
    # chunk/pack assignment drift between Spark and the SQL replay
    # would surface here and nowhere in organic data
    # (5, 6) also crosses winnowing's len(hs) < 4 window switch
    for j, n_toks in enumerate((512, 513, 32, 33, 24, 25, 8, 6, 5, 1)):
        text = " ".join(f"tok{k % 13}" for k in range(n_toks))
        rows.append(
            dict(doc_id=nxt + 11 + j, text=text, lang="en",
                 source="srcB", n_chars=len(text))
        )
    sf = tmp_path_factory.mktemp("corrupt_docs_sf")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=src.schema),
        str(sf / "documents.parquet"),
    )
    return str(sf)




def test_every_documents_oracle_agrees_on_corrupt_corpus(
    spark, corrupt_docs_sf
):
    names = oracle_queries_reading_only({"documents"})
    assert len(names) >= 30, f"query discovery collapsed: {names}"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{corrupt_docs_sf}/documents.parquet'"
    )
    try:
        fails = run_parity_gate(spark, con, names, corrupt_docs_sf)
        assert not fails, "corrupt-documents oracle drift:\n" + "\n".join(
            f"  {n}: {m}" for n, m in fails
        )
    finally:
        con.close()
