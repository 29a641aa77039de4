"""Java-regex vs RE2 parity on the shared pattern strings (round-11).

Every regex in the engine is deliberately written in the Java/RE2
common subset (character classes, bounded repetition, word boundaries,
no lookaround) so the SAME pattern string drives Spark and the DuckDB
oracles. The curated sweeps exercise them on hazard rows; this file
pins the engines' agreement over a seeded RANDOM unicode corpus, in
one batched comparison per primitive (one Spark job + one DuckDB
query, not one per example):

* BPE pre-tokenization (tokens_bpe vs regexp_extract_all)
* PII scrub (chained regexp_replace, all three patterns)
* PII match counts (regexp_count vs len(regexp_extract_all))

A Java-vs-RE2 divergence on boundary/class semantics over non-ASCII
input reds here before it reds a production oracle gate.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.functions.text import (

    BPE_PATTERN,
    PII_PATTERNS,
    match_count,
    scrub,
    tokens_bpe,
)

pytestmark = pytest.mark.axis

_ALPHABET = (
    "abcXYZ019 .,!?@#%+-_()/:\t\n"
    "\u00e9\u00df\u0130\u00a0\u3000\u200b\ufeff"
    "\u6625\u773c\u0645\u0440\U0001f680\U0001d504"
    "@._-"
)


def _corpus(n=400, seed=42):
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        length = rng.randint(0, 60)
        rows.append("".join(rng.choice(_ALPHABET) for _ in range(length)))
    # plant realistic PII shapes among the noise
    rows += [
        "mail me at a.b+c%d@ex-ample.co.uk today",
        "call +1 (415) 555-0100 now",
        "see https://ex.com/p?q=1#frag and http://x.io",
        "mixed \u6625 a@b.cc   +4930123456789 https://u.de/\u00e9",
    ]
    return rows


@pytest.fixture(scope="module")
def frames(spark):
    rows = _corpus()
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "i long, t string"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE corpus(i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO corpus VALUES (?, ?)", list(enumerate(rows)))
    yield sdf, con
    con.close()


def test_bpe_tokenization_agrees(frames):
    sdf, con = frames
    got = {
        r["i"]: r["toks"]
        for r in sdf.select("i", tokens_bpe(F.col("t")).alias("toks")).collect()
    }
    want = dict(
        con.execute(
            f"SELECT i, regexp_extract_all(t, '{BPE_PATTERN}') FROM corpus"
        ).fetchall()
    )
    assert got == want


def test_pii_scrub_agrees(frames):
    sdf, con = frames
    got = {
        r["i"]: r["s"]
        for r in sdf.select(
            "i", scrub(F.col("t"), PII_PATTERNS).alias("s")
        ).collect()
    }
    expr = "t"
    for pat, repl in PII_PATTERNS.values():
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    want = dict(con.execute(f"SELECT i, {expr} FROM corpus").fetchall())
    assert got == want


def test_pii_match_counts_agree(frames):
    sdf, con = frames
    for key, (pat, _) in PII_PATTERNS.items():
        got = {
            r["i"]: r["n"]
            for r in sdf.select(
                "i", match_count(F.col("t"), pat).alias("n")
            ).collect()
        }
        want = dict(
            con.execute(
                f"SELECT i, CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) "
                "FROM corpus"
            ).fetchall()
        )
        assert got == want, f"pattern {key} diverged"
