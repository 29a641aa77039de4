"""Deterministic clustering: the fixed-point k-means' downstream IVF
retrieval path is cross-engine reproducible end-to-end (training,
assignment, probing, cosine ranking), and invariant to partitioning."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.operators.clustering import (
    ivf_det_topk,
)
from pyspark_data_engineering_assignment_spark.sources.tables import load_table
from tests.oracle_harness import compare_query, duckdb_connection

SF = "/root/testdata/sf0.001"
N_CELLS, ITERS, N_PROBE, K, DIM, SCALE = 8, 3, 2, 5, 64, 1_000_000


def _ivf_det_oracle() -> str:
    dist = (
        "list_reduce(list_transform(list_zip(v.v, c.c), "
        "l -> (l[1]-l[2])*(l[1]-l[2])), (x, y) -> x + y)"
    )
    cos = (
        "list_reduce(list_transform(list_zip(q.qvec, t.cvec), "
        "l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x, y) -> x + y)"
        " / (q.qn * t.cn)"
    )
    sql = f"""
    WITH v AS (
        SELECT vec_id AS vid, embedding,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))
                   AS v
        FROM embeddings
    ),
    c0 AS (
        SELECT CAST(rn - 1 AS BIGINT) AS cell, v AS c FROM (
            SELECT vid, v, row_number() OVER (
                ORDER BY md5(CAST(vid AS VARCHAR)), vid) AS rn
            FROM v) AS seeded
        WHERE rn <= {N_CELLS}
    )"""
    prev = "c0"
    for t in range(1, ITERS + 1):
        sql += f""",
    a{t} AS (
        SELECT vid, v, cell FROM (
            SELECT v.vid, v.v, c.cell,
                   row_number() OVER (PARTITION BY v.vid
                                      ORDER BY {dist}, c.cell) AS rk
            FROM v, {prev} c) AS ranked
        WHERE rk = 1
    ),
    s{t} AS (
        SELECT cell, i, CAST(sum(v[i]) AS BIGINT) AS s, count(*) AS n
        FROM a{t}, unnest(range(1, {DIM + 1})) d(i)
        GROUP BY 1, 2
    ),
    m{t} AS (
        SELECT cell,
               list(CAST((s - (((s % n) + n) % n)) // n AS BIGINT)
                    ORDER BY i) AS c
        FROM s{t} GROUP BY 1
    ),
    c{t} AS (
        SELECT p.cell, COALESCE(m{t}.c, p.c) AS c
        FROM {prev} p LEFT JOIN m{t} ON p.cell = m{t}.cell
    )"""
        prev = f"c{t}"
    sql += f""",
    nrm AS (
        SELECT vid, embedding, v,
               sqrt(list_reduce(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   (x, y) -> x + y)) AS n2
        FROM v
    ),
    corpus AS (
        SELECT vid AS neighbor_id, embedding AS cvec, n2 AS cn, cell FROM (
            SELECT v.vid, v.embedding, v.n2, c.cell,
                   row_number() OVER (PARTITION BY v.vid
                                      ORDER BY {dist}, c.cell) AS rk
            FROM nrm v, {prev} c) AS ranked
        WHERE rk = 1
    ),
    probes AS (
        SELECT vid AS query_id, embedding AS qvec, n2 AS qn, cell FROM (
            SELECT v.vid, v.embedding, v.n2, c.cell,
                   row_number() OVER (PARTITION BY v.vid
                                      ORDER BY {dist}, c.cell) AS rk
            FROM nrm v, {prev} c
            WHERE v.vid < 10) AS ranked
        WHERE rk <= {N_PROBE}
    ),
    scored AS (
        SELECT DISTINCT q.query_id, t.neighbor_id, {cos} AS cos
        FROM probes q JOIN corpus t ON q.cell = t.cell
        WHERE q.query_id <> t.neighbor_id
    )
    SELECT query_id, neighbor_id, cos, rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored) AS r
    WHERE rank <= {K}
    """
    return sql


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF)
    yield c
    c.close()


def _run(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_det_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=K,
        n_cells=N_CELLS,
        iters=ITERS,
        n_probe=N_PROBE,
    )


def test_ivf_det_matches_duckdb_end_to_end(spark, con):
    ok, msg = compare_query(spark, con, _run, _ivf_det_oracle(), SF)
    assert ok, msg


@pytest.mark.slow
def test_ivf_det_invariant_to_partitioning(spark):
    emb = load_table(spark, SF, "embeddings")
    a = _run(spark, SF).collect()
    shuffled = emb.repartition(13, "label")
    b = ivf_det_topk(
        shuffled,
        shuffled.filter(F.col("vec_id") < 10),
        k=K,
        n_cells=N_CELLS,
        iters=ITERS,
        n_probe=N_PROBE,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@pytest.mark.slow
def test_det_oracles_agree_on_corrupt_vectors(spark, tmp_path):
    """Round-8 ADVICE low: the det-IVF DuckDB oracles must mirror the
    Spark side's corrupt-vector exclusion (NULL vector, NaN element,
    NULL element) - otherwise a corpus containing one corrupt row
    value-hash-diverges the gate on CORRECT code. Build a corpus that
    contains all three corruption shapes and run both registry queries
    against their own oracle SQL on it."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_data_engineering_assignment_spark.plans import QUERIES

    src = pq.read_table(f"{SF}/embeddings.parquet")
    rows = src.slice(0, 60).to_pylist()
    dim = len(rows[0]["embedding"])
    nxt = max(r["vec_id"] for r in rows) + 1
    rows.append({"vec_id": nxt, "embedding": None, "label": 0})
    rows.append(
        {"vec_id": nxt + 1, "embedding": [float("nan")] * dim, "label": 0}
    )
    with_null_elem = [0.5] * dim
    with_null_elem[3] = None
    rows.append({"vec_id": nxt + 2, "embedding": with_null_elem, "label": 0})
    # round-10 tie probe: a NULL PRIMARY key on a VALID vector that
    # exactly duplicates a clean row's embedding - vec_id is the
    # tie-break of every cos-ranked window and the k-means seed order;
    # Spark sorts the NULL tie-break FIRST, DuckDB LAST, so this row
    # diverges any ranked query that does not exclude unplaceable rows
    rows.append(
        {"vec_id": None, "embedding": list(rows[0]["embedding"]), "label": 0}
    )

    corrupt_sf = tmp_path / "sf_corrupt"
    corrupt_sf.mkdir()
    pq.write_table(
        pa.Table.from_pylist(rows, schema=src.schema),
        str(corrupt_sf / "embeddings.parquet"),
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{corrupt_sf}/embeddings.parquet'"
    )
    try:
        # every oracle-bearing registry query that reads ONLY the
        # embeddings table must stay hash-identical on the corrupt corpus
        for name in (
            "embedding_kmeans_cells",
            "ann_ivf_probe_topk",
            "ann_cosine_topk",
            "ann_int8_topk",
            "embedding_norms",
            "label_centroid_dims",
            "ann_lsh_topk",
            "embedding_neardup",
            "embedding_quantization_error",
        ):
            spec = QUERIES[name]
            sql = spec.oracle or spec.local_oracle
            ok, msg = compare_query(spark, con, spec.fn, sql, str(corrupt_sf))
            assert ok, f"{name} diverged on corrupt corpus: {msg}"
    finally:
        con.close()
