"""Bucketed co-located join demo: pre-bucketing both sides of a repeated
join on the join key eliminates the shuffle entirely - the core
data-layout lever for 100 TB fact-fact joins (SURVEY 'Partitioning &
shuffle' design rule). Pinned by plan inspection: the bucketed join
plans ZERO Exchange operators, the unbucketed one shuffles both sides.
"""

from __future__ import annotations

import contextlib
import io

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # external tables via explicit path: no warehouse-dir dependency
    # (spark.sql.warehouse.dir is a static conf, unsettable on a live session)
    wh = tmp_path_factory.mktemp("warehouse")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "lineitem_b"))
        .saveAsTable("lineitem_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "orders_b"))
        .saveAsTable("orders_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_eliminates_shuffle(spark, bucketed_tables):
    # disable broadcast so the join strategy is driven by layout alone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lb = spark.table("lineitem_bucketed")
        ob = spark.table("orders_bucketed")
        joined = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        # sanity: same row count as the shuffled join on raw parquet
        lr = spark.read.parquet(f"{SF}/lineitem.parquet")
        orr = spark.read.parquet(f"{SF}/orders.parquet")
        raw = lr.join(orr, lr["l_orderkey"] == orr["o_orderkey"])
        assert "Exchange" in _plan(raw)  # the layout, not luck, removed it
        assert joined.count() == raw.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
