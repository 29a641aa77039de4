"""Property-based batch-invariance (SURVEY §5.4): for ANY row multiset
and ANY chunking of it, the cumulative state after merging the chunks in
order equals the state from one big batch. Hypothesis drives the row
values (including Decimal money and nulls) and the chunk boundaries."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_data_engineering_assignment_spark.state.store import (
    CUSTOMER_MERCHANT_SUMMARY,
    ParquetStateStore,
)
from tests.test_state_store import CM_AGG_SCHEMA, NOW, cm_state
import pytest  # noqa: E402

_spark = None  # session-scoped fixture handle for hypothesis inner fn

customers = st.sampled_from(["C1", "C2", "C3"])
merchants = st.sampled_from(["M1", "M2"])
amounts = st.one_of(
    st.none(),
    st.decimals(
        min_value=Decimal("-99.99"),
        max_value=Decimal("99.99"),
        places=2,
        allow_nan=False,
        allow_infinity=False,
    ),
)
rows_strategy = st.lists(
    st.tuples(customers, merchants, st.integers(min_value=0, max_value=5), amounts),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy, data=st.data())
@pytest.mark.slow
def test_state_merge_is_chunking_invariant(spark, tmp_path_factory, rows, data):
    # hypothesis picks the chunk boundaries too
    n_chunks = data.draw(st.integers(min_value=1, max_value=min(4, len(rows))))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=len(rows)),
                min_size=n_chunks - 1,
                max_size=n_chunks - 1,
            )
        )
    )
    chunks, prev = [], 0
    for c in [*cuts, len(rows)]:
        chunks.append(rows[prev:c])
        prev = c
    chunks = [c for c in chunks if c]

    base = tmp_path_factory.mktemp("prop")
    one = ParquetStateStore(spark, str(base / "one"), n_buckets=4)
    one.merge_batch(
        CUSTOMER_MERCHANT_SUMMARY,
        spark.createDataFrame(rows, CM_AGG_SCHEMA),
        batch_id=0,
        now=NOW,
    )
    many = ParquetStateStore(spark, str(base / "many"), n_buckets=4)
    for bid, chunk in enumerate(chunks):
        many.merge_batch(
            CUSTOMER_MERCHANT_SUMMARY,
            spark.createDataFrame(chunk, CM_AGG_SCHEMA),
            batch_id=bid,
            now=NOW,
        )
    assert cm_state(one) == cm_state(many)
