"""Driver-window freeze pin (round-11, VERDICT task #2).

The driver's independent correctness gate samples the FIRST 50 registry
entries. The rotation that cycled every oracle-bearing query through
that window RETIRED at round 10 (plans/__init__.py:44-50): from round
11 on, the window must stay EXACTLY this list unless a deliberate
promotion note accompanies the change. Without this pin, an innocent
registration reorder (a new module import, an alphabetization, a moved
register() call) could silently eject a driver-checked query from the
gate - the gate would still show 50 green rows, just not the ones the
cumulative r1-r10 record vouches for.

If this test fails because you INTENTIONALLY changed the window
(added a new query and demoted a long-green one), update the literal
below in the same commit and say so in the commit message - that IS
the promotion note.
"""

from __future__ import annotations

from pyspark_data_engineering_assignment_spark.plans import QUERIES

# The exact window as of the round-10 close (CORRECTNESS_r10.json keys,
# all 50 green), with ONE deliberate round-12 promotion - this edit is
# the promotion note the module docstring prescribes: dedup_exact_nfc
# (added round 11, the only query never driver-sampled) swaps in for
# long-green rollup_lineitem_status (driver-green r1-r11; demoted to
# local_oracle in plans/__init__.py, keeping the identical
# rows+schema+value-hash check in tests/test_oracle_parity.py).
# Order matters: the driver samples by position.
FROZEN_WINDOW = [
    "patid2_child",
    "patid3_dei",
    "patid1_upgrade",
    "pricing_summary",
    "revenue_by_nation",
    "returnflag_pivot",
    "events_hourly",
    "events_sessions",
    "purchase_asof_click",
    "brand_type_revenue",
    "urgent_never_big",
    "nations_above_revenue_share",
    "corpus_curation_funnel",
    "user_reach_kmv",
    "user_cohort_retention",
    "event_class_totals_salted",
    "value_quantiles_by_type",
    "user_running_spend",
    "orders_status_priority_cube",
    "customer_order_gaps",
    "events_hourly_gapfill",
    "event_reach_setops_kmv",
    "user_moving_spend",
    "corpus_mix_weights",
    "user_spend_anomalies",
    "value_decile_profile",
    "customer_order_distribution",
    "top_revenue_suppliers",
    "priority_order_counts_sql",
    "returnflag_melt_roundtrip",
    "value_hour_regression_stats",
    "event_burst_compaction",
    "activity_dow_hour_heatmap",
    "null_safe_category_join",
    "dedup_exact",
    "ngram_jaccard_neardup_capped",
    "lang_stats",
    "media_binary_stats",
    "doc_language_id",
    "doc_quality_features",
    "doc_bpe_token_stats",
    "dedup_clusters",
    "doc_split_stratified",
    "doc_stratified_take",
    "doc_chunk_overlap",
    "chunk_dedup_stats",
    "doc_length_batching",
    "dedup_exact_nfc",
    "ann_cosine_topk",
    "conversion_lag_stats",
]


def test_first_50_registry_slice_is_frozen():
    assert list(QUERIES)[:50] == FROZEN_WINDOW


def test_window_queries_all_carry_driver_oracles():
    """Every window slot gets the STRONG rows+schema+value-hash check;
    a slot degrading to rows-only (oracle dropped) would silently
    weaken the gate even with the order intact."""
    missing = [n for n in FROZEN_WINDOW if QUERIES[n].oracle is None]
    assert missing == []


def test_no_oracle_bearing_query_outside_window():
    """The reorder in plans/__init__.py packs oracle-bearing queries
    first; if a 51st oracle-bearing query ever exists, it is silently
    never driver-sampled - that needs an explicit promotion/demotion,
    not an accident."""
    oracle_bearing = [n for n, s in QUERIES.items() if s.oracle is not None]
    assert len(oracle_bearing) == 50
    assert set(oracle_bearing) == set(FROZEN_WINDOW)
