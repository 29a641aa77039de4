from pyspark_data_engineering_assignment_spark.plans.registry import QUERIES, QuerySpec

# Importing these modules registers their queries into QUERIES.
from pyspark_data_engineering_assignment_spark.plans import text_queries  # noqa: F401
from pyspark_data_engineering_assignment_spark.plans import vector_queries  # noqa: F401

# Driver-window ROTATION: the driver's independent gate samples only
# the first 50 registry entries, so only 50 queries can carry a driver
# oracle at a time. Each round we rotate ~15 long-green queries out of
# the window (their SQL moves to local_oracle, so they KEEP the full
# rows+schema+value-hash check in tests/test_oracle_parity.py) and
# promote ~15 the driver has never sampled, until every oracle-bearing
# query has had at least one driver-checked round. A promoted query's
# docstring may still say "driver-window neutral"; this rotation
# supersedes that remark by design.
#
# History (lists below are CUMULATIVE vs registration state):
#  * round 7 promoted the TPC-H deep shapes (Q7/Q17/Q18/Q21/Q22),
#    SCD2/CDC/RI, MinHash-LSH/SimHash, contamination, packing, EWMA,
#    flat export, k-means; demoted 15 long-green redundant entries.
#    CORRECTNESS_r07: 14/15 green; embedding_kmeans_cells erred only in
#    the driver's canonicalizer (array output - fixed, scalar now).
#  * round 8 keeps embedding_kmeans_cells in the window (so its fix is
#    driver-verified), returns the 14 proven r7 promotions to
#    local_oracle, and promotes 15 never-sampled queries: sketches
#    (CMS heavy hitters), text/IR (tf-idf, term positions, boilerplate
#    shingles), dedup (incremental, canonical keeper, media blocks),
#    OLAP (grouping sets, revenue share), sessions/funnels (conversion
#    funnel, transition matrix, drawdown, trailing-hour spend),
#    similarity (int8 top-k) and robust stats (winsorized) - plus
#    demotes long-green events_value_brackets to keep the window at 50.
#
# Never-sampled remaining after r8: exactly 32 (computed against
# CORRECTNESS_r01-r07 + the r8 window). Plan, so rounds 9-10 are
# mechanical (demote that round's proven promotions, promote these):
#  * round 9 (16) - EXECUTED, all 16 green in CORRECTNESS_r09:
#    simhash_neardup_scaled, embedding_neardup_scaled,
#    ann_ivf_probe_topk, doc_prefix_editdist_pairs,
#    doc_unigram_surprisal, doc_split_leakage_safe,
#    events_quality_report, events_props_variant, user_event_setops,
#    purchase_attribution_linear, value_histogram, value_drift_bins,
#    user_top_spend_days_ties, doc_repetition_stats,
#    media_frame_sample, events_zorder_keys
#  * round 10 (16) - EXECUTED below this round; after it, EVERY
#    oracle-bearing query in the registry has had at least one
#    driver-checked round (cumulative keys r1-r10 = the full
#    oracle-bearing pool) and the rotation RETIRES: the window
#    should stay stable from round 11 on unless a new query is added.
# All 32 already pass driver-style canonicalization at sf0.01
# (tools/driver_gate_sim.py --include-local validates the whole
# local-oracle pool; run it before each promotion).
_PROMOTE = [
    # round 10: the final 16 never-driver-sampled queries (the 16
    # proven r9 promotions revert to their registered local_oracle
    # state by dropping out of this list - CORRECTNESS_r09 shows all
    # of them green)
    "activity_dow_hour_heatmap",
    "chunk_dedup_stats",
    "corpus_mix_weights",
    "customer_order_distribution",
    "doc_chunk_overlap",
    "doc_length_batching",
    "doc_stratified_take",
    "event_burst_compaction",
    "null_safe_category_join",
    "priority_order_counts_sql",
    "returnflag_melt_roundtrip",
    "top_revenue_suppliers",
    "user_moving_spend",
    "user_spend_anomalies",
    "value_decile_profile",
    "value_hour_regression_stats",
    # round 12 (VERDICT r11 task #2): dedup_exact_nfc was the one
    # registry query never driver-sampled (added round 11 with a local
    # oracle only); promote it into the frozen window in exchange for
    # long-green rollup_lineitem_status (driver-green since round 1,
    # its ROLLUP evidence redundant with orders_status_priority_cube's
    # CUBE + returnflag_pivot's lineitem aggregation - demoted below,
    # keeps the identical check as a local oracle). FROZEN_WINDOW in
    # tests/test_registry_stability.py is updated in the same commit -
    # that update IS the promotion note the pin prescribes.
    "dedup_exact_nfc",
]
_DEMOTE = [
    # round 7 demotions (stay local)
    "order_enrichment",
    "suppliers_with_shipments",
    "customers_without_big_orders",
    "distinct_supplier_flags",
    "priority_orders_union",
    "top_orders_per_customer",
    "events_sliding_2h",
    "events_props_json",
    "token_frequency",
    "text_quality",
    "media_byte_histogram",
    "doc_winnowing",
    "doc_token_scrub",
    "label_centroid_dims",
    "embedding_quantization_error",
    # round 8: one more long-green slot ceded to the promotions
    "events_value_brackets",
    # round 12: slot ceded to dedup_exact_nfc (see _PROMOTE note)
    "rollup_lineitem_status",
]
from dataclasses import replace as _replace

for _n in _PROMOTE:
    _s = QUERIES[_n]
    assert _s.oracle is None and _s.local_oracle is not None, _n
    QUERIES[_n] = _replace(_s, oracle=_s.local_oracle, local_oracle=None)
for _n in _DEMOTE:
    _s = QUERIES[_n]
    assert _s.oracle is not None, _n
    QUERIES[_n] = _replace(_s, oracle=None, local_oracle=_s.oracle)

# The driver's correctness gate samples the FIRST 50 registry entries in
# registration order. Oracle-bearing queries get the strong
# rows+schema+value-hash check; oracle-less ones only a rows-only check.
# Re-order the registry so every oracle-bearing query precedes every
# rows-only one (stable within each class), and pin with a test that the
# oracle-bearing count stays <= 50 - then no oracle-bearing query can
# ever fall outside the sampled window.
_ordered = {n: s for n, s in QUERIES.items() if s.oracle is not None}
_ordered.update({n: s for n, s in QUERIES.items() if s.oracle is None})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "QuerySpec"]
