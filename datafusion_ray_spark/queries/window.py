"""Driver certification-window DECLARATION (policy, not implementation).

The external driver certifies the FIRST 50 registry entries per round, so
the registry orders its dict as ``CERTIFICATION_FLAGSHIPS`` then
``CERTIFICATION_ROTATING`` then everything else (after the TPC-H suite,
which the registry pins first by construction). The lists here are the
output of the staleness ledger's picker
(``python -m datafusion_ray_spark.certledger`` → ``CERT_LEDGER.json``) and
``tests/test_cert_ledger.py`` asserts they REPRODUCE it, so the shipped
window is provably the ledger's pick.

This module is deliberately excluded from the ledger's per-entry file
closures: it changes every round BY DESIGN (the window moves), and a
window re-declaration does not alter any entry's implementation — hashing
it into closures would mark all 192 entries stale every round, making the
staleness signal vacuous. That exclusion is the reason the lists moved out
of ``queries/registry.py`` (whose ``_sql_entry`` wrapper IS on every
entry's run path and stays hashed).
"""

from __future__ import annotations

#: Pinned every round: the 8 family anchors after the TPC-H suite (which
#: the registry pins first by construction). These are the flagship
#: answers that must stay CONTINUOUSLY driver-certified.
CERTIFICATION_FLAGSHIPS = [
    "dedup_minhash_lsh", "dedup_groups",      # near-dup pipeline + groups
    "sim_knn_graph",                          # ANN batch workload
    "join_asof",                              # temporal-join family anchor
    "ev_session_window",                      # event windowing anchor
    "text_token_stats",                       # text pipeline anchor
    "sketch_count_min",                       # mergeable-sketch anchor
    "mm_decode_features",                     # multimodal anchor
]

#: Round-10 rotating slots = the ledger's pick over the r1-r9 driver
#: certification union: stale entries first (code path touched after the
#: last driver row — round 9's registry/tables/suite churn touched most
#: closures, so staleness alone over-fills the 20 slots), broken by
#: OLDEST certification first; every slot below was last driver-certified
#: in ROUND 1 and has the round-1 → round-9 drift of eight rounds of
#: optimizer/protocol/source changes to re-verify.
CERTIFICATION_ROTATING = [
    "agg_bool_bit",
    "agg_listagg",
    "agg_min_max_by",
    "agg_percentile",
    "agg_stats",
    "cond_null_funcs",
    "cross_join",
    "cube_agg",
    "datetime_funcs",
    "distinct_proj",
    "grouping_sets",
    "join_full_outer",
    "join_right_outer",
    "join_semi_anti",
    "limit_offset",
    "rollup_agg",
    "scalar_funcs",
    "setop_except",
    "setop_intersect",
    "setop_union",
]
