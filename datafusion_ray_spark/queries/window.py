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

#: Round-11 rotating slots = the ledger's pick under the sharpened
#: per-entry staleness (declaration fragments + honest import closures —
#: certledger.py round-11): stale-first, then OLDEST driver certification
#: first. NEVER-certified entries outrank everything (the rounds-4..9
#: rule that rotated every new declaration through the window), so the
#: two round-11 object-store-index entries (suite8) lead; the rest are
#: the oldest-certified survivors of the round-10 re-certification: the
#: remaining round-1 rows (whose closures were last touched by round 4's
#: shared-layer work) and the round-2/3 cohort whose operator files have
#: churned through round 11's suite-decoupling refactor (the last two of
#: that cohort, dedup_containment and ev_funnel, were displaced by the
#: new entries and stay first in line for round 12).
CERTIFICATION_ROTATING = [
    "sim_oidx_persist",
    "sim_oidx_replace",
    "setop_union_distinct",
    "theta_join",
    "unnest_explode",
    "values_inline",
    "win_frames",
    "win_lag_lead",
    "win_rank",
    "dedup_simhash",
    "ev_sliding_window",
    "ev_tumbling_window",
    "mm_meta_stats",
    "sim_knn_brute",
    "sketch_hll",
    "split_train_test",
    "text_lm_score",
    "text_quality",
    "text_winnow",
    "contamination_ngram",
]
