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

#: Round-12 rotating slots = the ledger's pick under the round-12
#: recency ranking (certledger.py r12, VERDICT r11 item 3): entries whose
#: OWN declaration fragment changed since their last driver certification
#: outrank everything, ordered by most-recent own change then oldest
#: certification — so the r12 rewrites lead (dedup_lsh_eval,
#: emb_centroid_outliers, text_ngram_novelty, text_kl_divergence,
#: sketch_hist_quantile, dedup_apply_quality, ...), followed by the r11
#: rewrites the r11 window missed (text_collocations,
#: ev_retention_cohorts, ev_upsert_merge, ev_user_rfm, ...). The r11
#: rewrites whose change lives only in shared helper modules
#: (per-entry fragment attribution cannot see them) remain covered by
#: the local 194/194 oracle + pytest gate; the CC consumers' shared
#: dedup.py change is certified through the dedup_groups FLAGSHIP slot
#: plus dedup_apply_quality here.
CERTIFICATION_ROTATING = [
    "dedup_lsh_eval",
    "emb_centroid_outliers",
    "text_ngram_novelty",
    "text_kl_divergence",
    "sketch_hist_quantile",
    "seq_pack",
    "graph_local_clustering",
    "graph_triangles",
    "sim_ann_bq",
    "sim_ann_sq8_rerank",
    "sketch_heavy_hitters",
    "text_tfidf",
    "text_collocations",
    "dedup_apply_quality",
    "ev_retention_cohorts",
    "ev_upsert_merge",
    "sim_ann_sq8",
    "sketch_bloom",
    "ev_user_rfm",
    "dedup_embedding_cosine",
]
