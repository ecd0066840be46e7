"""Query registry package: importing this module registers every query.

Import order IS registration order IS the order the driver's correctness
gate walks (it checks the first 50 registrations).  Families that were
outside the round-1 window (similarity, temporal, textstats — VERDICT
r01 "What's missing" #1) register FIRST; the relational family registers
last because every one of its entries already has a green
CORRECTNESS_r01.json row, so it is the right family to sit beyond the
window; the extraction family's tail smoke entries (r01-green,
rows-only) are the next to overflow as new operators join the window.
"""

from medical_ocr_pipeline_spark.queries import (  # noqa: F401
    similarity,
    temporal,
    textstats,
    curation,
    webcur,
    training,
    dedup,
    misc,
    qa,
    media,
    extraction,
    relational,
)
from medical_ocr_pipeline_spark.queries.base import REGISTRY  # noqa: F401

# Queries promoted to the FRONT of the registry (and therefore into the
# driver's 50-entry window) regardless of module import order: entries
# that are new or semantically changed this round, so every change lands
# with an independent driver correctness record (VERDICT r02 #1 /
# ADVICE r02 #2 — q_below_avg_parts was the one oracle query that never
# got a driver row; w4_sessionize / q_semi / q_anti changed in round 2
# after the window was set).  Entries pushed out past slot 50 by this
# promotion are all green in CORRECTNESS_r02.json with unchanged code.
_PROMOTE_TO_WINDOW = [
    "q_below_avg_parts",
    "w4_sessionize",
    "q_semi_urgent_customers",
    "q_anti_dormant_customers",
    "ensemble_engine_metrics",
    "media_thumbnails_smoke",
    "contamination_check",
    "pii_scrub",
    "quality_repetition",
    "quality_gopher_rules",
    "span_boilerplate",
    "token_budget_sample",
    "url_canonicalize",
    "host_cap_sample",
    "quality_classifier",
    "ccnet_buckets",
    "train_test_split",
    "pack_sequences",
    "dedup_incremental",
    "dedup_substring_spans",
    "ngram_lm_score",
    "bpe_pair_counts",
    "mixture_sample",
    "semdedup",
    "bpe_train_merges",
    "bpe_encode_stats",
    "lm_perplexity_buckets",
    "split_leakage_check",
    "host_pagerank",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_components",
    "pack_bin_manifest",
    "line_dedup",
    "unimax_sample",
    "contamination_spans",
    "dsir_sample",
    "pack_best_fit",
    "decontaminate_rewrite",
    "dup_source_matrix",
    "bm25_topk",
    # Rewritten late in round 3 (xxhash64 join key + pinned SHUFFLE_HASH +
    # freq_cap): must carry a fresh driver row, so it re-enters the window.
    "dedup_ngram_jaccard",
    "span_dedup_rewrite",
    "corpus_shuffle",
    "url_blocklist_filter",
    "curation_funnel",
]

_ordered = {n: REGISTRY[n] for n in _PROMOTE_TO_WINDOW}
for _n, _s in list(REGISTRY.items()):
    if _n not in _ordered:
        _ordered[_n] = _s
REGISTRY.clear()
REGISTRY.update(_ordered)
