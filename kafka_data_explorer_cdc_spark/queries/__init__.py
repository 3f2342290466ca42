"""Query inventory package — importing this module populates the registry."""

from .registry import REGISTRY, Query, oracles, queries, query  # noqa: F401

# Each module registers its queries at import time. Registration order
# is driver-execution order, and the driver checks only the FIRST 50
# registry entries per round.
#
# ROTATION POLICY (standing): each round, _FRONT is rebuilt as
#   1. every entry with NO driver CORRECTNESS row in any round
#      (new additions since the last window), in build order; then
#   2. the stalest cohort — entries whose newest driver-green round is
#      oldest — until the 50-slot window is full.
# Goal: union driver coverage stays at 100% and no entry's newest
# driver row is more than ~3 rounds old. The per-entry last-green
# table is generated into COVERAGE.md ("Driver-check freshness").
#
# Round 6: (0) = the 10 round-6 additions (b44-b46, d28-d34);
# (1) = the 20 round-5 additions the r5 window missed (b31-b42, a18,
# d26, d27, mm5, s28-s31); (2) = the r2 cohort (14: k13-k23 family +
# d07/d16-d19) and the head of the r3 cohort (d04x/d06x — also
# bench-flagged for an idle A/B — plus k24-k27; k28-k34 displaced to
# round 7).
#
# ROUND-7 QUEUE (never driver-checked, in priority order — the round-6
# build outgrew the 50-slot window): b56-b78, d43-d62, k43-k48,
# s34-s39, mm6-mm7, a20-a21 (~59 entries, all green under the local
# oracle mirror at sf0.001 — tests/test_oracle.py runs every entry).
# Fill round 7's window with the first 50 of these, then resume the
# r2/r3 rotation (k13-k34, d07, d16-d19, d04x, d06x) in round 8.
from . import kql_q  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import streaming_q  # noqa: F401,E402
from . import reference  # noqa: F401,E402
from . import relational  # noqa: F401,E402

_FRONT = [
    # (0) round-6 additions (never driver-checked, newest first)
    "b44_zorder_skipping",
    "d28_cms_frequency",
    "d29_bigram_lm_perplexity",
    "d30_semantic_dedup",
    "d31_weighted_priority_sample",
    "d32_mixture_rebalance",
    "d33_shingle_containment_pairs",
    "d34_sq8_ann_topk",
    "b45_kmins_distinct_sketch",
    "b46_quantile_sketch_rollup",
    "s32_stream_minhash_dedup",
    "b47_bucketed_colocated_join",
    "d35_incremental_dedup",
    "d36_pagerank_centrality",
    "d37_retrieval_pipeline",
    "b48_multiformat_scan",
    # (1) never driver-checked: the 20 round-5 additions
    "b31_exists_subquery",
    "b32_scalar_correlated",
    "b33_in_subquery_having",
    "b34_not_in_null_aware",
    "b35_top_supplier_cte",
    "b36_unpivot_measures",
    "b37_salted_skew_join",
    "b38_range_interval_window",
    "b39_lateral_topn_per_group",
    "b40_grouping_sets",
    "b41_hll_sketch_rollup",
    "b42_variant_shred",
    "a18_custom_source_connector",
    "d26_bloom_prefilter_semi_join",
    "d27_freq_items_heavy_hitters",
    "mm5_audio_window_energy",
    "s28_stream_static_enrich",
    "s29_incremental_agg_view",
    "s30_change_data_feed",
    "s31_pipeline_over_custom_source",
    # (0b) late-round-6 additions (never driver-checked)
    "b49_sessionize_events",
    "b50_cohort_retention",
    "b51_gap_fill_locf",
    "b52_pivot_status_matrix",
    "b53_anomaly_zscore",
    "b54_pandas_grouped_median",
    "b55_grouped_map_normalize",
    "d38_knn_label_classify",
    "d39_event_transitions",
    "d40_length_percentile_filter",
    "d41_hash_bucket_sample",
    "s33_stream_left_outer_join",
    "d42_bm25_retrieval",
    "a19_point_in_time_lookup",
    # (2) stalest cohort: ZERO slots this round — the 50 never-checked
    # entries (round-6 additions + the 20 the r5 window missed) exactly
    # fill the window. The late-session additions b56-b58/d43-d46 and
    # the r2/r3 rotation cohort (k13-k23, d07, d16-d19, d04x, d06x…)
    # are first in line for round 7; policy unchanged — priority (1)
    # never-checked fills before rotation.
]


def _reorder() -> None:
    idx = {name: i for i, name in enumerate(REGISTRY)}

    def rank(name: str) -> tuple[int, int]:
        if name in _FRONT:
            return (0, _FRONT.index(name))
        fam = name[0]  # b=relational, a=reference, rest keep import order
        return ({"b": 1, "a": 2}.get(fam, 3), idx[name])

    snapshot = sorted(REGISTRY.items(), key=lambda kv: rank(kv[0]))
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder()

__all__ = ["REGISTRY", "Query", "queries", "oracles", "query"]
