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
# ROUND-8 WINDOW (this file's _FRONT, below): the first 50 of the 55
# entries never driver-checked as of CORRECTNESS_r07 — the 45-entry
# round-8 queue documented in round 7 PLUS the first 5 of the 10 late
# round-7 additions (b91, b92, d78, d79, d80). Verified against the
# union of CORRECTNESS_r01..r07 — none of these has a driver row in
# any round. All are green under the local oracle mirror at sf0.001
# (tests/test_oracle.py runs every entry).
#
# ROUND-9 QUEUE (in priority order; exact as of end-of-round-8 —
# verify against the union of CORRECTNESS_r01..r08 before committing):
#   1. the 5 round-8 overflow never-checked entries:
#      d81_calibration_audit, k55_kql_series_outliers,
#      k56_kql_basket, k57_kql_reduce_by, s45_stream_session_windows;
#   2. the 26 round-8 additions (all never driver-checked, build
#      order): k58_kql_mv_expand_typed, k59_kql_narrow,
#      s46_stream_exactly_once_sink, d82_motif_census,
#      b93_distributed_row_ids, mm9_goertzel_tone_power,
#      a22_snapshot_log_cutover, s47_stream_dedup_within_watermark,
#      d83_bpe_apply, b95_runtime_bloom_filter_join,
#      s48_stream_scd2_dimension, b94_bucketized_interval_join,
#      k60_kql_series_fir, b96_aqe_skew_join,
#      d84_content_defined_chunking, b97_argmin_supplier_join,
#      k61_kql_toscalar, k62_kql_extract_all, b98_top_session_paths,
#      a23_replication_lag_monitor, d85_ccnet_quality_buckets,
#      d86_cross_doc_chunk_dedup, b99_excess_stock_suppliers,
#      a24_dlq_repair_replay, d87_hashed_feature_classifier,
#      k63_kql_bin_at_percentiles;
#   3. (window now full at 50 with 1+2 = 31 entries + the first 19 of
#      the stalest rotation cohort) — newest driver row r2: k13, k14,
#      k15, k16, k17, k20, k21, k22, k23, d07, d16, d17, d18, d19
#      (14 entries), then r3: d04x, d06x, k24-k34, b13a…, until the
#      window fills.
# NOTE on the staleness ceiling: the policy aimed for "no entry's
# newest driver row more than ~3 rounds old", but with a 277+-entry
# registry and a 50-slot window the arithmetic floor is ~6 rounds;
# never-checked entries rightly pre-empt rotation. The r2 cohort above
# will be ~7 rounds stale when it rotates in during round 9 —
# accepted trade, documented here so the number isn't a surprise.
from . import kql_q  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import streaming_q  # noqa: F401,E402
from . import reference  # noqa: F401,E402
from . import relational  # noqa: F401,E402

_FRONT = [
    # Round-8 window: the first 50 of the 55 never-driver-checked
    # entries (as of CORRECTNESS_r07) in documented priority order.
    # Verified against the union of CORRECTNESS_r01..r07 — none of
    # these has a driver row in any round.
    # (1) the 45-entry round-8 queue documented in round 7
    "b80_merge_upsert_dsl",
    "b81_exact_correlation",
    "b82_expectations_audit",
    "b83_mode_per_group",
    "b84_scd2_dimension_merge",
    "b85_bitmap_distinct_at_rest",
    "b86_wilson_ranking",
    "b87_last_touch_attribution",
    "a20_schema_evolution_ingest",
    "a21_malformed_envelope_dlq",
    "k49_kql_shufflekey_hint",
    "k50_kql_join_strategy_hint",
    "k51_kql_conditional_agg_sweep",
    "k52_kql_bag_unpack",
    "k53_kql_series_stats",
    "mm6_multimodal_retrieval",
    "mm7_interleaved_packing",
    "mm8_vit_patchify",
    "d64_boilerplate_line_removal",
    "d65_auc_quality_score",
    "d66_dup_span_removal",
    "d67_retrieval_eval_metrics",
    "d68_luhn_pan_validation",
    "d69_logreg_quality_train",
    "d70_dsir_resample",
    "d71_k_anonymity_audit",
    "d72_hard_negative_mining",
    "d73_dataset_fingerprint",
    "s36_stream_partitioned_sink",
    "s37_hybrid_backfill_union",
    "s38_stream_window_topk",
    "s39_stream_quantile_monitor",
    "s40_stream_psi_drift",
    "s41_stream_expectations_audit",
    "s42_stream_bitmap_distinct",
    "d74_bitext_margin_mining",
    "d75_tokenizer_fertility",
    "d76_curation_pipeline",
    "d77_unimax_temperature_sample",
    "b88_welch_ttest",
    "b89_dynamic_partition_pruning",
    "b90_funnel_stages",
    "s43_stream_last_touch",
    "s44_stream_ab_monitor",
    "k54_kql_scan_funnel",
    # (2) the first 5 of the 10 late round-7 additions — window full
    # at 50; overflow (d81, k55-k57, s45) leads the round-9 queue
    # above.
    "b91_seasonal_decompose",
    "b92_sole_fault_supplier",
    "d78_jaro_winkler_linkage",
    "d79_mmr_diversified_retrieval",
    "d80_unicode_nfc_normalize",
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
