"""Query inventory package — importing this module populates the registry."""

from .registry import REGISTRY, Query, oracles, queries, query  # noqa: F401

# Each module registers its queries at import time. Registration order
# is driver-execution order, and the driver checks only the FIRST 50
# registry entries per round — so each round fronts the entries with
# the weakest driver evidence. Round 5: (a) the 6 formerly-no_oracle
# approximate entries, now bounded-comparison GATES (VERDICT r4 #1) —
# first-ever hash rows, (b) the round-5 additions (new registry
# entries land here as they are built), (c) b27x whose gate was
# rewritten to the GK rank-error contract this round, then entries
# whose only green is the oldest (r01-window) driver rows.
from . import kql_q  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import streaming_q  # noqa: F401,E402
from . import reference  # noqa: F401,E402
from . import relational  # noqa: F401,E402

_FRONT = [
    # (a) formerly-no_oracle approx entries, now gates — first hash rows
    "d04_minhash_lsh_pairs",
    "d06_simhash_near_pairs",
    "d07x_lsh_cosine_topk",
    "d07y_ivf_cosine_topk",
    "d07z_blocked_cosine_topk",
    "d07v_pq_cosine_topk",
    # (b) round-5 additions (appended as built)
    "d07u_pq_codes_topk",
    "d07t_ivfpq_topk",
    "k43_kql_top_by_expr",
    "k44_kql_count_and_distinct_star",
    "k45_kql_find",
    # (c) gate rewritten this round (GK rank-error contract)
    "b27x_percentiles_approx",
    # (d) entries whose newest green is the r01 driver window
    "d01_exact_dedup_groups",
    "d02_dedup_keep_first",
    "d03_minhash_portable",
    "d05_ngram_jaccard_pairs",
    "d08_embedding_near_dup",
    "d09_doc_fingerprint",
    "d10_token_stats",
    "d11_quality_score",
    "d12_langid",
    "d13_tfidf_top_terms",
    "d14_bigram_freq",
    "d15_training_pipeline",
    "mm1_binary_stats",
    "mm2_image_decode_stub",
    "mm3_frame_sample",
    "mm4_pandas_udf_score",
    "a08_order_generator",
    "a09_envelope_unwrap",
    "a10_jsonpath_mapping",
    "a11_source_table_filter",
    "a13_recent_orders_topk",
    "a14_avg_sales_by_city",
    "a15_total_sales_by_city",
    "b01_scan_region",
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
