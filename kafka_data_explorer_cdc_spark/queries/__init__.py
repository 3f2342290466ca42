"""Query inventory package — importing this module populates the registry."""

from .registry import REGISTRY, Query, oracles, queries, query  # noqa: F401

# Each module registers its queries at import time. Registration order
# is driver-execution order, and the driver checks only the FIRST 50
# registry entries per round — so each round fronts the entries with
# the weakest driver evidence. Round 3: (a) the entries that have
# never had a green driver row (b27x never checked, b28 errored in
# r01, d08 returned 0 rows in r02 — now oracle-backed), then (b) the
# relational + reference families (green in r01, rotated out of r02's
# window), then the r02-green tail (KQL, LLM, streaming).
from . import kql_q  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import streaming_q  # noqa: F401,E402
from . import reference  # noqa: F401,E402
from . import relational  # noqa: F401,E402

_FRONT = [
    "b27x_percentiles_approx",
    "b28_collect_sorted_list",
    "d08_embedding_near_dup",
    "k24_kql_join",  # new in r3 — never driver-checked
    "k25_kql_let",  # new in r3 — never driver-checked
    "k26_kql_parse_extract",
    "k27_kql_case_tiers",
    "k28_kql_arg_max",
    "k29_kql_make_set",
    "k30_kql_percentile",
    "k31_kql_make_series",
    "k32_kql_top_nested",
    "k33_kql_lookup",  # new in r3 — never driver-checked
    "k34_kql_mv_apply",
    "k35_kql_pivot",
    "k36_kql_top_hitters",
    "k37_kql_search",
    "k38_kql_range_source",
    "k39_kql_scalar_strings",
    "k40_kql_datetime_scalars",
    "k41_kql_serialized_windows",
    "k42_kql_parse_where",
    "d04x_minhash_lsh_portable",
    "d06x_simhash_portable",
    "d07w_lsh_cosine_portable",
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
