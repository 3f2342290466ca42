"""Query inventory package — importing this module populates the registry."""

from .registry import REGISTRY, Query, oracles, queries, query  # noqa: F401

# Each module registers its queries at import time. Registration order
# is driver-execution order: round 1's correctness run stopped after the
# 50th registry entry, leaving the tail (KQL, streaming, multimodal,
# text-analysis) without driver rows — so the families that have never
# been driver-verified register FIRST, and the round-1-green families
# (reference, relational) last.
from . import kql_q  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import streaming_q  # noqa: F401,E402
from . import reference  # noqa: F401,E402
from . import relational  # noqa: F401,E402

__all__ = ["REGISTRY", "Query", "queries", "oracles", "query"]
