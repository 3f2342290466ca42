"""Query inventory package — importing this module populates the registry."""

from .registry import REGISTRY, Query, oracles, queries, query  # noqa: F401

# Each module registers its queries at import time.
from . import reference  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import streaming_q  # noqa: F401,E402
from . import kql_q  # noqa: F401,E402

__all__ = ["REGISTRY", "Query", "queries", "oracles", "query"]
