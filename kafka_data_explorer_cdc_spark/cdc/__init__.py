from .envelope import (
    ENVELOPE_SCHEMA,
    ORDERS_ROW_SCHEMA,
    parse_envelope,
    unwrap,
)
from .apply import latest_state, apply_cdc_batch

__all__ = [
    "ENVELOPE_SCHEMA",
    "ORDERS_ROW_SCHEMA",
    "parse_envelope",
    "unwrap",
    "latest_state",
    "apply_cdc_batch",
]
