from .usagi import USAGI_SCHEMA, read_usagi_csv, approved_mappings, apply_usagi, duplicate_mappings
from .swap import swap_merge, apply_pk_swap, apply_fk_swaps
from .custom_concepts import (
    CUSTOM_CONCEPT_OFFSET,
    assign_custom_concept_ids,
    validate_custom_concepts,
    duplicate_concept_codes,
)
from .events import discover_event_tables, resolve_event_columns

__all__ = [
    "USAGI_SCHEMA",
    "read_usagi_csv",
    "approved_mappings",
    "apply_usagi",
    "duplicate_mappings",
    "swap_merge",
    "apply_pk_swap",
    "apply_fk_swaps",
    "CUSTOM_CONCEPT_OFFSET",
    "assign_custom_concept_ids",
    "validate_custom_concepts",
    "duplicate_concept_codes",
    "discover_event_tables",
    "resolve_event_columns",
]
