from .joins import null_safe_join, merge_upsert, merge_delete, polymorphic_resolve
from .sequence import assign_ids
from .dedup import dedup_keep_first
from .aggregates import sorted_string_agg, duplicate_groups, distribution_stats

__all__ = [
    "null_safe_join",
    "merge_upsert",
    "merge_delete",
    "polymorphic_resolve",
    "assign_ids",
    "dedup_keep_first",
    "sorted_string_agg",
    "duplicate_groups",
    "distribution_stats",
]
