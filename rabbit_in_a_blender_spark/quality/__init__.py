from .checks import check_result, is_required, fk_orphans, plausible_value_low, start_before_end

__all__ = [
    "check_result",
    "is_required",
    "fk_orphans",
    "plausible_value_low",
    "start_before_end",
]
