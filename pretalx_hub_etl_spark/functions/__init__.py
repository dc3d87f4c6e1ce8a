from .core import (
    falsy_coalesce,
    found_after_first,
    lowered_eq,
    plural_label,
    strict_map_lookup,
)

__all__ = [
    "falsy_coalesce",
    "found_after_first",
    "lowered_eq",
    "plural_label",
    "strict_map_lookup",
]
