from .joins import broadcast_lookup, first_match_left_join, range_join_bucketed
from .reconcile import reconcile

__all__ = [
    "broadcast_lookup",
    "first_match_left_join",
    "range_join_bucketed",
    "reconcile",
]
