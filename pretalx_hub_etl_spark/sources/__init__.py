from .json_doc import SCHEDULE_SCHEMA, fixture_schedule, normalize_schedule
from .paginated import n_pages_for, read_paginated

__all__ = [
    "SCHEDULE_SCHEMA",
    "fixture_schedule",
    "normalize_schedule",
    "n_pages_for",
    "read_paginated",
]
