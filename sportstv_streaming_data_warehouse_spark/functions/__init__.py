from .calendar import (
    CALENDAR_COLS,
    date_spine,
    date_spine_from_bounds,
    with_calendar_keys,
)
from .display import format_display, format_pct
from .inference import infer_with_precedence

__all__ = [
    "CALENDAR_COLS",
    "date_spine",
    "date_spine_from_bounds",
    "format_display",
    "format_pct",
    "infer_with_precedence",
    "with_calendar_keys",
]
