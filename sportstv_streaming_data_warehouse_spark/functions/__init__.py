from .calendar import with_calendar_keys, date_spine, CALENDAR_COLS
from .inference import infer_with_precedence

__all__ = [
    "with_calendar_keys",
    "date_spine",
    "CALENDAR_COLS",
    "infer_with_precedence",
]
