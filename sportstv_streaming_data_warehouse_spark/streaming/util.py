"""Small shared helpers for the streaming tier."""

from __future__ import annotations

_MS_PER = {
    "day": 86_400_000, "days": 86_400_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "minute": 60_000, "minutes": 60_000,
    "second": 1_000, "seconds": 1_000,
}


def duration_ms(text: str) -> int:
    """Parse "N days|hours|minutes|seconds" to milliseconds — the same
    grammar Spark's withWatermark/CalendarInterval accepts for the
    subset the streaming modules use (state TTLs, watermark delays)."""
    n, unit = text.split()
    return int(n) * _MS_PER[unit]
