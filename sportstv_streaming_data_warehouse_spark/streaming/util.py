"""Small shared helpers for the streaming tier."""

from __future__ import annotations

_MS_PER = {
    "day": 86_400_000, "days": 86_400_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "minute": 60_000, "minutes": 60_000,
    "second": 1_000, "seconds": 1_000,
}


def duration_ms(text: str) -> int:
    """Parse "N days|hours|minutes|seconds" to milliseconds — the
    subset of Spark's withWatermark/CalendarInterval grammar the
    streaming modules use (state TTLs, watermark delays). Inputs
    outside the four-unit grammar (e.g. "2 weeks", "30d") fail with a
    ValueError naming the accepted units rather than a bare
    KeyError/ValueError (round-7 advisor finding — these reach users
    through the state_ttl parameters)."""
    parts = text.split()
    if len(parts) == 2 and parts[1] in _MS_PER:
        try:
            return int(parts[0]) * _MS_PER[parts[1]]
        except ValueError:
            pass
    raise ValueError(
        f"unsupported duration {text!r}; use 'N days|hours|minutes|seconds'"
    )
