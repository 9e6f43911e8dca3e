"""Duration / timestamp parsing for the query API layer.

Reference parity: /root/reference/src/web.rs:30-141 (T7 in SURVEY.md §2.3).
Durations are either a plain float number of seconds or a concatenation of
``(\\d+)(ms|s|m|h|d|w|y)`` units, e.g. ``1h2m1s500ms`` = 3721.5 s.
Timestamps are epoch floats or RFC3339 strings.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

_UNIT_SECONDS = {
    "ms": 0.001,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
    "d": 86400.0,
    "w": 7.0 * 86400.0,
    "y": 365.0 * 86400.0,  # src/web.rs:44-54: y = 365 d, w = 7 d
}

_UNIT_RE = re.compile(r"(\d+)(ms|s|m|h|d|w|y)")


def parse_duration(text: str) -> float:
    """Parse a PromQL-ish duration into float seconds (src/web.rs:30-101).

    Accepts a bare float ("90", "1.5") or concatenated integer-unit pairs
    ("1h2m1s500ms"). Raises ValueError on anything else (e.g. "1..5", "1x",
    "1s3" — pinned invalid by src/web.rs:184-215 tests).
    """
    text = text.strip()
    if not text:
        raise ValueError("empty duration")
    try:
        return float(text)
    except ValueError:
        pass
    pos = 0
    total = 0.0
    for m in _UNIT_RE.finditer(text):
        if m.start() != pos:
            raise ValueError(f"invalid duration {text!r}")
        total += int(m.group(1)) * _UNIT_SECONDS[m.group(2)]
        pos = m.end()
    if pos != len(text):
        raise ValueError(f"invalid duration {text!r}")
    return total


def parse_timestamp(text: str) -> float:
    """Parse an epoch float or RFC3339 timestamp into epoch seconds
    (src/web.rs:103-141)."""
    text = text.strip()
    try:
        return float(text)
    except ValueError:
        pass
    iso = text[:-1] + "+00:00" if text.endswith(("Z", "z")) else text
    dt = datetime.fromisoformat(iso)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp()
