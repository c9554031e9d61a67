"""Shared scalar numeric helpers.

``round_half_away`` is the driver-side twin of SQL ``round`` (ties go
AWAY from zero) — Python's built-in ``round`` uses banker's rounding and
silently diverges from every engine-side value at exact .5 boundaries.
The ndarray version lives in ``similarity._round6_half_away``; both
implement the same floor(|x|·s + 0.5)/s rule.
"""

from __future__ import annotations

import math


def round_half_away(x: float, digits: int) -> float:
    s = 10.0 ** digits
    if x >= 0:
        return math.floor(x * s + 0.5) / s
    return -math.floor(-x * s + 0.5) / s
