"""Shared test helpers.

`fround_half_up` is THE quantization contract the oracle-parity
suites compare under: floor(x * 10^scale + 0.5) / 10^scale — the same
half-up rule functions/compat.fround applies engine-side. Defined
once here (ADVICE r9: it was duplicated verbatim in test_regression /
test_experiment / test_robust, three chances for the contract to
drift).
"""

from __future__ import annotations

import math


def fround_half_up(x, scale):
    """Half-up rounding of a float to ``scale`` decimals; None passes
    through (engine NULL columns)."""
    if x is None:
        return None
    s = 10.0 ** scale
    return math.floor(x * s + 0.5) / s
