"""Small shared helpers."""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 4):
    """Round half away from zero — matches SQL ``round()`` (DuckDB),
    unlike numpy/pandas banker's rounding (0.03125 → 0.0313, not
    0.0312).  Used at every engine↔SQL comparison boundary."""
    a = np.asarray(x, dtype=np.float64)
    factor = 10.0**decimals
    return np.sign(a) * np.floor(np.abs(a) * factor + 0.5) / factor
