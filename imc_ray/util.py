"""Small shared utilities."""

from __future__ import annotations

import numpy as np
import pandas as pd


def round_half_away(x, nd: int = 2):
    """Round half away from zero — DuckDB's ROUND semantics.  numpy/pandas
    round half-to-even, which flips oracle value-hashes exactly on .xxx5
    boundaries; every float that reaches a DuckDB-compared surface goes
    through this instead."""
    scale = 10.0 ** nd
    arr = np.asarray(x, dtype=np.float64)
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    if isinstance(x, pd.Series):
        return pd.Series(out, index=x.index, name=x.name)
    return out
