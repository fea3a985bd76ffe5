"""SQL-compatible rounding. DuckDB's ROUND(double, d) rounds half away from
zero; numpy/Arrow default to half-to-even — on columns with exact .xx5 values
(prices × round discounts) the two differ by one cent and break oracle value
hashes. Every float column that leaves a pipeline goes through these."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def round_pa(arr, ndigits: int):
    return pc.round(arr, ndigits=ndigits, round_mode="half_towards_infinity")


def round_np(x, ndigits: int):
    x = np.asarray(x, dtype=np.float64)
    s = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s
