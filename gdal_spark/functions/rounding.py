"""Cross-engine stable rounding.

``round(x, d)`` is NOT portable across engines at half-way boundaries: Spark
uses BigDecimal HALF_UP on the double's full decimal expansion while DuckDB
rounds via scaled multiplication, so the same double can round to different
values (observed: 0.5007145… → 0.500715 vs 0.500714).

The fix: round as ``floor(x * 10^d + 0.5) / 10^d`` computed in plain double
arithmetic on every engine (Spark column, numpy, DuckDB SQL). Identical
input double → identical output double, bit-for-bit. Used for every float
column the driver's oracle gate hashes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column | str, d: int) -> Column:
    if isinstance(col, str):
        col = F.col(col)
    p = float(10 ** d)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def sql_stable_round(expr: str, d: int) -> str:
    p = float(10 ** d)
    return f"(floor(({expr}) * {p!r} + 0.5) / {p!r})"


def np_stable_round(x: np.ndarray, d: int) -> np.ndarray:
    p = float(10 ** d)
    return np.floor(x * p + 0.5) / p
