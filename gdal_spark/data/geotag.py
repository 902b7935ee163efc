"""Deterministic geotag derivation — the engine/oracle shared rule.

The north rule's input table (url, warc_ts, html, text, lang) carries no
coordinates; geotags are DERIVED deterministically (FIXTURES.md §1). For the
driver-verified queries we derive (lon, lat) from the integer row key with
pure integer arithmetic so that Spark and DuckDB compute bit-identical
doubles:

    lon = ((id * 9973 + 12345) % 3600000) / 10000.0 - 180.0        ∈ [-180, 180)
    lat = ((id * 6151 + 54321) % 1660000) / 10000.0 - 83.0         ∈ [-83, 83)

(quantized to 1e-4 degrees, comfortably inside the WebMercator validity
domain ±85.05° — gdal2tiles.py:423-431).

Skew rule (FIXTURES.md §1): every 100th row is teleported to one hot cell
(Paris, 2.35/48.85 + <1e-3° jitter) to exercise salting at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HOT_LON = 2.35
HOT_LAT = 48.85


def derived_lon(id_col: Column) -> Column:
    base = ((id_col * F.lit(9973) + F.lit(12345)) % F.lit(3600000)) / F.lit(10000.0) - F.lit(180.0)
    hot = F.lit(HOT_LON) + (id_col % F.lit(7)).cast("double") * F.lit(1e-4)
    return F.when(id_col % F.lit(100) == F.lit(0), hot).otherwise(base)


def derived_lat(id_col: Column) -> Column:
    base = ((id_col * F.lit(6151) + F.lit(54321)) % F.lit(1660000)) / F.lit(10000.0) - F.lit(83.0)
    hot = F.lit(HOT_LAT) + (id_col % F.lit(5)).cast("double") * F.lit(1e-4)
    return F.when(id_col % F.lit(100) == F.lit(0), hot).otherwise(base)


def sql_lon(id_expr: str) -> str:
    return (
        f"(case when ({id_expr}) % 100 = 0 "
        f"then {HOT_LON!r} + cast(({id_expr}) % 7 as double) * 1e-4 "
        f"else (({id_expr}) * 9973 + 12345) % 3600000 / 10000.0 - 180.0 end)"
    )


def sql_lat(id_expr: str) -> str:
    return (
        f"(case when ({id_expr}) % 100 = 0 "
        f"then {HOT_LAT!r} + cast(({id_expr}) % 5 as double) * 1e-4 "
        f"else (({id_expr}) * 6151 + 54321) % 1660000 / 10000.0 - 83.0 end)"
    )


def py_lonlat(i: int) -> tuple[float, float]:
    if i % 100 == 0:
        return HOT_LON + (i % 7) * 1e-4, HOT_LAT + (i % 5) * 1e-4
    return (
        (i * 9973 + 12345) % 3600000 / 10000.0 - 180.0,
        (i * 6151 + 54321) % 1660000 / 10000.0 - 83.0,
    )
