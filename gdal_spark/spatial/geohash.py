"""Geohash encode (public Niemeyer 2008 spec; the PostGIS ``ST_GeoHash``
dialect surface, same family as the engine's S2/quadkey cell indexes).

A precision-P geohash is 5*P bits alternating longitude-first: bit 0
(most significant) is the top bit of the longitude fraction, bit 1 the
top bit of the latitude fraction, and so on; each 5-bit group maps into
the base-32 alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``.

Everything here is CLOSED-FORM integer column math (div/mod — no loops,
no UDF): the lon/lat fractions quantize to ceil(5P/2) / floor(5P/2) bit
integers, the interleave is a generated sum of shifted bit terms, and the
characters come from fixed substring lookups — one whole-stage-codegen
projection end to end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lon: Column, lat: Column, precision: int = 8) -> Column:
    """Geohash string of (lon, lat) at ``precision`` chars (<= 12)."""
    nbits = 5 * precision
    n_lon = (nbits + 1) // 2
    n_lat = nbits // 2
    li = F.floor((lon + 180.0) / 360.0 * float(1 << n_lon)).cast("long")
    la = F.floor((lat + 90.0) / 180.0 * float(1 << n_lat)).cast("long")
    li = F.least(F.greatest(li, F.lit(0)), F.lit((1 << n_lon) - 1))
    la = F.least(F.greatest(la, F.lit(0)), F.lit((1 << n_lat) - 1))
    v = F.lit(0).cast("long")
    for b in range(nbits):
        if b % 2 == 0:
            bit = (li.bitwiseAND(F.lit(1 << (n_lon - 1 - b // 2)))
                   != F.lit(0)).cast("long")
        else:
            bit = (la.bitwiseAND(F.lit(1 << (n_lat - 1 - b // 2)))
                   != F.lit(0)).cast("long")
        v = v + bit * F.lit(1 << (nbits - 1 - b))
    chars = [
        F.substring(
            F.lit(BASE32),
            (F.floor(v / F.lit(1 << (nbits - 5 * (g + 1)))) % 32 + 1
             ).cast("int"),
            1,
        )
        for g in range(precision)
    ]
    return F.concat(*chars)


def sql_geohash_parts(lon_sql: str, lat_sql: str,
                      precision: int = 8) -> tuple[str, str, str, str]:
    """The same encode as ANSI SQL fragments (DuckDB oracle) — built
    independently of the Column version: bits via // and %, characters
    via substring lookups.  Returns (li, la, v, gh) where ``v`` refers to
    columns named li/la and ``gh`` to a column named v, so the caller
    stages them through CTEs."""
    nbits = 5 * precision
    n_lon = (nbits + 1) // 2
    n_lat = nbits // 2
    li = (f"least(greatest(floor((({lon_sql}) + 180.0) / 360.0 "
          f"* {float(1 << n_lon)!r})::bigint, 0), {(1 << n_lon) - 1})")
    la = (f"least(greatest(floor((({lat_sql}) + 90.0) / 180.0 "
          f"* {float(1 << n_lat)!r})::bigint, 0), {(1 << n_lat) - 1})")
    terms = []
    for b in range(nbits):
        if b % 2 == 0:
            src, sh = "li", n_lon - 1 - b // 2
        else:
            src, sh = "la", n_lat - 1 - b // 2
        terms.append(f"(({src} // {1 << sh}) % 2) * {1 << (nbits - 1 - b)}")
    v = " + ".join(terms)
    chars = [
        f"substring('{BASE32}', "
        f"((v // {1 << (nbits - 5 * (g + 1))}) % 32 + 1)::int, 1)"
        for g in range(precision)
    ]
    return li, la, v, " || ".join(chars)
