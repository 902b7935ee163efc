"""Deterministic synthetic pages + polygons tables (FIXTURES.md §1–§2).

The pages table matches BASELINE.json's input_hint shape exactly:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Everything is a pure function of (seed, row index) so oracles reproduce.
Generation is DISTRIBUTED: ``spark.range`` + column expressions + one
Arrow-batched pandas UDF for the html bytes — no driver-side loops, so the
same generator runs at 10^4 (tests) or 10^9 (cluster smoke) rows.

The html→text invariant: ``text == extract_text(html)`` byte-identical per
url (north rule). ``operators.text.extract_text`` is the single extractor
implementation; the generator builds html AROUND a known text so the
invariant is testable end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from gdal_spark.data.geotag import derived_lat, derived_lon
from gdal_spark.spatial import geometry as G

LANGS = ["en", "de", "fr", "es", "pt", "zh", "ru", "ja", "ar", "hi"]

# Deterministic word pool for body text (seeded once, module-level constant).
_WORDS = [
    "data", "spark", "tile", "mercator", "polygon", "join", "raster",
    "vector", "index", "shuffle", "batch", "arrow", "quadkey", "zoom",
    "page", "crawl", "engine", "kernel", "lineage", "checkpoint",
]


def body_text(i: int) -> str:
    """Deterministic 8..23-word body paragraph for row i."""
    n = 8 + (i * 7919) % 16
    return " ".join(_WORDS[(i * 31 + j * 17) % len(_WORDS)] for j in range(n))


def page_title(i: int) -> str:
    return f"T{i}"


def page_text(i: int) -> str:
    """The reference-extractor output: title + newline + paragraph text."""
    return page_title(i) + "\n" + body_text(i)


def page_html(i: int) -> bytes:
    return (
        f"<html><head><title>{page_title(i)}</title></head><body><p>"
        f"{body_text(i)}</p></body></html>"
    ).encode("utf-8")


def pages_df(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table of ``n_rows`` rows."""
    df = spark.range(0, n_rows, numPartitions=partitions).withColumnRenamed("id", "i")

    @F.pandas_udf(BinaryType())
    def gen_html(i: pd.Series) -> pd.Series:
        return i.map(lambda x: page_html(int(x)))

    @F.pandas_udf("string")
    def gen_text(i: pd.Series) -> pd.Series:
        return i.map(lambda x: page_text(int(x)))

    sha = F.sha1(F.concat(F.lit("42:"), F.col("i").cast("string")))
    return df.select(
        F.col("i"),
        F.concat(
            F.lit("https://site"),
            (F.col("i") % 1000).cast("string"),
            F.lit(".example/"),
            F.substring(sha, 1, 8),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.col("i").cast("double"))
        ).alias("warc_ts"),
        gen_html(F.col("i")).alias("html"),
        gen_text(F.col("i")).alias("text"),
        F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.col("i") % 10 + 1).cast("int")).alias("lang"),
        derived_lon(F.col("i")).alias("lon"),
        derived_lat(F.col("i")).alias("lat"),
    )


# ---------------------------------------------------------------------------
# Polygon dimension (FIXTURES.md §2): ~72 deterministic polygons — an 8×8
# rectangle mosaic over a window containing the hot cell, plus hexagons,
# concave shapes, one polygon with a hole, and 8 far-away anti-join polygons.
# ---------------------------------------------------------------------------

def _rect(x0, y0, x1, y1):
    return [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])]


def _hexagon(cx, cy, r):
    ang = np.linspace(0.0, 2.0 * np.pi, 7)  # closed, CCW
    return [np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)]


def _l_shape(x0, y0, w, h):
    # Concave L: big square minus the top-right quadrant.
    return [
        np.array(
            [
                [x0, y0], [x0 + w, y0], [x0 + w, y0 + h / 2],
                [x0 + w / 2, y0 + h / 2], [x0 + w / 2, y0 + h],
                [x0, y0 + h], [x0, y0],
            ]
        )
    ]


def polygon_records() -> list[dict]:
    """Deterministic polygon layer. eas_id values reproduce the DISTINCT /
    ORDER BY oracles of ogr_sql_test.py:190-232 ([168,169,166,158,165] on
    the first rows; full set has duplicates)."""
    eas_pool = [168, 169, 166, 158, 165, 170, 171, 172, 173, 174, 175, 176,
                177, 178, 179, 158, 165, 166]
    recs = []
    pid = 0
    # 8×8 mosaic over lon [-6, 10] × lat [42, 54] (contains hot cell 2.35/48.85).
    # Bounds at *.x3 offsets — never equal to the 1e-4-quantized page coords,
    # so strict-vs-closed boundary semantics can't flip a match.
    for gy in range(8):
        for gx in range(8):
            x0 = -6.00003 + gx * 2.0
            y0 = 42.00003 + gy * 1.5
            rings = _rect(x0, y0, x0 + 2.0, y0 + 1.5)
            recs.append(_rec(pid, eas_pool[pid % len(eas_pool)], rings))
            pid += 1
    # Hexagons, concave, hole, multipolygon parts (outside the mosaic window
    # so pip matches stay 1:1 per point).
    recs.append(_rec(pid, 180, _hexagon(20.0001, 20.0001, 3.0))); pid += 1
    recs.append(_rec(pid, 181, _l_shape(30.00003, 30.00003, 4.0, 4.0))); pid += 1
    hole = _rect(40.00003, 40.00003, 48.00003, 46.00003)[0]
    inner = _rect(42.00003, 42.00003, 44.00003, 44.00003)[0][::-1].copy()
    recs.append(_rec(pid, 182, [hole, inner])); pid += 1
    # 8 anti-join polygons far from every derived geotag (lat > 84 is outside
    # the generator's range).
    for j in range(8):
        recs.append(_rec(pid, 190 + j, _rect(-170.0 + j * 5, 84.2, -168.0 + j * 5, 84.8)))
        pid += 1
    return recs


def _rec(pid: int, eas_id: int, rings: list[np.ndarray]) -> dict:
    xmin, ymin, xmax, ymax = G.rings_envelope(rings)
    area = _shoelace(rings)
    return {
        "poly_id": pid,
        "eas_id": eas_id,
        "prfedea": f"35043411{pid:02d}",
        "area": area,
        "rings": [[list(map(float, pt)) for pt in ring] for ring in rings],
        "xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax,
        "wkb": bytearray(G.wkb_polygon(rings)),
        "srid": 4326,
    }


def _shoelace(rings: list[np.ndarray]) -> float:
    total = 0.0
    for k, ring in enumerate(rings):
        x, y = ring[:, 0], ring[:, 1]
        a = 0.5 * abs(float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])))
        total += a if k == 0 else -a
    return total


POLYGON_SCHEMA = (
    "poly_id long, eas_id long, prfedea string, area double, "
    "rings array<array<array<double>>>, "
    "xmin double, ymin double, xmax double, ymax double, wkb binary, srid int"
)


def polygons_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(polygon_records(), schema=POLYGON_SCHEMA)


# ---------------------------------------------------------------------------
# Second polygon layer (FIXTURES §2b): axis-aligned probe rectangles with
# engineered relations to the 8×8 mosaic — equals / within / contains /
# overlaps / edge-touch / corner-touch / disjoint — so polygon↔polygon
# predicate joins have a pure-SQL interval-arithmetic oracle (the engine
# side still runs the general ray-casting/orientation kernel).
# ---------------------------------------------------------------------------

def polygon_records_b() -> list[dict]:
    # Touch/equal coordinates MUST be bit-identical to the mosaic's computed
    # bounds — use the same float arithmetic (-6.00003 + gx*2.0 is NOT the
    # same double as the literal you'd write for it).
    mx = lambda gx: -6.00003 + gx * 2.0
    my = lambda gy: 42.00003 + gy * 1.5
    boxes = [
        # (x0, y0, x1, y1) — comments name the engineered relation vs mosaic
        (mx(2), my(2), mx(2) + 2.0, my(2) + 1.5),   # b0: equals cell (2, 2)
        (-5.5, 42.5, -5.0, 43.0),                   # b1: within cell (0, 0)
        (-6.5, 41.8, -1.9, 45.2),                   # b2: contains 4 cells + overlaps neighbours
        (-8.0, my(0), mx(0), my(1)),                # b3: edge-touch col 0 + corner-touch
        (-10.0, 40.0, mx(0), my(0)),                # b4: corner-touch cell (0,0) only
        (-5.0, 42.5, -3.0, 44.0),                   # b5: overlaps 4 cells
        (100.0, 0.0, 105.0, 5.0),                   # b6: disjoint
        (-7.0, 41.0, 11.0, 55.0),                   # b7: contains the whole mosaic
        (-6.5, 42.7, 9.5, 42.9),                    # b8: horizontal sliver over row 0
        (mx(1), 41.0, mx(2), my(0)),                # b9: partial-edge touch below cell (1,0)
    ]
    recs = []
    for j, (x0, y0, x1, y1) in enumerate(boxes):
        recs.append(_rec(1000 + j, 900 + j, _rect(x0, y0, x1, y1)))
    return recs


def polygons_b_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(polygon_records_b(), schema=POLYGON_SCHEMA)


# ---------------------------------------------------------------------------
# Third polygon layer (method layer C): GENERAL concave / holed polygons for
# the arbitrary-geometry overlay gates (ogrlayer.cpp:5386 Intersection
# against non-rect method geometry).  Every feature is RECTILINEAR and
# carries an exact disjoint-rectangle decomposition, so area(A ∩ C) has a
# pure interval-arithmetic SQL oracle (Σ pairwise rect overlaps) while the
# engine side runs the full noding + boundary-selection + trace kernel
# (spatial/overlay.py) on the ring arrays — it never sees the rects.
# Features are pairwise disjoint (so erase accounting is Σ of pairwise
# cuts) and avoid the hexagon's envelope (the one non-rectilinear A
# feature contributes no row on either side).
# ---------------------------------------------------------------------------

def _c_shapes() -> list[tuple[int, list, list]]:
    """(poly_id, CCW ring vertex lists, disjoint rect decomposition)."""
    mx = lambda gx: -6.00003 + gx * 2.0
    my = lambda gy: 42.00003 + gy * 1.5
    shapes = []
    # c0: plus/cross over mosaic cells around (-2.5, 47) — 12-gon, concave
    shapes.append((
        2000,
        [[(-2.5, 45.6), (-1.5, 45.6), (-1.5, 46.4), (-0.3, 46.4),
          (-0.3, 47.2), (-1.5, 47.2), (-1.5, 48.0), (-2.5, 48.0),
          (-2.5, 47.2), (-3.7, 47.2), (-3.7, 46.4), (-2.5, 46.4),
          (-2.5, 45.6)]],
        [(-2.5, 45.6, -1.5, 48.0), (-3.7, 46.4, -2.5, 47.2),
         (-1.5, 46.4, -0.3, 47.2)],
    ))
    # c1: U-shape (notch opens north) straddling mosaic columns
    shapes.append((
        2001,
        [[(4.0, 42.5), (7.0, 42.5), (7.0, 44.5), (6.0, 44.5), (6.0, 43.5),
          (5.0, 43.5), (5.0, 44.5), (4.0, 44.5), (4.0, 42.5)]],
        [(4.0, 42.5, 5.0, 44.5), (6.0, 42.5, 7.0, 44.5),
         (5.0, 42.5, 6.0, 43.5)],
    ))
    # c2: staircase, concave
    shapes.append((
        2002,
        [[(-5.0, 50.5), (-3.0, 50.5), (-3.0, 53.0), (-4.0, 53.0),
          (-4.0, 51.5), (-5.0, 51.5), (-5.0, 50.5)]],
        [(-5.0, 50.5, -4.0, 51.5), (-4.0, 50.5, -3.0, 53.0)],
    ))
    # c3: donut strictly inside mosaic cell (gx=6, gy=2) — holed method geom
    shapes.append((
        2003,
        [[(6.3, 45.2), (7.7, 45.2), (7.7, 46.2), (6.3, 46.2), (6.3, 45.2)],
         [(6.7, 45.5), (6.7, 45.9), (7.3, 45.9), (7.3, 45.5), (6.7, 45.5)]],
        [(6.3, 45.2, 6.7, 46.2), (7.3, 45.2, 7.7, 46.2),
         (6.7, 45.2, 7.3, 45.5), (6.7, 45.9, 7.3, 46.2)],
    ))
    # c4: L-shape overlapping A's L (poly 65) — concave ∩ concave
    shapes.append((
        2004,
        [[(31.0, 31.0), (35.0, 31.0), (35.0, 33.0), (33.0, 33.0),
          (33.0, 35.0), (31.0, 35.0), (31.0, 31.0)]],
        [(31.0, 31.0, 35.0, 33.0), (31.0, 33.0, 33.0, 35.0)],
    ))
    # c5: rect crossing A's donut hole boundary (poly 66) → C-shaped result
    shapes.append((
        2005,
        [[(40.5, 41.0), (42.5, 41.0), (42.5, 45.0), (40.5, 45.0),
          (40.5, 41.0)]],
        [(40.5, 41.0, 42.5, 45.0)],
    ))
    # c7: tall rect threading THROUGH the donut's hole (poly 66) → the
    # intersection is split into 2 disjoint parts (multi-part topology)
    shapes.append((
        2007,
        [[(42.6, 39.0), (43.6, 39.0), (43.6, 47.0), (42.6, 47.0),
          (42.6, 39.0)]],
        [(42.6, 39.0, 43.6, 47.0)],
    ))
    # c6: rect whose bottom edge is COLLINEAR with a mosaic row boundary
    # (bit-identical my(4) coordinate — shared-edge noding degeneracy)
    shapes.append((
        2006,
        [[(mx(4) - 1.0, my(4)), (mx(4) + 1.0, my(4)),
          (mx(4) + 1.0, my(4) + 0.8), (mx(4) - 1.0, my(4) + 0.8),
          (mx(4) - 1.0, my(4))]],
        [(mx(4) - 1.0, my(4), mx(4) + 1.0, my(4) + 0.8)],
    ))
    return shapes


def polygon_records_c() -> list[dict]:
    recs = []
    for pid, rings, _dec in _c_shapes():
        arrs = [np.array(r, dtype=np.float64) for r in rings]
        recs.append(_rec(pid, 1900 + (pid - 2000), arrs))
    return recs


def polygons_c_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(polygon_records_c(), schema=POLYGON_SCHEMA)


def polygon_c_decomp() -> list[tuple[int, float, float, float, float]]:
    """(poly_id, x0, y0, x1, y1) disjoint-rect decomposition of layer C."""
    return [
        (pid, *box) for pid, _r, dec in _c_shapes() for box in dec
    ]


def polygon_a_rect_decomp() -> list[tuple[int, float, float, float, float]]:
    """Disjoint-rect decomposition of the RECTILINEAR A features used by
    the general-overlay gates: the 8×8 mosaic (single rects), the L-shape
    (poly 65, two rects) and the donut (poly 66, four rects around the
    hole).  Literals reuse the exact fixture float arithmetic."""
    out = []
    for p in range(64):
        gx, gy = p % 8, p // 8
        x0 = -6.00003 + gx * 2.0
        y0 = 42.00003 + gy * 1.5
        out.append((p, x0, y0, x0 + 2.0, y0 + 1.5))
    x0 = y0 = 30.00003
    out.append((65, x0, y0, x0 + 4.0, y0 + 2.0))        # L bottom slab
    out.append((65, x0, y0 + 2.0, x0 + 2.0, y0 + 4.0))  # L top-left slab
    out += [
        (66, 40.00003, 40.00003, 42.00003, 46.00003),   # donut left
        (66, 44.00003, 40.00003, 48.00003, 46.00003),   # donut right
        (66, 42.00003, 40.00003, 44.00003, 42.00003),   # donut bottom
        (66, 42.00003, 44.00003, 44.00003, 46.00003),   # donut top
    ]
    return out


def tjunction_records() -> list[dict]:
    """NON-edge-matched coverage fixture (FIXTURES §2d): three dissolve
    groups whose shared boundaries are only PARTIALLY matched — every group
    contains at least one T-junction (a vertex of one polygon in the
    interior of a neighbour's edge), so plain edge cancellation fails and
    coverage noding (clean-coverage analog) is required.

      eas 501: wide rect over two half-width rects  → 4×4 square
               (area 16, 1 part, 1 ring)
      eas 502: U/notch of three rects               → area 7, 1 part, 1 ring
      eas 503: 4 rects ringing a unit hole          → area 8, 1 part, 2 rings
    """
    groups = [
        (501, [_rect(0, 2, 4, 4), _rect(0, 0, 2, 2), _rect(2, 0, 4, 2)]),
        (502, [_rect(0, 0, 3, 1), _rect(0, 1, 1, 3), _rect(1, 2, 3, 3)]),
        (503, [_rect(0, 0, 1, 3), _rect(1, 2, 3, 3), _rect(2, 0, 3, 2),
               _rect(1, 0, 2, 1)]),
    ]
    recs = []
    pid = 5000
    for eas, rect_list in groups:
        for rings in rect_list:
            recs.append(_rec(pid, eas, rings))
            pid += 1
    return recs


def tjunction_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(tjunction_records(), schema=POLYGON_SCHEMA)


# ---------------------------------------------------------------------------
# MultiPolygon layer (FIXTURES §2c): features whose geometry is a LIST of
# polygon parts — including a part with a hole — so the PIP path exercises
# the internal part explode (ogrmultipolygon → per-part ring tests,
# ogrcurvepolygon.cpp:810-867).
# ---------------------------------------------------------------------------

MULTIPOLYGON_SCHEMA = (
    "poly_id long, rings array<array<array<array<double>>>>, "
    "xmin double, ymin double, xmax double, ymax double"
)


def multipolygon_records() -> list[dict]:
    def part(x0, y0, x1, y1):
        return _rect(x0, y0, x1, y1)

    mp0 = [part(12.00003, 42.00003, 16.00003, 46.00003)[0],
           part(20.00003, 42.00003, 24.00003, 46.00003)[0]]
    hole_outer = part(-20.00003, 10.00003, -14.00003, 16.00003)[0]
    hole_inner = part(-18.00003, 12.00003, -16.00003, 14.00003)[0][::-1].copy()
    mp1_a = [hole_outer, hole_inner]
    mp1_b = part(-30.00003, 10.00003, -26.00003, 14.00003)
    recs = []
    for pid, parts in ((2000, [[p] for p in mp0]), (2001, [mp1_a, mp1_b[0:1]])):
        # feature envelope = union of the PART envelopes (rings_envelope is
        # exterior-ring-only by design; a flat ring list would reduce to the
        # first part's exterior and under-cover multi-part features)
        part_envs = [G.rings_envelope(prt) for prt in parts]
        xmin = min(e[0] for e in part_envs)
        ymin = min(e[1] for e in part_envs)
        xmax = max(e[2] for e in part_envs)
        ymax = max(e[3] for e in part_envs)
        recs.append(
            {
                "poly_id": pid,
                "rings": [
                    [[list(map(float, pt)) for pt in ring] for ring in prt]
                    for prt in parts
                ],
                "xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax,
            }
        )
    return recs


def multipolygons_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        multipolygon_records(), schema=MULTIPOLYGON_SCHEMA
    )


# ---------------------------------------------------------------------------
# Line layer (FIXTURES §2e): deterministic polylines over the 8×8 mosaic for
# line↔polygon predicate / clip gates.  Every coordinate is produced by
# plain Python float arithmetic, so the oracle VALUES literals are
# bit-identical doubles; the four touch lines start EXACTLY on a mosaic cell
# edge (same -6.00003 + gx*2.0 expression as the cells themselves).
# ---------------------------------------------------------------------------

def line_records() -> list[dict]:
    mx = lambda gx: -6.00003 + gx * 2.0   # noqa: E731 — mosaic bounds
    my = lambda gy: 42.00003 + gy * 1.5   # noqa: E731
    recs = []
    lid = 0
    # 24 irregular walks crossing the mosaic diagonally (6 vertices each).
    for k in range(24):
        x = -7.1 + (k % 8) * 0.77
        y = 41.3 + ((k * 37) % 29) * 0.31
        pts = [(x, y)]
        for j in range(5):
            x = x + 0.9 + ((k + j) % 3) * 0.4
            y = y + (((k * 7 + j * j * 5 + 3) % 13) - 6) * 0.35
            pts.append((x, y))
        recs.append({"line_id": lid, "coords": [[px, py] for px, py in pts]})
        lid += 1
    # 4 touch lines: endpoint EXACTLY on the vertical edge x = mx(t+1) of
    # cell (t, 1), extending east (into cell (t+1, 1)).
    for t in range(4):
        x0 = mx(t + 1)
        y0 = my(1) + 0.7
        recs.append({
            "line_id": lid,
            "coords": [[x0, y0], [x0 + 0.5, y0 + 0.2]],
        })
        lid += 1
    # 2 lines fully inside one cell (within).
    for t in range(2):
        x0 = mx(3 + t) + 0.3
        y0 = my(2 + t) + 0.2
        recs.append({
            "line_id": lid,
            "coords": [[x0, y0], [x0 + 0.4, y0 + 0.3], [x0 + 0.9, y0 + 0.1]],
        })
        lid += 1
    # 1 line fully outside the mosaic (disjoint from every cell).
    recs.append({
        "line_id": lid,
        "coords": [[60.0, 60.0], [61.0, 61.5], [62.0, 60.5]],
    })
    return recs


LINE_SCHEMA = "line_id long, coords array<array<double>>"


def lines_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(r["line_id"], r["coords"]) for r in line_records()],
        schema=LINE_SCHEMA,
    )


def gridline_records() -> list[dict]:
    """Straight 2-vertex lines (FIXTURES §2f): 6 horizontals + 6 verticals
    spanning the mosaic, engineered to cross the §2e walks many times —
    the line↔line intersection fixture."""
    recs = []
    lid = 100
    for k in range(6):
        y = 42.7 + k * 1.7
        recs.append({"line_id": lid,
                     "coords": [[-8.0, y], [12.0, y + 0.13]]})
        lid += 1
    for k in range(6):
        x = -5.3 + k * 2.9
        recs.append({"line_id": lid,
                     "coords": [[x, 41.0], [x + 0.11, 55.0]]})
        lid += 1
    return recs


def gridlines_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(r["line_id"], r["coords"]) for r in gridline_records()],
        schema=LINE_SCHEMA,
    )
