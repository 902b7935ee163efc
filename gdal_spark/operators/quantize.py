"""Color quantization: median-cut palette (rgb2pct), ordered Bayer dither,
Floyd-Steinberg error diffusion (pct application).

Reference semantics: ``alg/gdalmediancut.cpp`` (GDALComputeMedianCutPCT —
5-bit/channel histogram, split the box with the most pixels along its
longest axis at the median, palette entry = box mean) and
``alg/gdaldither.cpp`` (GDALDitherRGB2PCT — Floyd-Steinberg serpentine-free
error diffusion).  Re-derived from the published algorithms (Heckbert 1982;
Floyd & Steinberg 1976) as Spark-first plans — no code is taken from the
reference.

Scale design:

* The median-cut HISTOGRAM is the distributed step: one groupBy on the
  15-bit reduced color key (<= 32768 groups regardless of image size — the
  same reduction GDAL applies to bound its in-memory histogram), partial
  aggregation map-side.  The cut itself runs driver-side over <= 32768
  weighted colors (bounded, data-size independent) and the palette is
  broadcast back; index assignment is a map-only argmin over n_colors
  literals in whole-stage codegen.
* Ordered (Bayer) dithering is embarrassingly parallel — pure column math
  on (x, y, value), the dither that is CORRECT to run tiled at 100 TB.
* Floyd-Steinberg error diffusion is inherently serial in scan order, so it
  runs per-image via applyInPandas (parallel ACROSS images, faithful
  serial semantics within one image) — the honest distributed contract for
  a sequential kernel; tile-parallel FS would change results at seams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 4x4 Bayer index matrix (standard dispersed-dot ordered dither).
BAYER4 = [
    [0, 8, 2, 10],
    [12, 4, 14, 6],
    [3, 11, 1, 9],
    [15, 7, 13, 5],
]


# ---------------------------------------------------------------------------
# Median cut (driver-side, over the <=32768-entry reduced histogram)
# ---------------------------------------------------------------------------

def median_cut(
    colors: np.ndarray, counts: np.ndarray, n_colors: int
) -> np.ndarray:
    """Heckbert median cut over a weighted color set.

    colors: (n, 3) ints; counts: (n,) weights.  Deterministic: always split
    the box with the largest pixel count along its longest axis (ties:
    lowest axis index) at the weighted median of that channel; palette
    entry = weighted channel mean of the box, rounded half-up.  Returns
    (n_colors, 3) uint8 (fewer rows when the image has fewer colors)."""
    order = np.lexsort((colors[:, 2], colors[:, 1], colors[:, 0]))
    colors = colors[order]
    counts = counts[order]
    boxes = [np.arange(len(colors))]
    while len(boxes) < n_colors:
        # pick the splittable box with the most pixels
        weights = [
            counts[b].sum() if len(np.unique(colors[b], axis=0)) > 1 else -1
            for b in boxes
        ]
        pick = int(np.argmax(weights))
        if weights[pick] < 0:
            break  # nothing splittable: fewer distinct colors than requested
        b = boxes[pick]
        spans = colors[b].max(axis=0) - colors[b].min(axis=0)
        axis = int(np.argmax(spans))  # ties -> lowest axis
        sub = b[np.argsort(colors[b, axis], kind="stable")]
        cum = np.cumsum(counts[sub])
        half = cum[-1] / 2.0
        cut = int(np.searchsorted(cum, half, side="left")) + 1
        cut = min(max(cut, 1), len(sub) - 1)
        boxes[pick] = sub[:cut]
        boxes.append(sub[cut:])
    pal = []
    for b in boxes:
        w = counts[b].astype(np.float64)
        mean = (colors[b] * w[:, None]).sum(axis=0) / w.sum()
        pal.append(np.floor(mean + 0.5).astype(np.int64))
    pal = np.array(pal, dtype=np.int64)
    # deterministic palette order: by (r, g, b)
    pal = pal[np.lexsort((pal[:, 2], pal[:, 1], pal[:, 0]))]
    return np.clip(pal, 0, 255).astype(np.uint8)


def compute_median_cut_palette(
    pixels: DataFrame, n_colors: int = 16,
    r: str = "r", g: str = "g", b: str = "b",
) -> np.ndarray:
    """Distributed histogram (5-bit/channel reduction, <=32768 groups) →
    driver-side median cut.  The reduced-histogram colors are the bin
    CENTERS (GDAL: (v >> 3 << 3) + 4) so the palette lands mid-bin."""
    hist = (
        pixels.groupBy(
            (F.col(r).cast("long") / 8).cast("long").alias("_rb"),
            (F.col(g).cast("long") / 8).cast("long").alias("_gb"),
            (F.col(b).cast("long") / 8).cast("long").alias("_bb"),
        )
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    rows = sorted((h["_rb"], h["_gb"], h["_bb"], h["_n"]) for h in hist)
    colors = np.array([[rr * 8 + 4, gg * 8 + 4, bb * 8 + 4]
                       for rr, gg, bb, _ in rows], dtype=np.int64)
    counts = np.array([n for _, _, _, n in rows], dtype=np.int64)
    return median_cut(colors, counts, n_colors)


def assign_palette_index(
    pixels: DataFrame, palette: np.ndarray,
    r: str = "r", g: str = "g", b: str = "b",
) -> DataFrame:
    """Map-only nearest-palette assignment: argmin of squared RGB distance
    over the broadcast palette literals (ties → lowest palette index).
    Adds columns: pct_idx, pr, pg, pb."""
    dists = F.array(*[
        (F.col(r) - int(pr)) * (F.col(r) - int(pr))
        + (F.col(g) - int(pg)) * (F.col(g) - int(pg))
        + (F.col(b) - int(pb)) * (F.col(b) - int(pb))
        for pr, pg, pb in palette
    ])
    idx = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    out = pixels.withColumn("pct_idx", idx)
    pr = F.element_at(
        F.array(*[F.lit(int(c[0])) for c in palette]), F.col("pct_idx") + 1)
    pg = F.element_at(
        F.array(*[F.lit(int(c[1])) for c in palette]), F.col("pct_idx") + 1)
    pb = F.element_at(
        F.array(*[F.lit(int(c[2])) for c in palette]), F.col("pct_idx") + 1)
    return (
        out.withColumn("pr", pr.cast("long"))
        .withColumn("pg", pg.cast("long"))
        .withColumn("pb", pb.cast("long"))
    )


def sql_palette_assign(palette: np.ndarray, r: str, g: str, b: str) -> dict:
    """DuckDB twins of assign_palette_index: {'pct_idx','pr','pg','pb'}."""
    dist_list = "[" + ", ".join(
        f"(({r}) - {int(pr)}) * (({r}) - {int(pr)}) "
        f"+ (({g}) - {int(pg)}) * (({g}) - {int(pg)}) "
        f"+ (({b}) - {int(pb)}) * (({b}) - {int(pb)})"
        for pr, pg, pb in palette
    ) + "]"
    idx = f"(list_position({dist_list}, list_min({dist_list})) - 1)"
    out = {"pct_idx": f"{idx}::int"}
    for name, ch in (("pr", 0), ("pg", 1), ("pb", 2)):
        arr = "[" + ", ".join(str(int(c[ch])) for c in palette) + "]"
        out[name] = f"(({arr})[({idx}) + 1])::bigint"
    return out


# ---------------------------------------------------------------------------
# Ordered (Bayer) dither — column math, the tile-safe dither
# ---------------------------------------------------------------------------

def bayer_level(v, x, y, levels: int = 6):
    """Quantize v∈[0,255] to `levels` levels with 4×4 Bayer thresholding:
    level = min(levels-1, floor(v·(levels-1)/255 + (M[y%4][x%4]+0.5)/16)).
    Pure Column math; bit-identical in DuckDB (same double ops)."""
    flat = [BAYER4[j][i] for j in range(4) for i in range(4)]
    m = F.element_at(
        F.array(*[F.lit(t) for t in flat]),
        ((y % 4) * 4 + (x % 4) + 1).cast("int"),
    )
    t = (m.cast("double") + F.lit(0.5)) / F.lit(16.0)
    lv = F.floor(
        v.cast("double") * F.lit(float(levels - 1)) / F.lit(255.0) + t
    ).cast("long")
    return F.least(F.lit(levels - 1), lv)


def sql_bayer_level(v: str, x: str, y: str, levels: int = 6) -> str:
    flat = [BAYER4[j][i] for j in range(4) for i in range(4)]
    arr = "[" + ", ".join(str(t) for t in flat) + "]"
    m = f"({arr})[((({y}) % 4) * 4 + (({x}) % 4)) + 1]"
    t = f"(({m})::double + 0.5) / 16.0"
    lv = f"floor(({v})::double * {float(levels - 1)!r} / 255.0 + ({t}))::bigint"
    return f"least({levels - 1}, {lv})"


# ---------------------------------------------------------------------------
# Floyd-Steinberg error diffusion — per-image applyInPandas
# ---------------------------------------------------------------------------

def floyd_steinberg_reference(
    img: np.ndarray, palette: np.ndarray
) -> np.ndarray:
    """Serial FS reference on an (H, W, 3) float array → (H, W) palette
    indices.  Error kernel 7/16 → E, 3/16 → SW, 5/16 → S, 1/16 → SE
    (Floyd & Steinberg 1976), clamped accumulation like gdaldither.cpp."""
    h, w, _ = img.shape
    acc = img.astype(np.float64).copy()
    out = np.zeros((h, w), dtype=np.int64)
    pal = palette.astype(np.float64)
    for y in range(h):
        for x in range(w):
            px = np.clip(acc[y, x], 0.0, 255.0)
            d = ((pal - px) ** 2).sum(axis=1)
            k = int(np.argmin(d))  # first minimum → lowest index
            out[y, x] = k
            err = px - pal[k]
            if x + 1 < w:
                acc[y, x + 1] += err * (7.0 / 16.0)
            if y + 1 < h:
                if x > 0:
                    acc[y + 1, x - 1] += err * (3.0 / 16.0)
                acc[y + 1, x] += err * (5.0 / 16.0)
                if x + 1 < w:
                    acc[y + 1, x + 1] += err * (1.0 / 16.0)
    return out


def dither_fs(
    pixels: DataFrame, palette: np.ndarray,
    image_col: str = "image_id", x_col: str = "x", y_col: str = "y",
    r: str = "r", g: str = "g", b: str = "b",
) -> DataFrame:
    """Distributed FS: groupBy(image) → one pandas batch per image running
    the faithful serial diffusion.  Parallel across images/bands of a
    mosaic; within one image the scan order is exact GDAL semantics (a
    tile-parallel FS would diverge at tile seams)."""
    pal = palette.astype(np.float64)

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([y_col, x_col])
        h = int(pdf[y_col].max()) + 1
        w = int(pdf[x_col].max()) + 1
        img = np.zeros((h, w, 3), dtype=np.float64)
        img[pdf[y_col].to_numpy(), pdf[x_col].to_numpy(), 0] = pdf[r]
        img[pdf[y_col].to_numpy(), pdf[x_col].to_numpy(), 1] = pdf[g]
        img[pdf[y_col].to_numpy(), pdf[x_col].to_numpy(), 2] = pdf[b]
        idx = floyd_steinberg_reference(img, pal)
        pdf = pdf.copy()
        pdf["pct_idx"] = idx[pdf[y_col].to_numpy(), pdf[x_col].to_numpy()]
        return pdf[[image_col, x_col, y_col, "pct_idx"]]

    schema = f"{image_col} long, {x_col} long, {y_col} long, pct_idx long"
    return pixels.groupBy(image_col).applyInPandas(_one, schema=schema)


def pct2rgb(indexed: DataFrame, palette: np.ndarray,
            idx_col: str = "pct_idx") -> DataFrame:
    """Palette expansion (``swig/python/gdal-utils/.../pct2rgb.py``
    semantics: paletted band + color table -> 3 RGB bands).  The color
    table is <= 256 entries by format contract, so each channel is a
    map-only ``element_at`` over an array LITERAL — whole-stage codegen,
    zero shuffle, the exact inverse of ``assign_palette_index``."""
    pal = np.asarray(palette, dtype=np.int64)
    chans = {}
    for ci, name in enumerate(("r", "g", "b")):
        arr = F.array(*[F.lit(int(v)) for v in pal[:, ci]])
        chans[name] = F.element_at(arr, F.col(idx_col).cast("int") + 1)
    return indexed.withColumns({k: v.alias(k) for k, v in chans.items()})
