"""gdal_retile (swig/python/gdal-utils/osgeo_utils/gdal_retile.py
semantics): re-chunk a block raster into a NEW tile grid of a different
edge size — the pure re-blocking half of the retile utility (no
resampling; pixel values ride unchanged).

Spark-first plan (the 100 TB shape):

1. Each source block knows, in closed form, which destination tiles it
   overlaps — a map-only explode that SLICES the block's pixels into one
   piece per (src block x dst tile) intersection.  No join: the pixel
   data is already in the row.
2. One shuffle on the destination tile key moves every pixel exactly
   once (pieces, not full blocks — the halo-free working set).
3. Per-tile ``applyInPandas`` stitches the pieces with vectorized numpy
   placement and digests the assembled tile.

Contrast with a naive per-pixel explode + groupBy: this ships O(pieces)
rows (a few per block), not O(pixels) rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retile_blocks(
    src_blocks: DataFrame, src_block: int, width: int, height: int,
    dst_tile: int,
) -> DataFrame:
    """Re-tile a (bx, by, data) block raster (``src_block`` px edge,
    ``width`` x ``height`` px world) onto a ``dst_tile`` px grid.
    Output per destination tile: (tx, ty, n_px, val_sum, digest) with
    digest = md5 of comma-joined integer values in row-major order over
    the tile's VALID pixels (edge tiles are partial when dst_tile does
    not divide the world)."""
    ntx = -(-width // dst_tile)
    nty = -(-height // dst_tile)

    def slice_pieces(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                bx, by = int(r.bx), int(r.by)
                arr = np.asarray(r.data, dtype=np.float64).reshape(
                    src_block, src_block)
                px0, py0 = bx * src_block, by * src_block
                tx0, tx1 = px0 // dst_tile, (px0 + src_block - 1) // dst_tile
                ty0, ty1 = py0 // dst_tile, (py0 + src_block - 1) // dst_tile
                for ty in range(ty0, min(ty1, nty - 1) + 1):
                    for tx in range(tx0, min(tx1, ntx - 1) + 1):
                        gx0 = max(px0, tx * dst_tile)
                        gy0 = max(py0, ty * dst_tile)
                        gx1 = min(px0 + src_block, (tx + 1) * dst_tile,
                                  width)
                        gy1 = min(py0 + src_block, (ty + 1) * dst_tile,
                                  height)
                        if gx1 <= gx0 or gy1 <= gy0:
                            continue
                        piece = arr[gy0 - py0:gy1 - py0, gx0 - px0:gx1 - px0]
                        out.append({
                            "tx": tx, "ty": ty,
                            "x_off": gx0 - tx * dst_tile,
                            "y_off": gy0 - ty * dst_tile,
                            "w": gx1 - gx0, "h": gy1 - gy0,
                            "vals": piece.ravel(),
                        })
            yield pd.DataFrame(
                out,
                columns=["tx", "ty", "x_off", "y_off", "w", "h", "vals"],
            )

    pieces = src_blocks.mapInPandas(
        slice_pieces,
        "tx int, ty int, x_off int, y_off int, w int, h int, "
        "vals array<double>",
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tx"].iloc[0])
        ty = int(pdf["ty"].iloc[0])
        tw = min(dst_tile, width - tx * dst_tile)
        th = min(dst_tile, height - ty * dst_tile)
        tile = np.full((th, tw), np.nan)
        for r in pdf.itertuples():
            tile[
                int(r.y_off):int(r.y_off) + int(r.h),
                int(r.x_off):int(r.x_off) + int(r.w),
            ] = np.asarray(r.vals, dtype=np.float64).reshape(
                int(r.h), int(r.w))
        if np.isnan(tile).any():
            raise RuntimeError(
                f"tile ({tx},{ty}): {int(np.isnan(tile).sum())} px missing")
        flat = tile.astype(np.int64).ravel()
        digest = hashlib.md5(
            ",".join(str(int(v)) for v in flat).encode()
        ).hexdigest()
        return pd.DataFrame([{
            "tx": tx, "ty": ty, "n_px": int(flat.shape[0]),
            "val_sum": int(flat.sum()), "digest": digest,
        }])

    return pieces.groupBy("tx", "ty").applyInPandas(
        assemble, "tx int, ty int, n_px long, val_sum long, digest string"
    )
