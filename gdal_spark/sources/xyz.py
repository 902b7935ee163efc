"""XYZ ASCII gridded-raster driver — the PUBLIC one-line-per-cell text
format the reference reads in ``frmts/xyz/xyzdataset.cpp``.

Format: plain text, one ``x y z`` triple per line (whitespace separated,
optional header line).  The reference requires cells in scanline order and
infers the grid from coordinate deltas; this driver takes the grid's
origin/cellsize as explicit parameters instead (they are metadata the
caller always has) which makes BOTH directions order-free and therefore
fully splittable:

* **read**: ``spark.read.text`` (text splits — many tasks per large file),
  a JVM ``split``/``cast`` parse, and the (gx, gy) cell index recovered
  from the coordinates by pure column math.  No Python in the path, no
  ordering requirement: a 100 TB .xyz dump scans like CSV.
* **write**: ``format_string`` per cell (shortest-roundtrip decimals ride
  the text container exactly like the GeoJSON driver), one shard per
  partition via ``df.write.text``.

Cell convention: ``x = xll + (gx + 0.5) * cellsize`` (cell-center
coordinates, the reference's interpretation), top row first on write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_xyz(
    cells: DataFrame, directory: str,
    xll: float, yll_top: float, cellsize: float,
    gx: str = "gx", gy: str = "gy", val: str = "val",
) -> None:
    """Distributed .xyz sink over a (gx, gy, val) cell table — JVM-only
    concat, one text shard per partition."""
    x = F.lit(xll) + (F.col(gx).cast("double") + 0.5) * F.lit(cellsize)
    y = F.lit(yll_top) - (F.col(gy).cast("double") + 0.5) * F.lit(cellsize)
    lines = cells.select(
        F.concat_ws(
            " ",
            x.cast("string"), y.cast("string"),
            F.col(val).cast("string"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(directory)


def read_xyz(
    spark: SparkSession, directory: str,
    xll: float, yll_top: float, cellsize: float,
) -> DataFrame:
    """Distributed .xyz scan → (gx, gy, val): text splits + JVM split/cast;
    cell indices recovered by column math (floor of the offset), so tasks
    never need to see neighbouring lines."""
    raw = spark.read.text(f"{directory}")
    parts = F.split(F.trim(F.col("value")), r"\s+")
    x = F.element_at(parts, 1).cast("double")
    y = F.element_at(parts, 2).cast("double")
    v = F.element_at(parts, 3).cast("double")
    return (
        raw.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.floor((x - F.lit(xll)) / F.lit(cellsize)).alias("gx"),
            F.floor((F.lit(yll_top) - y) / F.lit(cellsize)).alias("gy"),
            v.alias("val"),
        )
    )
