"""gdal_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query semantics of GDAL 3.14.0 (reference at /root/reference,
survey in SURVEY.md) as idiomatic Spark: DataFrame/SQL column math for tile
indexing, broadcast + vectorized numpy kernels (Arrow pandas UDFs) for exact
geometry predicates, cell-key equi-joins for spatial joins, and native Catalyst
optimization (pushdown, pruning, AQE) everywhere else.

Design stance (SURVEY.md §7):
  * geometry  = WKB BinaryType + exploded ring arrays + bbox struct columns
  * cell keys = XYZ/WebMercator tiles + quadkeys (exact gdal2tiles math)
  * kernels   = numpy over Arrow batches, never per-row Python
  * joins     = broadcast bbox-grid (small dim) or cell equi-join (large dim)
  * skew      = salted repartition of hot cells
"""

from gdal_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
