"""Multidimensional array ops — the ``gdalmdimtranslate`` surface
(gcore/gdalmultidim.cpp GDALMDArray; apps/gdalmdimtranslate_lib.cpp view
syntax: subset / slice / transpose / aggregated views).

Distributed representation: the LONG FORM (dim0, dim1, ..., val) — one row
per populated array element, exactly how a hyperslab shards across
executors (dimension columns are the partition keys; any slice/subset is a
pushed-down filter, a transpose is free relabeling, an axis reduce is one
partial aggregate on the kept dims).  Against 100 TB cubes this is the
shape that lets Catalyst prune: a ``t=2`` slice reads one parquet
partition, never the cube.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGGS = {
    "mean": F.avg, "min": F.min, "max": F.max, "sum": F.sum,
    "count": F.count,
}


def md_slice(arr: DataFrame, fixed: dict[str, int]) -> DataFrame:
    """Slice: fix one or more dimensions to indices (gdalmdimtranslate
    ``view("[2,:,:]")``).  The fixed dims leave the schema — a slice DROPS
    the dimension, per the reference's GetView semantics."""
    out = arr
    for dim, idx in fixed.items():
        out = out.filter(F.col(dim) == idx).drop(dim)
    return out


def md_transpose(arr: DataFrame, order: list[str],
                 val: str = "val") -> DataFrame:
    """Transpose: reorder dimensions (GDALMDArray::Transpose).  In long
    form this is pure projection — zero data movement."""
    return arr.select(*order, val)


def md_reduce(arr: DataFrame, over: list[str], how: str = "mean",
              val: str = "val") -> DataFrame:
    """Axis reduction: aggregate ``val`` over the given dims, keeping the
    rest (gdalmdimtranslate aggregated views / GetResampled).  One partial
    aggregate keyed on the surviving dims."""
    keep = [c for c in arr.columns if c != val and c not in over]
    return arr.groupBy(*keep).agg(_AGGS[how](val).alias(val))
