"""Distributed space-filling-curve position rank.

Reference semantics: `gdal vector sort` geometry order
(apps/gdalalg_vector_sort.cpp:371 — Hilbert order; alg/hilbert.cpp:22 xy2d)
and FlatGeobuf's packed-R-tree layout key (packedrtree.cpp:73-132): every
feature gets its POSITION along the curve, i.e. a global dense rank over the
curve key.

Scale design: a global `row_number() OVER (ORDER BY key)` collapses the whole
table into ONE partition — the classic sort-rank scale-killer. Instead:

1. `repartitionByRange(key)` — a real range shuffle; every partition owns a
   disjoint key range and partitions are mutually ordered;
2. per-partition `row_number` windowed on `spark_partition_id()` — local
   work, no single-partition exchange;
3. per-partition row counts (a tiny aggregate, #partitions rows) become
   cumulative offsets via a broadcast join;
4. global position = partition offset + local rank.

Equal keys land in one range partition, so (key, tiebreak) total order makes
the rank deterministic and identical to the single-window form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def curve_rank(
    df: DataFrame, *order_cols: str, pos_name: str = "pos",
    num_partitions: int | None = None, materialize: bool = True,
) -> DataFrame:
    """Add a 1-based global dense position over ``order_cols`` without a
    single-partition window. ``order_cols`` must be a total order (append a
    unique tiebreak column).

    ``materialize=True`` (default) eagerly computes the result and
    unpersists the intermediate cache — the ranked input is consumed twice
    (counts + ranks), so SOME materialization is inherent; this way the
    only retained blocks are the result the caller actually uses.
    ``materialize=False`` returns the lazy plan and leaves the intermediate
    persisted (caller manages lifetime)."""
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    # pin partition assignment: counts and ranks must see the same pid map
    ranged = ranged.withColumn("_pid", F.spark_partition_id()).persist()
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # offsets: #partitions rows — driver-size metadata, broadcast back
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )
    wloc = Window.partitionBy("_pid").orderBy(*cols)
    out = (
        ranged.withColumn("_lr", F.row_number().over(wloc))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(pos_name, (F.col("_off") + F.col("_lr")).cast("long"))
        .drop("_pid", "_lr", "_off")
    )
    if materialize:
        out = out.localCheckpoint(eager=True)
        ranged.unpersist()
    return out


def prefix_sums(
    df: DataFrame, order_col: str, sum_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed inclusive prefix sums of ``sum_cols`` over the total
    order ``order_col`` (which must be unique per row — pre-aggregate
    first), without a single-partition window: range-partition by the
    order column, per-partition totals (one tiny #partitions-row frame)
    prefix-summed driver-side-broadcast back, local cumulative window
    inside each partition.  The classic two-level distributed scan —
    the same shape as curve_rank above."""
    ranged = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        if num_partitions
        else df.repartitionByRange(F.col(order_col))
    )
    ranged = ranged.withColumn("_pid", F.spark_partition_id()).persist()
    totals = ranged.groupBy("_pid").agg(
        *[F.sum(c).cast("long").alias(f"_t_{c}") for c in sum_cols])
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        *[F.coalesce(F.sum(f"_t_{c}").over(woff), F.lit(0))
          .cast("long").alias(f"_off_{c}") for c in sum_cols])
    wloc = (Window.partitionBy("_pid").orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, 0))
    out = ranged.join(F.broadcast(offsets), "_pid")
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}",
            (F.col(f"_off_{c}") + F.sum(c).over(wloc)).cast("long"))
    out = out.drop("_pid", *[f"_off_{c}" for c in sum_cols])
    out = out.localCheckpoint(eager=True)
    ranged.unpersist()
    return out
