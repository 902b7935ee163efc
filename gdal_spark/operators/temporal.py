"""As-of and range joins — the temporal companions of the spatial joins.

The task brief names these as operators Spark lacks natively; both are
expressed as compositions of built-in DataFrame ops (no UDF):

* ``asof_join`` — for every left row, the LATEST right row with
  right_ts <= left_ts per key (the kdb/pandas merge_asof "backward"
  semantics). Spark-first: tag the sides, UNION, one window per key ordered
  by (ts, side) carrying last_value(right payload, ignoreNulls) — a single
  shuffle on the key, no per-row probing, no range explosion. Ties
  (right_ts == left_ts) match (backward-inclusive), mirroring
  pandas.merge_asof(direction="backward").

* ``range_join`` — join values to [lo, hi) intervals via fixed-width
  BUCKETING: intervals explode to the buckets they span, values carry
  their bucket, equi-join on (key?, bucket), exact filter — the 1-D
  analog of the polygon cell-cover join; skewed buckets split by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame, right: DataFrame, key: str, left_ts: str,
    right_ts: str, payload: list[str], right_id: str | None = None,
) -> DataFrame:
    """Backward as-of join. Output = left columns + right ``payload``
    columns (null when no prior right row exists). ``right_id`` makes the
    pick among equal-ts right rows deterministic (largest id wins)."""
    # payload rides in a STRUCT: the struct wrapper is non-null for every
    # right row even when individual payload FIELDS are null, so a latest
    # right row with a null value is still the one matched (a bare-column
    # last(ignorenulls) would skip it and fall back to an older row,
    # diverging from merge_asof semantics)
    l_tag = left.select(
        "*", F.lit(1).alias("_side"), F.col(left_ts).alias("_ts"),
        F.lit(2 ** 62).alias("_rid"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {dict(right.dtypes)[c]}" for c in payload
            ) + ">"
        ).alias("_p"),
    )
    r_tag = right.select(
        F.col(key),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ts"),
        (F.col(right_id) if right_id else F.lit(0)).cast("long").alias("_rid"),
        F.struct(*[F.col(c) for c in payload]).alias("_p"),
    )
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))
    # right rows (side 0) sort BEFORE left rows at equal ts → inclusive
    # ties; among equal-ts right rows, ascending _rid so last_value picks
    # the largest id
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rid").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.withColumn(
        "_p",
        F.last(
            F.when(F.col("_side") == 0, F.col("_p")), ignorenulls=True
        ).over(w),
    )
    out = out.filter(F.col("_side") == 1).drop("_side", "_ts", "_rid")
    for c in payload:
        out = out.withColumn(c, F.col("_p")[c])
    return out.drop("_p")


def range_join(
    values: DataFrame, intervals: DataFrame, value_col: str,
    lo_col: str = "lo", hi_col: str = "hi", bucket_width: float = 1.0,
) -> DataFrame:
    """Join each value row to every interval with lo <= value < hi.

    Plan: intervals explode to ceil((hi-lo)/w) bucket rows; values compute
    one bucket; equi-join on the int bucket; exact range filter. Shuffle
    keys are ints; output = values columns + intervals columns."""
    b_lo = F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long")
    # hi exactly on a bucket boundary yields one spurious (empty) bucket —
    # the exact post-join filter discards it; an epsilon here would instead
    # silently DROP matches when hi sits within eps above a boundary
    b_hi = F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long")
    iv = intervals.withColumn(
        "_bucket", F.explode(F.sequence(b_lo, F.greatest(b_hi, b_lo)))
    )
    vals = values.withColumn(
        "_bucket", F.floor(F.col(value_col) / F.lit(bucket_width)).cast("long")
    )
    return (
        vals.join(iv, on="_bucket", how="inner")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_bucket")
    )
