"""ST_LineMerge: reassemble maximal linestrings from a segment soup.

Reference semantics: GEOS ``LineMerger`` (what OGRGeometry exposes through
the SQLite dialect and ``ogr2ogr`` users reach via ST_LineMerge): two line
ends are joined only at nodes where EXACTLY two ends meet (degree-2 nodes);
junctions (degree >= 3) and free ends break chains.  Closed rings (all
nodes degree 2) merge into a single closed line.

Distributed shape (the 100 TB story):

* endpoint NODE keying is an equi-join on the exact coordinate pair — one
  shuffle, map-side partial agg for the degree count;
* chain formation is connected components over the segment graph
  (segments adjacent iff they share a degree-2 node) — the engine's
  min-label + pointer-jumping CC, O(log chain length) rounds;
* the per-chain WALK (ordering segments into a vertex sequence) is
  inherently serial per chain but independent across chains →
  applyInPandas keyed by chain id, exactly the per-image Floyd-Steinberg
  contract.  Chains are bounded by real-world feature length, not by
  data volume, so the pandas batch stays small at any scale.

Determinism: canonical orientation — an open chain starts at the
lexicographically smaller of its two free ends; a closed ring starts at its
lexicographically smallest vertex and proceeds toward the smaller
neighbour.  Lengths are carried as integer micrometers-style units
(floor(len*1e6 + 0.5) per SEGMENT, summed as bigint) so cross-engine sums
are order-independent and exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.operators.dedup import connected_components


def _node_key(x, y):
    # exact coordinate pair as the node key (closed-form fixtures produce
    # bit-identical doubles on both ends of a shared vertex)
    return F.concat_ws(":", x.cast("string"), y.cast("string"))


def line_merge(segments: DataFrame, seg_id: str = "seg_id") -> DataFrame:
    """segments: (seg_id, x1, y1, x2, y2) soup → one row per merged line:
    (chain_id, n_segments, start_x, start_y, end_x, end_y, len_micro,
    is_ring).  chain_id = min seg_id of the chain."""
    ends = segments.select(
        F.col(seg_id).alias("_sid"),
        F.explode(
            F.array(
                F.struct(F.col("x1").alias("x"), F.col("y1").alias("y")),
                F.struct(F.col("x2").alias("x"), F.col("y2").alias("y")),
            )
        ).alias("_e"),
    ).select("_sid", _node_key(F.col("_e.x"), F.col("_e.y")).alias("_nk"))
    deg2 = (
        ends.groupBy("_nk")
        .agg(
            F.count(F.lit(1)).alias("_deg"),
            F.min("_sid").alias("_sa"),
            F.max("_sid").alias("_sb"),
        )
        # exactly two ends meet AND they belong to two DIFFERENT segments
        # (a 2-vertex closed loop degenerates to the same segment twice)
        .filter((F.col("_deg") == 2) & (F.col("_sa") != F.col("_sb")))
    )
    pairs = deg2.select(
        F.col("_sa").alias("id_a"), F.col("_sb").alias("id_b")
    )
    cc = connected_components(pairs).select(
        F.col("doc_id").alias("_cid"), F.col("cluster_id").alias("_chain")
    )
    labeled = (
        segments.join(cc, segments[seg_id] == F.col("_cid"), "left")
        .withColumn(
            "_chain", F.coalesce(F.col("_chain"), F.col(seg_id))
        )
        .drop("_cid")
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        chain = int(pdf["_chain"].iloc[0])
        pts = {}
        adj: dict = {}
        for _, r in pdf.iterrows():
            a = (float(r["x1"]), float(r["y1"]))
            b = (float(r["x2"]), float(r["y2"]))
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        ends_ = sorted(v for v, ns in adj.items() if len(ns) == 1)
        if ends_:
            start = ends_[0]
            prev = None
        else:  # closed ring: smallest vertex, toward its smaller neighbour
            start = min(adj)
            prev = max(adj[start])
        seq = [start]
        cur, came = start, prev
        for _ in range(len(pdf)):
            nxt = [p for p in adj[cur] if p != came]
            if not nxt:
                break
            # degree-2 guaranteed by construction; pick deterministic
            step = min(nxt)
            seq.append(step)
            came, cur = cur, step
        arr = np.asarray(seq, dtype=np.float64)
        d = arr[1:] - arr[:-1]
        micro = np.floor(
            np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2) * 1e6 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "chain_id": [chain],
                "n_segments": [len(pdf)],
                "start_x": [seq[0][0]],
                "start_y": [seq[0][1]],
                "end_x": [seq[-1][0]],
                "end_y": [seq[-1][1]],
                "len_micro": [int(micro.sum())],
                "is_ring": [not ends_],
            }
        )

    return labeled.groupBy("_chain").applyInPandas(
        walk,
        "chain_id long, n_segments long, start_x double, start_y double, "
        "end_x double, end_y double, len_micro long, is_ring boolean",
    )
