"""Web-graph operators (graft axis webtext): integer-quantized PageRank.

PageRank (Brin & Page 1998) with the damping update
``r' = (1-d) + d * sum_in(r / outdeg)`` — re-expressed in INTEGER
micro-units so the per-node sum is order-free and the DuckDB oracle can
chain the same K iterations as CTEs bit-exactly:

* ranks live as bigint micro-units (1.0 = 1,000,000),
* each edge contributes ``rank_micro // outdeg`` (integer division),
* the damped update is ``150000 + (85 * contrib_sum) // 100``.

Distributed shape: the edge table pre-joins its source's outdeg once;
each iteration is ONE shuffle (groupBy dst of integer contribs) plus a
broadcast-size left join back to the node table — K driver-paced rounds
with lineage truncation, the engine's standard iterative contract.
Nodes without in-links settle at the (1-d) floor, exactly like the
reference formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_ONE = 1_000_000  # 1.0 in micro-units
PR_DAMP_NUM = 85    # d = 0.85 as a ratio of integers
PR_DAMP_DEN = 100
PR_FLOOR = PR_ONE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN  # (1-d)*1e6


def pagerank_micro(nodes: DataFrame, edges: DataFrame, iters: int = 5,
                   id_col: str = "id") -> DataFrame:
    """Integer PageRank over (nodes[id], edges[src, dst]).  Returns
    (id, rank_micro) after ``iters`` damped iterations from a uniform
    micro-unit start."""
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    r = nodes.select(
        F.col(id_col).alias("id"),
        F.lit(PR_ONE).cast("long").alias("rank_micro"),
    )
    for i in range(iters):
        contrib = (
            ed.join(r, ed["src"] == r["id"])
            .select(
                "dst",
                F.floor(F.col("rank_micro") / F.col("outdeg"))
                .cast("long").alias("_c"),
            )
            .groupBy("dst")
            .agg(F.sum("_c").alias("_cs"))
        )
        r = (
            nodes.select(F.col(id_col).alias("id"))
            .join(contrib, F.col("id") == contrib["dst"], "left")
            .select(
                "id",
                (F.lit(PR_FLOOR)
                 + F.floor(
                     F.lit(PR_DAMP_NUM) * F.coalesce(F.col("_cs"), F.lit(0))
                     / F.lit(PR_DAMP_DEN)
                 ).cast("long")).alias("rank_micro"),
            )
        )
        if (i + 1) % 2 == 0 and i + 1 < iters:
            r = r.localCheckpoint(eager=True)
    return r


def hits_micro(nodes: DataFrame, edges: DataFrame, iters: int = 3,
               id_col: str = "id") -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) in integer micro-units,
    UNNORMALIZED for a fixed small iteration count (values stay far
    inside int64 for bounded degree × iters; the gate pins 3 rounds):
    a' = sum of h over in-edges, h' = sum of a' over out-edges — each
    round is two integer-sum shuffles, order-free on both engines.
    Returns (id, hub_micro, auth_micro)."""
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    ids = nodes.select(F.col(id_col).alias("id"))
    h = ids.withColumn("h", F.lit(PR_ONE).cast("long"))
    a = None
    for _ in range(iters):
        a = (
            e.join(h, e["src"] == h["id"])
            .groupBy("dst").agg(F.sum("h").alias("_a"))
        )
        a = ids.join(a, ids["id"] == a["dst"], "left").select(
            "id", F.coalesce(F.col("_a"), F.lit(0)).cast("long").alias("a"))
        h = (
            e.join(a, e["dst"] == a["id"])
            .groupBy("src").agg(F.sum("a").alias("_h"))
        )
        h = ids.join(h, ids["id"] == h["src"], "left").select(
            "id", F.coalesce(F.col("_h"), F.lit(0)).cast("long").alias("h"))
    return (
        h.join(a.withColumnRenamed("id", "_aid"),
               h["id"] == F.col("_aid"))
        .select("id", F.col("h").alias("hub_micro"),
                F.col("a").alias("auth_micro"))
    )


INF_DIST = 1 << 40  # unreachable sentinel, far outside any K-round path sum


def bellman_ford_rounds(nodes: DataFrame, wedges: DataFrame,
                        seeds: DataFrame, rounds: int,
                        id_col: str = "id") -> DataFrame:
    """Multi-source shortest path, K synchronous Bellman-Ford relaxation
    rounds (gnmanalyse dijkstra semantics, gnm/gnmgraph.cpp — the
    distributed formulation of the reference's priority-queue walk; equal
    to exact Dijkstra distance whenever ``rounds`` >= the shortest-path
    hop diameter).  INTEGER edge weights make every min/plus exact and
    order-free, so a SQL oracle can chain the identical rounds as CTEs.

    Distributed shape: dist table joined to the weighted edge list on src
    (ONE shuffle per round: groupBy dst of integer candidates) + a left
    join back to the node table; lineage truncated every 2 rounds — the
    engine's standard driver-paced iterative contract.  Unreachable nodes
    stay at the ``INF_DIST`` sentinel.

    Inputs: nodes[id_col], wedges[src, dst, w (long)], seeds[id_col].
    Returns (id, dist) with dist = INF_DIST where no <=K-hop path exists.
    """
    e = wedges.select("src", "dst", "w").localCheckpoint(eager=True)
    ids = nodes.select(F.col(id_col).alias("id"))
    dist = ids.join(
        seeds.select(F.col(id_col).alias("_s")).distinct(),
        ids["id"] == F.col("_s"), "left",
    ).select(
        "id",
        F.when(F.col("_s").isNotNull(), F.lit(0))
        .otherwise(F.lit(INF_DIST)).cast("long").alias("dist"),
    )
    for i in range(rounds):
        cand = (
            e.join(dist, e["src"] == dist["id"])
            .filter(F.col("dist") < F.lit(INF_DIST))
            .select("dst", (F.col("dist") + F.col("w")).alias("_c"))
            .groupBy("dst")
            .agg(F.min("_c").alias("_cm"))
        )
        dist = dist.join(cand, dist["id"] == cand["dst"], "left").select(
            "id",
            F.least(
                F.col("dist"), F.coalesce(F.col("_cm"), F.lit(INF_DIST))
            ).cast("long").alias("dist"),
        )
        if (i + 1) % 2 == 0 and i + 1 < rounds:
            dist = dist.localCheckpoint(eager=True)
    return dist


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts via DEGREE-ORDERED edge orientation
    (Latapy 2008; the Spark analogue of GraphX TriangleCount): each
    undirected edge is directed from its lower-(degree, id) endpoint to
    the higher one, so every triangle is enumerated exactly once as a
    wedge at its lowest-order vertex and per-vertex wedge fanout is
    bounded by O(sqrt(m)) (graph arboricity) — the property that keeps
    the wedge self-join from exploding on power-law web graphs at
    10^12-doc scale.

    ``edges``: directed (src, dst) pairs; de-duplicated and undirected
    here.  Three shuffles total (degree agg, wedge self-join, closure
    join) — no iteration, no driver collect.  Returns (id, n_tri) for
    every vertex in ≥1 triangle.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    # orient a->b when (deg_a, a) < (deg_b, b); ties impossible on id
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    ori = (
        und.join(da, "a").join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b"))
            .alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a"))
            .alias("dst"),
        )
    )
    e1 = ori.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = ori.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    closing = und.select(
        F.col("a").alias("v"), F.col("b").alias("w")
    )
    tris = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    verts = (
        tris.select(F.col("u").alias("id"))
        .unionAll(tris.select(F.col("v").alias("id")))
        .unionAll(tris.select(F.col("w").alias("id")))
    )
    return verts.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tri")
    )


def label_propagation_rounds(edges: DataFrame, nodes: DataFrame,
                             rounds: int = 3, n_mult: int = 0) -> DataFrame:
    """Synchronous label propagation (Raghavan 2007, the GraphX/GraphFrames
    LPA analogue) made DETERMINISTIC: every node starts with its own id;
    each round it adopts the label most frequent among its neighbours,
    ties broken by the SMALLEST label — encoded as one integer key
    ``(n - count) * n + label`` so the per-node argmax is an order-free
    ``min``.  Two shuffles per round (label join onto edges, per-node
    count+min), K driver-paced rounds — the engine's standard iterative
    contract.  ``n_mult``: the encode multiplier (≥ max node id + 1 and
    ≥ max count + 1); 0 = derive from the node count."""
    und = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    n = n_mult or (nodes.count() + 1)
    labels = nodes.select(F.col("id"), F.col("id").alias("lbl"))
    for _ in range(rounds):
        votes = (
            und.join(labels, und.src == labels.id)
            .groupBy("dst", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        new_labels = (
            votes.groupBy("dst")
            .agg(F.min((F.lit(n) - F.col("cnt")) * n + F.col("lbl"))
                 .alias("key"))
            .select(F.col("dst").alias("id"),
                    (F.col("key") % n).alias("new_lbl"))
        )
        # isolated nodes (no in-votes) keep their label
        labels = (
            labels.join(new_labels, "id", "left")
            .select("id", F.coalesce("new_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return labels
