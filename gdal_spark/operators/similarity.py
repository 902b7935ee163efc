"""Similarity search over an embedding column (array<float>).

Two strategies, mirroring the engine's PIP-join split (broadcast map-only vs
bucketed equi-join):

* ``cosine_topk``      — exact brute-force top-k: queries broadcast, each
  partition does ONE numpy matmul (points × queries), keeps its local top-k
  per query, a window takes the global top-k. Shuffle carries only
  partitions × Q × k rows — the TakeOrderedAndProject pattern. This is the
  correctness baseline and is already the right 100 TB plan when the query
  set is broadcast-small.

* ``ann_lsh_topk``     — random-hyperplane LSH: ``nb``-bit sign bucket per
  vector (closed-form deterministic hyperplanes, so the DuckDB oracle can
  recompute them), equi-join on bucket (optionally multi-probe by flipping
  bits), exact cosine refine, window top-k. The scale path when both sides
  are large: shuffle keys are ints, bucket skew is AQE-splittable.

* ``cosine_pairs``     — embedding near-duplicate pairs (cosine ≥ τ) via
  LSH buckets — the embedding-cosine dedup operator.

Cosine contract (oracle parity): dot/(|a||b|) computed in float64, rounded
to 6 dp; ranks break ties by neighbor id ascending.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from gdal_spark.functions import np_stable_round, sql_stable_round, stable_round

ROUND_DP = 6


# ---------------------------------------------------------------------------
# Deterministic LSH hyperplanes (closed form — shared with the SQL oracle)
# ---------------------------------------------------------------------------

def hyperplane(j: int, d: int) -> float:
    """Component d of hyperplane j ∈ [-1, 1), a pure function (no RNG so the
    oracle and any executor rebuild it bit-identically)."""
    return ((j * 2654435761 + d * 40503 + 12345) % 2000001) / 1000000.0 - 1.0


def sql_lsh_bucket(vec_expr: str, nb: int, dim: int) -> str:
    """DuckDB expr: the same sign-bit bucket id for a list<float> column."""
    bits = []
    for j in range(nb):
        dot = " + ".join(
            f"({vec_expr})[{d + 1}]::double * {hyperplane(j, d)!r}"
            for d in range(dim)
        )
        bits.append(f"(case when ({dot}) > 0 then {1 << j} else 0 end)")
    return "(" + " + ".join(bits) + ")"


def lsh_bucket_col(vec: str, nb: int, dim: int):
    """Spark column: sign-bit LSH bucket, ONE vectorized numpy pass per
    Arrow batch (replacing a per-plane fold-expression tree that was ~10×
    slower to plan and run). Dot products accumulate sequentially over the
    dim axis to match the SQL oracle's left-associative sum exactly — the
    bucket id must be bit-identical cross-engine, and matmul's pairwise
    summation could flip a sign on near-zero dots."""
    planes = np.array(
        [[hyperplane(j, d) for d in range(dim)] for j in range(nb)],
        dtype=np.float64,
    )
    weights = (1 << np.arange(nb)).astype(np.int64)

    @F.pandas_udf("int")
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.array(list(v), dtype=np.float64)  # (N, dim)
        # sequential accumulation along dim (oracle-parity sum order)
        acc = np.zeros((mat.shape[0], planes.shape[0]))
        for d in range(mat.shape[1]):
            acc += mat[:, d:d + 1] * planes.T[d:d + 1, :]
        bits = acc > 0
        return pd.Series((bits * weights).sum(axis=1).astype(np.int32))

    return bucket(F.col(vec))


# ---------------------------------------------------------------------------
# Exact brute-force cosine top-k (broadcast queries, partition-local matmul)
# ---------------------------------------------------------------------------

def cosine_topk(
    vectors: DataFrame, queries: DataFrame, k: int,
    id_col: str = "vec_id", query_id: str = "query_id", vec: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k by cosine similarity, (query_id, neighbor_id, rank, sim).

    sim is rounded to 6 dp; rank orders by (sim desc, neighbor_id asc).
    """
    spark = vectors.sparkSession
    q_rows = queries.select(query_id, vec).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)  # (Q, D)
    q_norm = np.linalg.norm(q_mat, axis=1)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    out_schema = StructType([
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("sim", DoubleType()),
    ])
    id_i = vectors.columns.index(id_col)
    vec_i = vectors.columns.index(vec)

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qm, qn = bc.value
        nq = ids.shape[0]
        acc_s = [np.full(0, -np.inf) for _ in range(nq)]
        acc_i = [np.empty(0, dtype=np.int64) for _ in range(nq)]
        for pdf in batches:
            if pdf.shape[0] == 0:
                continue
            p_id = pdf.iloc[:, id_i].to_numpy(dtype=np.int64)
            p_mat = np.array(list(pdf.iloc[:, vec_i]), dtype=np.float64)
            p_norm = np.linalg.norm(p_mat, axis=1)
            # (P, Q) similarity in ONE matmul — the vectorized hot path.
            sims = (p_mat @ qm.T) / np.maximum(p_norm[:, None] * qn[None, :], 1e-300)
            sims = np_stable_round(sims, ROUND_DP)
            for qi in range(nq):
                s = sims[:, qi]
                cand_s = np.concatenate([acc_s[qi], s])
                cand_i = np.concatenate([acc_i[qi], p_id])
                if not include_self:
                    keep = cand_i != ids[qi]
                    cand_s, cand_i = cand_s[keep], cand_i[keep]
                if cand_s.shape[0] > k:
                    # keep ALL candidates tied with the k-th value — the
                    # global rank is (sim desc, id asc) and 6-dp rounding
                    # makes ties realizable; argpartition alone could drop
                    # an equal-sim smaller-id neighbor at the boundary
                    kth = -np.partition(-cand_s, k - 1)[k - 1]
                    keep = cand_s >= kth
                    cand_s, cand_i = cand_s[keep], cand_i[keep]
                order = np.lexsort((cand_i, -cand_s))[:k]
                acc_s[qi], acc_i[qi] = cand_s[order], cand_i[order]
        yield pd.DataFrame({
            "query_id": np.repeat(ids, [a.shape[0] for a in acc_i]),
            "neighbor_id": np.concatenate(acc_i) if acc_i else np.empty(0, np.int64),
            "sim": np.concatenate(acc_s) if acc_s else np.empty(0),
        })

    partial = vectors.mapInPandas(local_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


# ---------------------------------------------------------------------------
# Cosine as pure column math (used by the bucketed paths; JVM fold = the
# sequential-sum order DuckDB uses, so values agree to float64 ulps and 6 dp
# rounding makes them identical)
# ---------------------------------------------------------------------------

def cosine_col(a: str, b: str):
    ax = F.col(a).cast("array<double>")
    bx = F.col(b).cast("array<double>")
    dot = F.aggregate(F.zip_with(ax, bx, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(ax, lambda x: x * x), F.lit(0.0),
                            lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(bx, lambda x: x * x), F.lit(0.0),
                            lambda acc, v: acc + v))
    return stable_round(dot / (na * nb), ROUND_DP)


def sql_cosine(a_expr: str, b_expr: str) -> str:
    dot = f"list_sum(list_transform(range(1, len({a_expr}) + 1), i -> ({a_expr})[i]::double * ({b_expr})[i]::double))"
    na = f"sqrt(list_sum(list_transform({a_expr}, x -> x::double * x::double)))"
    nb = f"sqrt(list_sum(list_transform({b_expr}, x -> x::double * x::double)))"
    return sql_stable_round(f"({dot}) / (({na}) * ({nb}))", ROUND_DP)


# ---------------------------------------------------------------------------
# LSH-bucketed ANN top-k and near-dup pairs
# ---------------------------------------------------------------------------

def ann_lsh_topk(
    vectors: DataFrame, queries: DataFrame, k: int, dim: int,
    nb: int = 8, id_col: str = "vec_id", query_id: str = "query_id",
    vec: str = "embedding", include_self: bool = False,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    ``multiprobe=True`` probes the exact bucket plus every 1-bit flip
    (nb+1 probes) — the standard recall boost with no extra shuffle keys on
    the (big) vector side; each vector still lives in exactly one bucket,
    so no candidate dedup is needed. Output schema matches cosine_topk.
    """
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec).alias("_v"),
        lsh_bucket_col(vec, nb, dim).alias("_bucket"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec).alias("_q"),
        lsh_bucket_col(vec, nb, dim).alias("_b0"),
    )
    if multiprobe:
        probes = F.array(
            F.col("_b0"),
            *[F.col("_b0").bitwiseXOR(F.lit(1 << j)) for j in range(nb)],
        )
        q = q.withColumn("_bucket", F.explode(probes)).drop("_b0")
    else:
        q = q.withColumnRenamed("_b0", "_bucket")
    joined = q.join(v, on="_bucket")
    if not include_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("sim", cosine_col("_q", "_v"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def cosine_pairs(
    vectors: DataFrame, dim: int, threshold: float = 0.9, nb: int = 8,
    id_col: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: same LSH bucket ∧ cosine ≥ threshold."""
    v = vectors.select(
        F.col(id_col), F.col(vec),
        lsh_bucket_col(vec, nb, dim).alias("_bucket"),
    )
    a = v.select(F.col(id_col).alias("id_a"), F.col(vec).alias("_va"), "_bucket")
    b = v.select(F.col(id_col).alias("id_b"), F.col(vec).alias("_vb"), "_bucket")
    return (
        a.join(b, on="_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine_col("_va", "_vb"))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
        .distinct()
    )


# ---------------------------------------------------------------------------
# IVF ANN — inverted-file index with deterministic coarse centroids
# (the Faiss-IVF shape: coarse quantizer → inverted lists → probe n lists).
# Closed-form centroids (hyperplane() family, offset seed) so the DuckDB
# oracle rebuilds them bit-identically.
# ---------------------------------------------------------------------------

IVF_SEED_OFF = 101


def ivf_centroid(j: int, dim: int) -> list[float]:
    return [hyperplane(j + IVF_SEED_OFF, d) for d in range(dim)]


def _centroid_norm(c: list[float]) -> float:
    acc = 0.0
    for x in c:  # sequential fold — same association as the SQL mirror
        acc += x * x
    return float(np.sqrt(acc))


def _cosine_to_const(vec: str, c: list[float]) -> "F.Column":
    vx = F.col(vec).cast("array<double>")
    carr = F.array(*[F.lit(float(x)) for x in c])
    dot = F.aggregate(
        F.zip_with(vx, carr, lambda x, y: x * y), F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nv = F.sqrt(
        F.aggregate(F.transform(vx, lambda x: x * x), F.lit(0.0),
                    lambda acc, v: acc + v)
    )
    return stable_round(dot / (nv * F.lit(_centroid_norm(c))), ROUND_DP)


def _ivf_sims(vec: str, n_centroids: int, dim: int) -> "F.Column":
    return F.array(*[
        _cosine_to_const(vec, ivf_centroid(j, dim)) for j in range(n_centroids)
    ])


def ivf_assign_col(vec: str, n_centroids: int, dim: int) -> "F.Column":
    """1-based id of the nearest centroid (ties → smallest id: first
    occurrence semantics of array_position/list_position in both engines)."""
    sims = _ivf_sims(vec, n_centroids, dim)
    return F.array_position(sims, F.array_max(sims)).cast("int")


def ivf_topk(
    vectors: DataFrame, queries: DataFrame, k: int, dim: int,
    n_centroids: int = 8, nprobe: int = 2,
    id_col: str = "vec_id", query_id: str = "query_id",
    vec: str = "embedding", include_self: bool = False,
) -> DataFrame:
    """IVF approximate top-k: every vector lives in exactly ONE inverted
    list (its nearest centroid); each query probes its ``nprobe`` nearest
    lists. Join keys are small ints; list skew is AQE-splittable; exact
    cosine refine + window top-k. Output schema matches cosine_topk."""
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec).alias("_v"),
        ivf_assign_col(vec, n_centroids, dim).alias("_list"),
    )
    sims = _ivf_sims(vec, n_centroids, dim)
    probes = F.transform(
        F.slice(
            F.array_sort(
                F.array(*[
                    F.struct(
                        (-F.element_at(sims, j + 1)).alias("ns"),
                        F.lit(j + 1).alias("j"),
                    )
                    for j in range(n_centroids)
                ])
            ),
            1, nprobe,
        ),
        lambda s: s["j"],
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec).alias("_q"),
        F.explode(probes).alias("_list"),
    )
    joined = q.join(v, on="_list")
    if not include_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("sim", cosine_col("_q", "_v"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def sql_ivf_sims(vec_expr: str, n_centroids: int, dim: int) -> str:
    """DuckDB list of the (rounded) centroid cosines, same fold order."""
    nv = f"sqrt(list_sum(list_transform({vec_expr}, x -> x::double * x::double)))"
    parts = []
    for j in range(n_centroids):
        c = ivf_centroid(j, dim)
        dot = f"list_sum(list_transform(range(1, {dim} + 1), i -> ({vec_expr})[i]::double * [{', '.join(repr(x) for x in c)}][i]))"
        parts.append(
            sql_stable_round(f"({dot}) / (({nv}) * {_centroid_norm(c)!r})",
                             ROUND_DP)
        )
    return "[" + ", ".join(parts) + "]"


def sql_ivf_assign(vec_expr: str, n_centroids: int, dim: int) -> str:
    l = sql_ivf_sims(vec_expr, n_centroids, dim)
    return f"list_position({l}, list_max({l}))::int"


def sql_ivf_probes(vec_expr: str, n_centroids: int, dim: int, nprobe: int) -> str:
    """nprobe nearest centroid ids, (sim desc, id asc): sort [[-sim, j]]
    lexicographically and take the first nprobe."""
    l = sql_ivf_sims(vec_expr, n_centroids, dim)
    pairs = (
        f"list_transform(range(1, {n_centroids} + 1), "
        f"j -> [-({l})[j], j::double])"
    )
    return (
        f"list_transform(list_slice(list_sort({pairs}), 1, {nprobe}), "
        f"p -> p[2]::int)"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the Jégou/Douze/Schmid 2011 codebook shape
# that rounds out the ANN menu (brute / LSH / IVF / PQ).  Deterministic
# closed-form sub-codebooks (hyperplane() family, own seed offset) so the
# DuckDB oracle rebuilds them bit-identically; per-subspace L2 distances
# are stable-rounded BEFORE the argmin so ordering (and first-min ties)
# agree across engines — the IVF gate's established trick.
# ---------------------------------------------------------------------------

PQ_SEED_OFF = 211


def pq_centroid(m: int, k: int, subdim: int) -> list[float]:
    return [hyperplane(PQ_SEED_OFF + m * 97 + k, d) for d in range(subdim)]


def pq_encode_cols(
    vec: str, n_sub: int, n_codes: int, dim: int
) -> tuple["F.Column", "F.Column"]:
    """(code, err_micro): code = Σ (argmin_k ||v_m − c_{m,k}||²) · K^m,
    err_micro = floor(Σ_m min-dist · 1e6 + 0.5) as bigint (exact to sum
    downstream — no float association in the bucket aggregation)."""
    subdim = dim // n_sub
    vx = F.col(vec).cast("array<double>")
    code = F.lit(0).cast("long")
    err = F.lit(0.0)
    for m in range(n_sub):
        sl = F.slice(vx, m * subdim + 1, subdim)
        dists = []
        for k in range(n_codes):
            c = pq_centroid(m, k, subdim)
            carr = F.array(*[F.lit(float(x)) for x in c])
            d2 = F.aggregate(
                F.zip_with(sl, carr, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            dists.append(stable_round(d2, ROUND_DP))
        darr = F.array(*dists)
        kbest = F.array_position(darr, F.array_min(darr))
        code = code + (kbest - 1) * (n_codes**m)
        err = err + F.array_min(darr)
    err_micro = F.floor(err * 1e6 + F.lit(0.5)).cast("long")
    return code, err_micro


def sql_pq_encode(
    vec_expr: str, n_sub: int, n_codes: int, dim: int
) -> tuple[str, str]:
    """DuckDB (code_expr, err_micro_expr) mirroring pq_encode_cols."""
    subdim = dim // n_sub
    code_terms, err_terms = [], []
    for m in range(n_sub):
        dists = []
        for k in range(n_codes):
            c = pq_centroid(m, k, subdim)
            clit = "[" + ", ".join(repr(x) for x in c) + "]"
            d2 = (
                f"list_sum(list_transform(range(1, {subdim} + 1), "
                f"i -> (({vec_expr})[{m * subdim} + i]::double - {clit}[i])"
                f" * (({vec_expr})[{m * subdim} + i]::double - {clit}[i])))"
            )
            dists.append(sql_stable_round(d2, ROUND_DP))
        darr = "[" + ", ".join(dists) + "]"
        code_terms.append(
            f"(list_position({darr}, list_min({darr})) - 1) * {n_codes**m}"
        )
        err_terms.append(f"list_min({darr})")
    code = "(" + " + ".join(code_terms) + ")::bigint"
    err_micro = (
        "floor((" + " + ".join(err_terms) + ") * 1e6 + 0.5)::bigint"
    )
    return code, err_micro


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication over embeddings (Abbas et al. 2023,
# "SemDeDup: Data-efficient learning at web-scale through semantic
# deduplication", public).  Cluster with the deterministic IVF coarse
# quantizer, then inside each cluster drop any member whose cosine to a
# BETTER-RANKED member exceeds tau; rank keeps LOW-centroid-similarity
# examples first (the paper's keep-hard-examples choice).  The pairwise
# stage is a cluster-key equi-join (never all-pairs across clusters) and
# the dominance rule is a deterministic anti-join — the paper's
# keep-one-per-duplicate-group intent in order-free, SQL-expressible form.
# ---------------------------------------------------------------------------

def semdedup_keep(
    vectors: DataFrame, dim: int, n_clusters: int = 8, tau: float = 0.35,
    id_col: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """Survivors of semantic dedup: (vec_id, cl, csim) for every vector
    NOT dominated by a better-ranked near-duplicate in its cluster.

    Scale shape: centroid assignment is map-only JVM column math; the
    self-join keys on (cluster id), so candidate pairs are per-cluster;
    rank is one window per cluster; the final step is a left-anti join.
    At 100 TB cluster count grows with the corpus (IVF lists stay
    bounded), keeping per-cluster pair counts controlled — the same
    inverted-list contract as ivf_topk."""
    sims = _ivf_sims(vec, n_clusters, dim)
    a = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec).alias("_v"),
        ivf_assign_col(vec, n_clusters, dim).alias("cl"),
        F.array_max(sims).alias("csim"),
    )
    w = Window.partitionBy("cl").orderBy(
        F.col("csim").asc(), F.col("vec_id").asc())
    ranked = a.withColumn("rk", F.row_number().over(w))
    lhs = ranked.select(
        "cl", F.col("vec_id").alias("a_id"), F.col("_v").alias("_va"),
        F.col("rk").alias("a_rk"),
    )
    rhs = ranked.select(
        "cl", F.col("vec_id").alias("b_id"), F.col("_v").alias("_vb"),
        F.col("rk").alias("b_rk"),
    )
    dominated = (
        lhs.join(rhs, on="cl")
        .filter(F.col("b_rk") < F.col("a_rk"))
        .withColumn("sim", cosine_col("_va", "_vb"))
        .filter(F.col("sim") >= F.lit(tau))
        .select(F.col("a_id").alias("vec_id"))
        .distinct()
    )
    return ranked.join(dominated, on="vec_id", how="left_anti").select(
        "vec_id", "cl", "csim")


def sql_semdedup_keep(
    table: str, dim: int, n_clusters: int = 8, tau: float = 0.35,
) -> str:
    """DuckDB twin of semdedup_keep (same centroids, same rounded cosines,
    same rank tie-breaks)."""
    sims = sql_ivf_sims("embedding", n_clusters, dim)
    cl = sql_ivf_assign("embedding", n_clusters, dim)
    cos = sql_cosine("x.embedding", "y.embedding")
    return f"""WITH a AS (
  SELECT vec_id, embedding, {cl} AS cl, list_max({sims}) AS csim
  FROM {table}
), r AS (
  SELECT vec_id, embedding, cl, csim,
         row_number() OVER (PARTITION BY cl ORDER BY csim ASC, vec_id ASC)
           AS rk
  FROM a
)
SELECT x.vec_id, x.cl, x.csim
FROM r x
WHERE NOT EXISTS (
  SELECT 1 FROM r y
  WHERE y.cl = x.cl AND y.rk < x.rk AND {cos} >= {tau!r}
)"""


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd's algorithm) — the TRAINER behind the IVF
# coarse quantizer (Faiss/IVF training per the public Johnson et al. 2017
# billion-scale similarity-search paper; the inference side is ivf_topk).
# One Lloyd iteration from the deterministic seed centroids:
#   assign → integer component sums per (cluster, dim) → re-assign.
# Exactness contract: embedding components are micro-quantized to 2^20
# integer units (sums order-free), updated centroids are exact-rational
# si/(n·2^20) evaluated with ONE double division, and squared-distance
# TERMS are quantized to 2^30 units before the per-(vector, centroid) sum
# — every float op is a single correctly-rounded IEEE op in the same
# order on both engines, so Spark and DuckDB agree bit-for-bit.
# ---------------------------------------------------------------------------

_KM_MICRO = 1 << 20        # component quantization (exact dyadic)
_KM_TERM = float(1 << 30)  # squared-distance term quantization


def kmeans_lloyd_summary(
    vectors: DataFrame, dim: int, k: int = 8,
    id_col: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """One distributed Lloyd iteration; per-cluster summary
    (cl, n, member_digest, sse_q).

    Scale shape: seed assignment is map-only column math; the centroid
    update is ONE partial-aggregated shuffle on (cluster, dim) keys
    (k·dim groups — bounded state like the paper's coarse quantizer);
    the re-assignment joins the long-form vectors against the BROADCAST
    k·dim centroid table; the argmin is an order-free integer min. No
    all-pairs stage anywhere, no driver-side vector math."""
    K = k
    base = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec),
            lambda x: F.floor(x.cast("double") * _KM_MICRO + 0.5)
            .cast("long"),
        ).alias("xi"),
        ivf_assign_col(vec, K, dim).alias("cl0"),
    )
    lf = base.select(
        "vec_id", "cl0", F.posexplode("xi").alias("d", "xi"))
    cent = lf.groupBy(F.col("cl0").alias("ck"), "d").agg(
        F.sum("xi").alias("sn"), F.count(F.lit(1)).alias("n"))
    xd = F.col("xi").cast("double") / F.lit(float(_KM_MICRO))
    cd = F.col("sn").cast("double") / (F.col("n") * _KM_MICRO).cast("double")
    diff = xd - cd
    term = F.floor(diff * diff * F.lit(_KM_TERM) + 0.5).cast("long")
    dist = (
        lf.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "ck")
        .agg(F.sum(term).alias("dq"))
    )
    enc = dist.groupBy("vec_id").agg(
        F.min(F.col("dq") * K + (F.col("ck") - 1)).alias("enc"))
    digest = lf.groupBy("vec_id").agg(F.sum("xi").alias("doc_digest"))
    return (
        enc.join(digest, "vec_id")
        .groupBy((F.col("enc") % K + 1).alias("cl"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_digest").alias("member_digest"),
            F.sum(F.expr(f"enc div {K}")).alias("sse_q"),
        )
    )


def sql_kmeans_lloyd_summary(table: str, dim: int, k: int = 8) -> str:
    """DuckDB twin: same seed assign, same integer quantization, same
    single-rounded float ops in the same order."""
    cl0 = sql_ivf_assign("embedding", k, dim)
    m = _KM_MICRO
    return f"""WITH x AS (
  SELECT vec_id, embedding, {cl0} AS cl0 FROM {table}
), dims AS (SELECT unnest(generate_series(0, {dim - 1})) AS d),
lf AS (
  SELECT vec_id, cl0, d,
         floor(embedding[d + 1]::double * {m} + 0.5)::bigint AS xi
  FROM x CROSS JOIN dims
), cent AS (
  SELECT cl0 AS ck, d, sum(xi)::bigint AS sn, count(*)::bigint AS n
  FROM lf GROUP BY cl0, d
), dist AS (
  SELECT lf.vec_id, cent.ck,
         sum(floor(((xi::double / {float(m)!r})
                    - (sn::double / (n * {m})::double))
                   * ((xi::double / {float(m)!r})
                      - (sn::double / (n * {m})::double))
                   * {_KM_TERM!r} + 0.5)::bigint)::bigint AS dq
  FROM lf JOIN cent ON cent.d = lf.d
  GROUP BY lf.vec_id, cent.ck
), enc AS (
  SELECT vec_id, min(dq * {k} + (ck - 1)) AS enc FROM dist GROUP BY vec_id
), dg AS (
  SELECT vec_id, sum(xi)::bigint AS doc_digest FROM lf GROUP BY vec_id
)
SELECT (enc % {k} + 1)::int AS cl, count(*)::bigint AS n,
       sum(doc_digest)::bigint AS member_digest,
       sum(enc // {k})::bigint AS sse_q
FROM enc JOIN dg USING (vec_id)
GROUP BY cl"""


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (the FAISS ScalarQuantizer QT_8bit scheme:
# per-dimension [min, max] trained on the corpus, 8-bit uniform codes,
# symmetric reconstructed-L2 distance).  One byte per dimension — the
# candidate scan reads 64 B codes instead of 256 B float32 vectors.
# ---------------------------------------------------------------------------

def sq8_topk(emb: DataFrame, query_pred: str, k: int = 5, dim: int = 64,
             vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Top-k by symmetric SQ8 distance → (q_id, rank, vec_id, dist, qsum).

    Train: per-dim min/max is ONE bounded aggregate (2·dim doubles) —
    the codebook broadcasts like the PQ/IVF LUTs.  Quantize + scan run
    in an Arrow numpy kernel with a per-partition top-k pre-reduction
    (the cosine_topk shape): candidates are encoded to byte codes and
    the distance Σ (Δq_d)²·s_d² (s_d = (mx_d − mn_d)/255) accumulates
    dimension-by-dimension in the SAME left-fold order as the DuckDB
    oracle's list_reduce, so every per-pair double is bit-identical —
    vectorized over the batch, never per-element interpreted.  Dims
    with mx == mn are untrainable by the scheme (FAISS rejects them
    too) and would yield NaN codes.
    """
    spark = emb.sparkSession
    vx = F.col(vec_col).cast("array<double>")
    row = emb.agg(
        F.array(*[F.min(F.element_at(vx, d + 1)) for d in range(dim)])
        .alias("mn"),
        F.array(*[F.max(F.element_at(vx, d + 1)) for d in range(dim)])
        .alias("mx"),
    ).collect()[0]
    mn = np.array([float(v) for v in row["mn"]])
    mx = np.array([float(v) for v in row["mx"]])
    den = mx - mn
    s2 = (den / 255.0) * (den / 255.0)

    def encode(mat: np.ndarray) -> np.ndarray:
        # identical IEEE op sequence to the oracle's per-element quantize
        return np.floor((mat - mn[None, :]) / den[None, :] * 255.0 + 0.5)

    q_rows = emb.filter(query_pred).select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_codes = encode(np.array([r[1] for r in q_rows], dtype=np.float64))
    bc = spark.sparkContext.broadcast((q_ids, q_codes, mn, den, s2))

    out_schema = StructType([
        StructField("q_id", LongType()),
        StructField("vec_id", LongType()),
        StructField("dist", DoubleType()),
        StructField("qsum", LongType()),
    ])
    id_i = emb.columns.index(id_col)
    vec_i = emb.columns.index(vec_col)

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qc, mn_b, den_b, s2_b = bc.value
        nq = ids.shape[0]
        acc = [(np.full(0, np.inf), np.empty(0, np.int64),
                np.empty(0, np.int64)) for _ in range(nq)]
        for pdf in batches:
            if pdf.shape[0] == 0:
                continue
            p_id = pdf.iloc[:, id_i].to_numpy(dtype=np.int64)
            p_mat = np.array(list(pdf.iloc[:, vec_i]), dtype=np.float64)
            codes = np.floor(
                (p_mat - mn_b[None, :]) / den_b[None, :] * 255.0 + 0.5)
            qsum = codes.astype(np.int64).sum(axis=1)
            for qi in range(nq):
                delta = codes - qc[qi][None, :]
                d2 = delta * delta
                dist = np.zeros(codes.shape[0])
                for d in range(codes.shape[1]):  # oracle's left-fold order
                    dist = dist + d2[:, d] * s2_b[d]
                dist = np_stable_round(dist, ROUND_DP)
                keep = p_id != ids[qi]
                cand = (np.concatenate([acc[qi][0], dist[keep]]),
                        np.concatenate([acc[qi][1], p_id[keep]]),
                        np.concatenate([acc[qi][2], qsum[keep]]))
                if cand[0].shape[0] > k:
                    # keep ties with the k-th value (rank breaks by id)
                    kth = np.partition(cand[0], k - 1)[k - 1]
                    m = cand[0] <= kth
                    cand = (cand[0][m], cand[1][m], cand[2][m])
                order = np.lexsort((cand[1], cand[0]))[:k]
                acc[qi] = (cand[0][order], cand[1][order], cand[2][order])
        yield pd.DataFrame({
            "q_id": np.repeat(ids, [a[1].shape[0] for a in acc]),
            "vec_id": np.concatenate([a[1] for a in acc])
            if acc else np.empty(0, np.int64),
            "dist": np.concatenate([a[0] for a in acc])
            if acc else np.empty(0),
            "qsum": np.concatenate([a[2] for a in acc])
            if acc else np.empty(0, np.int64),
        })

    partial = emb.mapInPandas(local_topk, schema=out_schema)
    w = Window.partitionBy("q_id").orderBy("dist", "vec_id")
    return partial.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k).select(
        "q_id", "rank", "vec_id", "dist", "qsum")
