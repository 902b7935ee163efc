"""Similarity search: exact brute-force vs numpy oracle + DuckDB parity,
ANN recall sanity, embedding near-dup pairs."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import similarity as S

EMB = "/root/testdata/sf0.001/embeddings.parquet"
DIM = 64


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.read.parquet(EMB)


def _numpy_topk(k, q_ids, include_self=False):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{EMB}') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norm = np.linalg.norm(mat, axis=1)
    out = {}
    for qid in q_ids:
        qi = int(np.nonzero(ids == qid)[0][0])
        sims = np.round(mat @ mat[qi] / (norm * norm[qi]), 6)
        cand = [
            (-s, i)
            for s, i in zip(sims, ids)
            if include_self or i != qid
        ]
        cand.sort()
        out[qid] = [(i, -s) for s, i in cand[:k]]
    return out


def test_cosine_topk_exact(spark, vectors):
    q_ids = [0, 7, 13]
    queries = vectors.filter(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = S.cosine_topk(vectors, queries, k=5).collect()
    want = _numpy_topk(5, q_ids)
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["sim"])
        )
    for qid in q_ids:
        w = want[qid]
        g = by_q[qid]
        assert [x[0] for x in g] == [x[0] for x in w]
        for (gi, gs), (wi, ws) in zip(g, w):
            assert gs == pytest.approx(ws, abs=2e-6)


def test_cosine_col_vs_duckdb(spark, vectors):
    """The column-math cosine must match DuckDB's sequential-sum to 6dp."""
    a = vectors.limit(20).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    )
    pairs = (
        a.crossJoin(
            vectors.limit(5).select(
                F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")
            )
        )
        .withColumn("sim", S.cosine_col("ea", "eb"))
        .select("id_a", "id_b", "sim")
    )
    got = {(r["id_a"], r["id_b"]): r["sim"] for r in pairs.collect()}
    con = duckdb.connect()
    sql = (
        f"SELECT a.vec_id, b.vec_id, {S.sql_cosine('a.embedding', 'b.embedding')} "
        f"FROM read_parquet('{EMB}') a, read_parquet('{EMB}') b "
        f"WHERE a.vec_id < 20 AND b.vec_id < 5"
    )
    for ia, ib, sim in con.execute(sql).fetchall():
        assert got[(ia, ib)] == pytest.approx(sim, abs=1e-9), (ia, ib)


def test_lsh_bucket_vs_duckdb(spark, vectors):
    got = {
        r["vec_id"]: r["b"]
        for r in vectors.select(
            "vec_id", S.lsh_bucket_col("embedding", 6, DIM).alias("b")
        ).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT vec_id, {S.sql_lsh_bucket('embedding', 6, DIM)} "
            f"FROM read_parquet('{EMB}')"
        ).fetchall()
    )
    assert got == want


def test_ann_recall(spark, vectors):
    """Single-probe LSH with few bits should still find most true top-5."""
    q_ids = [1, 2, 3, 4, 5, 6, 7, 8]
    queries = vectors.filter(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = _numpy_topk(5, q_ids)
    ann = S.ann_lsh_topk(vectors, queries, k=5, dim=DIM, nb=4).collect()
    by_q = {}
    for r in ann:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for qid in q_ids:
        truth = {i for i, _ in exact[qid]}
        hits += len(truth & by_q.get(qid, set()))
        total += len(truth)
    # recall sanity only: near-orthogonal random vectors are the worst case
    # for sign LSH; exact value parity is covered by the oracle-gate test
    assert hits / total >= 0.15


def test_cosine_pairs_threshold(spark, vectors):
    out = S.cosine_pairs(vectors, dim=DIM, threshold=0.95, nb=4)
    for r in out.collect():
        assert r["sim"] >= 0.95
        assert r["id_a"] < r["id_b"]


def test_ivf_assignment_covers_all_lists(spark):
    """Every vector lands in exactly one inverted list; lists are reasonably
    balanced with the fixture embeddings (no empty-quantizer degeneracy)."""
    from gdal_spark.operators import similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned = emb.select(
        S.ivf_assign_col("embedding", 8, 64).alias("l")
    )
    counts = {r["l"]: r["c"] for r in assigned.groupBy("l").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    assert sum(counts.values()) == emb.count()
    assert len(counts) >= 3  # several lists used


def test_ivf_recall_vs_exact(spark):
    """nprobe=2/8 IVF recall@5 vs brute force is meaningfully high on the
    fixture (sanity on the probe ordering — a broken argmax would crater
    recall)."""
    from gdal_spark.operators import similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 40 == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.cosine_topk(emb, queries, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(emb, queries, k=5, dim=64, n_centroids=8,
                            nprobe=2).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, recall


def test_semdedup_drops_dominated_near_duplicates(spark):
    """A planted near-duplicate pair in the same cluster loses its
    better-ranked twin; orthogonal vectors all survive."""
    import numpy as np
    from gdal_spark.operators import similarity as SIM

    dim = 64
    base = np.zeros(dim); base[0] = 1.0
    near = np.zeros(dim); near[0] = 1.0; near[1] = 0.05   # cos ≈ 0.999
    far = np.zeros(dim); far[3] = 1.0                      # cos 0 to both
    rows = [(0, base.tolist()), (1, near.tolist()), (2, far.tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = SIM.semdedup_keep(df, dim=dim, n_clusters=4, tau=0.9)
    ids = sorted(r["vec_id"] for r in kept.collect())
    assert len(ids) == 2 and 2 in ids
    assert (0 in ids) != (1 in ids)  # exactly one of the twins survives


class TestKMeansLloyd:
    def _vectors(self, spark, n=64, dim=8):
        import numpy as np

        rows = []
        for i in range(n):
            v = [((i * 37 + d * 11) % 29) / 29.0 - 0.5 for d in range(dim)]
            rows.append((i, v))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_partition_of_corpus(self, spark):
        from gdal_spark.operators.similarity import kmeans_lloyd_summary

        out = kmeans_lloyd_summary(
            self._vectors(spark), dim=8, k=4).toPandas()
        assert out["n"].sum() == 64            # every vector exactly once
        assert set(out["cl"]) <= {1, 2, 3, 4}
        assert (out["sse_q"] >= 0).all()

    def test_one_iteration_never_increases_sse(self, spark):
        """Lloyd invariant: re-assigning to UPDATED centroids cannot give a
        larger SSE than the updated centroids score on the seed
        assignment (each vector moves only if strictly closer)."""
        import numpy as np

        from gdal_spark.operators.similarity import (
            ivf_assign_col, ivf_centroid, kmeans_lloyd_summary)

        df = self._vectors(spark)
        out = kmeans_lloyd_summary(df, dim=8, k=4).toPandas()
        pdf = df.withColumn(
            "cl0", ivf_assign_col("embedding", 4, 8)).toPandas()
        mat = np.array(list(pdf["embedding"]))
        xi = np.floor(mat * (1 << 20) + 0.5)
        sse_seed = 0.0
        cents = {}
        for c in sorted(pdf["cl0"].unique()):
            members = xi[pdf["cl0"] == c]
            cents[c] = members.sum(axis=0) / (len(members) * (1 << 20))
        for c, cent in cents.items():
            members = xi[pdf["cl0"] == c] / (1 << 20)
            d = members - cent
            sse_seed += np.floor(d * d * (1 << 30) + 0.5).sum()
        assert out["sse_q"].sum() <= sse_seed + 1e-6

    def test_member_digest_is_exact_int_sum(self, spark):
        import numpy as np

        from gdal_spark.operators.similarity import kmeans_lloyd_summary

        df = self._vectors(spark)
        out = kmeans_lloyd_summary(df, dim=8, k=4).toPandas()
        mat = np.array([r for r in df.toPandas()["embedding"]])
        total = int(np.floor(mat * (1 << 20) + 0.5).sum())
        assert int(out["member_digest"].sum()) == total
